"""Blocked-ELL Pallas SpMM correctness (interpreter mode on CPU; the
compiled-TPU parity run lives in tests/test_tpu.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bikg_graph_explainability_public_tpu.graph import from_arrays
from bikg_graph_explainability_public_tpu.ops.ell import build_neighbor_table
from bikg_graph_explainability_public_tpu.ops.spmm_pallas import (
    batched_gather_sum,
)
from fixtures import make_graph


def _reference(snd, rcv, w_eb, feats_bc, n, b):
    """out[v] = sum_e w[e,:] * feats[snd_e] with per-sample broadcast."""
    f = feats_bc.shape[1] // b
    msg = feats_bc[snd].reshape(-1, b, f) * w_eb[:, :, None]
    return jax.ops.segment_sum(
        msg.reshape(-1, b * f), rcv, num_segments=n
    )


class TestBlockedEllSpmm:
    def _case(self, n, e, b, f, seed):
        feat, ei, _ = make_graph(n=n, f=4, e=e, seed=seed)
        g = from_arrays(feat, ei, edge_budget=e)
        table = build_neighbor_table(g)
        rng = np.random.default_rng(seed)
        w_eb = jnp.asarray(rng.random((g.e_pad, b)).astype(np.float32))
        feats = jnp.asarray(
            rng.standard_normal((g.n_pad, b * f), dtype=np.float32)
        )
        return g, table, w_eb, feats

    @pytest.mark.parametrize("b,f", [(1, 128), (4, 128), (8, 256)])
    def test_matches_segment_sum(self, b, f):
        g, table, w_eb, feats = self._case(24, 60, b, f, 7)
        got = batched_gather_sum(table, w_eb, feats, b=b, interpret=True)
        hv_snd = np.asarray(g.senders)[: g.num_edges]
        hv_rcv = np.asarray(g.receivers)[: g.num_edges]
        keep = hv_snd != hv_rcv  # table drops data self-loops
        want = _reference(
            jnp.asarray(hv_snd[keep]), jnp.asarray(hv_rcv[keep]),
            w_eb[: g.num_edges][jnp.asarray(keep)], feats, g.n_pad, b,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_masked_edges_contribute_zero(self):
        g, table, w_eb, feats = self._case(16, 40, 2, 128, 8)
        w_eb = w_eb.at[::2].set(0.0)
        got = batched_gather_sum(table, w_eb, feats, b=2, interpret=True)
        hv_snd = np.asarray(g.senders)[: g.num_edges]
        hv_rcv = np.asarray(g.receivers)[: g.num_edges]
        keep = hv_snd != hv_rcv
        want = _reference(
            jnp.asarray(hv_snd[keep]), jnp.asarray(hv_rcv[keep]),
            w_eb[: g.num_edges][jnp.asarray(keep)], feats, g.n_pad, 2,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_isolated_nodes_get_zero_rows(self):
        """Rows with no in-edges (all padding slots) must be exact zeros even
        though their gather buffer rows are never written."""
        n, b, f = 12, 2, 128
        feat = np.ones((n, 4), np.float32)
        ei = np.array([[0, 1], [1, 2]])  # only nodes 1, 2 receive
        g = from_arrays(feat, ei)
        table = build_neighbor_table(g)
        rng = np.random.default_rng(0)
        w_eb = jnp.asarray(rng.random((g.e_pad, b)).astype(np.float32))
        feats = jnp.asarray(rng.standard_normal((g.n_pad, b * f), dtype=np.float32))
        got = np.asarray(batched_gather_sum(table, w_eb, feats, b=b, interpret=True))
        assert np.isfinite(got).all()
        np.testing.assert_array_equal(got[3:], 0.0)

    def test_rejects_oversized_k(self):
        from bikg_graph_explainability_public_tpu.ops.ell import NeighborTable

        table = NeighborTable(
            nbr=jnp.zeros((8, 100_000), jnp.int32),
            valid=jnp.zeros((8, 100_000), jnp.float32),
            eid=jnp.zeros((8, 100_000), jnp.int32),
        )
        w = jnp.zeros((8, 1), jnp.float32)
        feats = jnp.zeros((8, 128), jnp.float32)
        with pytest.raises(ValueError, match="too large"):
            batched_gather_sum(table, w, feats, b=1, interpret=True)


class TestSeparable:
    """Rank-1 separable aggregation (static slot weights)."""

    def _setup(self, n=96, e=640, b=8, f=16, seed=5):
        import bikg_graph_explainability_public_tpu as px
        from bikg_graph_explainability_public_tpu.ops.ell import (
            build_neighbor_table,
        )

        rng = np.random.default_rng(seed)
        feat = rng.standard_normal((n, 4), dtype=np.float32)
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        g = px.from_arrays(feat, ei, pad_mode="exact")
        table = build_neighbor_table(g)
        feats = jnp.asarray(
            rng.standard_normal((g.n_pad, b * f), dtype=np.float32)
        )
        a_bn = jnp.asarray(rng.random((b, g.n_pad), dtype=np.float32))
        return g, table, feats, a_bn, b, f

    def test_matches_dense_oracle(self):
        from bikg_graph_explainability_public_tpu.graph import host_view
        from bikg_graph_explainability_public_tpu.ops.spmm import (
            gather_sum_batched_separable,
        )

        g, table, feats, a_bn, b, f = self._setup()
        hv = host_view(g)
        snd = jnp.asarray(hv.senders[: g.num_edges])
        rcv = jnp.asarray(hv.receivers[: g.num_edges])

        got = np.asarray(
            gather_sum_batched_separable(
                a_bn, feats, snd, rcv, g.n_pad, b, table=table,
                backend="pallas", indices_are_sorted=False,
            )
        )
        a = np.asarray(a_bn)
        x = np.asarray(feats).reshape(g.n_pad, b, f)
        want = np.zeros_like(x)
        for s, r in zip(np.asarray(snd), np.asarray(rcv)):
            if s == r:
                continue
            want[r] += (a[:, s] * a[:, r])[:, None] * x[s]
        np.testing.assert_allclose(
            got.reshape(g.n_pad, b, f), want, rtol=2e-5, atol=2e-5
        )

    def test_xla_and_pallas_paths_agree(self):
        from bikg_graph_explainability_public_tpu.graph import host_view
        from bikg_graph_explainability_public_tpu.ops.spmm import (
            gather_sum_batched_separable,
        )

        g, table, feats, a_bn, b, f = self._setup(seed=6)
        hv = host_view(g)
        snd = jnp.asarray(hv.senders[: g.num_edges])
        rcv = jnp.asarray(hv.receivers[: g.num_edges])
        kw = dict(indices_are_sorted=False)
        got_p = np.asarray(gather_sum_batched_separable(
            a_bn, feats, snd, rcv, g.n_pad, b, table=table,
            backend="pallas", **kw))
        got_x = np.asarray(gather_sum_batched_separable(
            a_bn, feats, snd, rcv, g.n_pad, b, backend="xla", **kw))
        np.testing.assert_allclose(got_p, got_x, rtol=2e-5, atol=2e-5)

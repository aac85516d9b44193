"""Compiled-on-TPU execution tests (``pytest -m tpu``).

The default suite pins itself to a virtual CPU mesh, so Pallas kernels only
ever run interpreted there.  These tests run whenever the session keeps the
real TPU backend (VERDICT r1 item 3): kernel parity for the compiled Pallas
paths and one end-to-end explanation.  TPU f32 matmuls use bf16 passes by
default, hence the loose tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.graph import from_arrays
from bikg_graph_explainability_public_tpu.ops.ell import build_neighbor_table
from fixtures import make_graph

pytestmark = pytest.mark.tpu


class TestCompiledPallasSpmm:
    def test_blocked_ell_matches_xla_compiled(self):
        from bikg_graph_explainability_public_tpu.ops.spmm_pallas import (
            batched_gather_sum,
        )

        b, f = 8, 128
        feat, ei, _ = make_graph(n=200, f=4, e=800, seed=70)
        g = from_arrays(feat, ei, edge_budget=800)
        table = build_neighbor_table(g)
        rng = np.random.default_rng(1)
        w_eb = jnp.asarray(rng.random((g.e_pad, b)).astype(np.float32))
        feats = jnp.asarray(
            rng.standard_normal((g.n_pad, b * f), dtype=np.float32)
        )
        got = np.asarray(
            batched_gather_sum(table, w_eb, feats, b=b, interpret=False)
        )
        snd = np.asarray(g.senders)[: g.num_edges]
        rcv = np.asarray(g.receivers)[: g.num_edges]
        keep = snd != rcv
        msg = feats[jnp.asarray(snd[keep])].reshape(-1, b, f) * (
            w_eb[: g.num_edges][jnp.asarray(keep)][:, :, None]
        )
        want = np.asarray(
            jax.ops.segment_sum(
                msg.reshape(-1, b * f), jnp.asarray(rcv[keep]),
                num_segments=g.n_pad,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestCompiledPallasDenseGcn:
    @pytest.mark.parametrize(
        "n,f,channels",
        [
            # lane-unaligned N (120) and channel strides (32): the r2 Mosaic
            # regression shape — per-sample scratch slices at t*32 offsets
            (120, 16, (32, 32)),
            # the lungCancer checkpoint's widths: F=84 features, C=16 convs
            (84, 84, (16,)),
            # non-128-multiple channel width above the sublane multiple
            (200, 12, (120,)),
        ],
    )
    def test_masked_layer_matches_xla_compiled(self, n, f, channels):
        from bikg_graph_explainability_public_tpu.models.fast_gcn import (
            FastBatchedGCN,
        )

        feat, ei, _ = make_graph(n=n, f=f, e=4 * n, seed=71)
        g = from_arrays(feat, ei)
        mdef = px.GCNNodeModel(
            f, conv_channels=channels, fc_channels=(channels[-1], 16)
        )
        params = mdef.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(2)
        masks = jnp.asarray(rng.random((16, g.n_pad)) > 0.3)
        eng_x = FastBatchedGCN(mdef, params, g, mode="dense", backend="xla")
        eng_p = FastBatchedGCN(mdef, params, g, mode="dense", backend="pallas")
        out_x = np.asarray(eng_x.batch_node_outputs(masks))
        out_p = np.asarray(eng_p.batch_node_outputs(masks))
        np.testing.assert_allclose(out_p, out_x, rtol=5e-2, atol=5e-2)
        # bf16 operand tolerance; also require tight agreement on average
        assert np.abs(out_p - out_x).mean() < 1e-2


class TestCompiledExplainE2E:
    def test_explain_node_on_tpu(self):
        feat, ei, _ = make_graph(n=64, f=12, e=200, seed=72)
        names = [str(i) for i in range(64)]
        mdef = px.GCNNodeModel(12, conv_channels=(16,), fc_channels=(16, 8))
        model = px.Model(mdef, mdef.init(jax.random.PRNGKey(3)))
        cfg = {"seed": 5, "interpret_samples": 10, "epochs": 10, "lr": 0.01,
               "l1_lambda": 1e-4}
        cv, _ = px.Explainer(feat, ei, model, cfg, names).run("9", times=1)
        assert len(cv) > 0
        vals = cv["config_value_mean"].to_numpy()
        assert np.isfinite(vals).all()
        # repeatability on-chip: same seed, same result
        cv2, _ = px.Explainer(feat, ei, model, cfg, names).run("9", times=1)
        np.testing.assert_allclose(
            vals, cv2["config_value_mean"].to_numpy(), rtol=1e-5, atol=1e-6
        )

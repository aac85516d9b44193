"""Production blocked-ELL Pallas SpMM vs the XLA segment-sum path at the
big-graph batched workload shape (layer>=2 aggregation in fast_gcn)."""

import sys
import time

sys.path.insert(0, "benchmarks")
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from exp_spmm_kernels import marginal_time

import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.graph import from_arrays
from bikg_graph_explainability_public_tpu.ops.ell import build_neighbor_table
from bikg_graph_explainability_public_tpu.ops.spmm_pallas import (
    batched_gather_sum,
)
from bikg_graph_explainability_public_tpu.runtime import native
from bikg_graph_explainability_public_tpu.graph import host_view


def main(n=100_000, e=1_000_000, b=8, f=128):
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((n, 8), dtype=np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int64)
    g = from_arrays(feat, ei, pad_mode="exact")
    table = build_neighbor_table(g)
    print(f"table K={table.k}", flush=True)

    hv = host_view(g)
    _rp, col_s, eid = native.build_csr(
        g.n_pad, hv.senders[: g.num_edges], hv.receivers[: g.num_edges]
    )
    snd_s = jnp.asarray(col_s)
    rcv_s = jnp.asarray(hv.receivers[: g.num_edges][eid])

    feats = jnp.asarray(rng.standard_normal((g.n_pad, b * f), dtype=np.float32))
    w_eb = jnp.asarray(rng.random((g.e_pad, b), dtype=np.float32))
    w_sorted = w_eb[jnp.asarray(eid)]  # receiver-sorted per-edge weights

    bytes_min = (e + n) * b * f * 4 / 1e9
    print(f"min bytes ~{bytes_min:.2f} GB -> SoL ~{bytes_min/819*1e3:.2f} ms",
          flush=True)

    # XLA path (what fast_gcn.agg does today): gather + sorted segment-sum.
    # Self-loop edges get weight 0 to match the neighbour table's convention
    # (gcn_norm replaces them with unit self-loops anyway).
    loop_w = jnp.asarray((np.asarray(col_s) != np.asarray(
        hv.receivers[: g.num_edges][eid])).astype(np.float32))

    def xla_op(wi, feats):
        msg = feats[snd_s].reshape(-1, b, f) * (wi * loop_w[:, None])[:, :, None]
        return jax.ops.segment_sum(
            msg.reshape(-1, b * f), rcv_s, num_segments=g.n_pad,
            indices_are_sorted=True,
        )

    t_x = marginal_time(xla_op, w_sorted, feats)
    print(f"XLA gather+segsum:  {t_x*1e3:8.2f} ms ({bytes_min/t_x:4.0f} GB/s eff)",
          flush=True)

    # Pallas blocked-ELL
    def pl_op(wi, feats):
        return batched_gather_sum(table, wi, feats, b=b, interpret=False)

    t_p = marginal_time(pl_op, w_eb, feats)
    print(f"Pallas blocked-ELL: {t_p*1e3:8.2f} ms ({bytes_min/t_p:4.0f} GB/s eff)"
          f"  speedup x{t_x/t_p:.2f}", flush=True)

    err = np.abs(
        np.asarray(pl_op(w_eb, feats)) - np.asarray(xla_op(w_sorted, feats))
    ).max()
    print(f"max err: {err:.2e}", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)

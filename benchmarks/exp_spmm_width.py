"""Row-width sweep of the batched SpMM backends.

The blocked-ELL Pallas kernel issues one HBM->VMEM DMA per edge; at ~50 ns
scalar issue cost per DMA the achieved bandwidth is issue-bound below
~16-32 KB rows and bandwidth-bound above.  The production knob is the batch
chunk size B (row payload W = B*F*4 bytes): this sweep measures GB/s vs W
for the Pallas kernel and the XLA gather+segment-sum at the 100k/1M
workload, to pick the chunk size that maximises edges/s/chip.

Usage: python benchmarks/exp_spmm_width.py [n] [e] [f]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from bikg_graph_explainability_public_tpu.graph import from_arrays, host_view
from bikg_graph_explainability_public_tpu.ops.ell import build_neighbor_table
from bikg_graph_explainability_public_tpu.ops.spmm_pallas import (
    batched_gather_sum,
    plan_for_table,
)
from bikg_graph_explainability_public_tpu.runtime import native


def marginal_time(op, *args, n1=2, n2=8):
    """Slope-timed seconds per op (axon tunnel overhead excluded)."""
    def scan_n(n):
        @jax.jit
        def run(w, feats):
            def body(carry, _):
                dep = (carry[0, 0] > 1e30).astype(jnp.float32)
                out = op(w + dep, feats)
                return out[:1] * 1e-30 + carry, ()

            c0 = jnp.zeros((1, feats.shape[-1]), jnp.float32)
            out, _ = jax.lax.scan(body, c0, None, length=n)
            return out

        return run

    t = {}
    for n in (n1, n2):
        f = scan_n(n)
        np.asarray(f(*args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return max((t[n2] - t[n1]) / (n2 - n1), 1e-9)


def main(n=100_000, e=1_000_000, f=128):
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
    loop_w = jnp.asarray(
        (np.asarray(col_s) != np.asarray(hv.receivers[: g.num_edges][eid]))
        .astype(np.float32)
    )

    for b in (4, 8, 16, 32, 64):
        w = b * f
        feats = jnp.asarray(
            rng.standard_normal((g.n_pad, w), dtype=np.float32)
        )
        w_eb = jnp.asarray(rng.random((g.e_pad, b), dtype=np.float32))
        w_sorted = w_eb[jnp.asarray(eid)]
        bytes_min = ((e + n) * w * 4 + e * b * 4) / 1e9
        plan = plan_for_table(table, w)
        tr = plan.tr if plan else 0

        def pl_op(wi, feats):
            return batched_gather_sum(table, wi[: g.e_pad], feats, b=b)

        def xla_op(wi, feats):
            msg = feats[snd_s].reshape(-1, b, f) * (
                wi[: g.num_edges] * loop_w[:, None]
            )[:, :, None]
            return jax.ops.segment_sum(
                msg.reshape(-1, b * f), rcv_s, num_segments=g.n_pad,
                indices_are_sorted=True,
            )

        def timed(op, w):
            try:
                return marginal_time(op, w, feats)
            except Exception as exc:  # OOM at large W, etc.
                print(f"B={b:3d} {op.__name__} failed: "
                      f"{type(exc).__name__}", flush=True)
                return float("inf")

        t_p = timed(pl_op, w_eb) if plan else float("inf")
        t_x = timed(xla_op, w_sorted)
        print(
            f"B={b:3d} W={w*4/1024:6.1f}KB tr={tr:3d} | "
            f"pallas {t_p*1e3:8.2f} ms ({bytes_min/t_p:5.0f} GB/s) | "
            f"xla {t_x*1e3:8.2f} ms ({bytes_min/t_x:5.0f} GB/s)",
            flush=True,
        )


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)

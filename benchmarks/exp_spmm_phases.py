"""Phase split of the blocked-ELL kernel: DMA issue vs VPU reduce.

Times three variants at the production shape: (a) the full kernel, (b) a
zero-count plan (reduce only — no row DMAs), (c) ... the difference
attributes the cost between the DMA loop and the weighted K-reduction,
deciding whether block-level double-buffering (overlap reduce with next
block's DMAs) is worth building.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from bikg_graph_explainability_public_tpu.graph import from_arrays
from bikg_graph_explainability_public_tpu.ops.ell import build_neighbor_table
from bikg_graph_explainability_public_tpu.ops.spmm_pallas import (
    CompactPlan,
    plan_for_table,
    spmm_ell_pallas,
)


def timeit(op, *args, n1=2, n2=8):
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
            t0 = time.perf_counter(); np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return max((t[n2] - t[n1]) / (n2 - n1), 1e-9)


def main(n=100_000, e=1_000_000, b=8, f=128):
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((n, 8), dtype=np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int64)
    g = from_arrays(feat, ei, pad_mode="exact")
    table = build_neighbor_table(g)
    w = b * f
    plan = plan_for_table(table, w)
    feats = jnp.asarray(rng.standard_normal((g.n_pad, w), dtype=np.float32))
    w_eb = jnp.asarray(rng.random((g.e_pad, b), dtype=np.float32))
    w_slot = w_eb[table.eid] * table.valid[:, :, None]

    def full(ws, feats):
        return spmm_ell_pallas(plan.src, plan.dst, plan.cnt,
                               ws.reshape(-1, table.k, b), feats,
                               k=table.k, tr=plan.tr, b=b)

    zero = CompactPlan(plan.src, plan.dst, np.zeros_like(plan.cnt), plan.tr)

    def reduce_only(ws, feats):
        return spmm_ell_pallas(zero.src, zero.dst, zero.cnt,
                               ws.reshape(-1, table.k, b), feats,
                               k=table.k, tr=plan.tr, b=b)

    wflat = w_slot.reshape(g.n_pad, table.k * b)
    t_full = timeit(lambda ws, feats: full(ws, feats), wflat, feats)
    t_red = timeit(lambda ws, feats: reduce_only(ws, feats), wflat, feats)
    print(f"full:        {t_full*1e3:8.2f} ms")
    print(f"reduce-only: {t_red*1e3:8.2f} ms")
    print(f"=> DMA part: {(t_full-t_red)*1e3:8.2f} ms "
          f"({e/(max(t_full-t_red,1e-9))/1e6:.0f} M DMAs/s, "
          f"{(t_full-t_red)/e*1e9:.0f} ns/DMA)")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)

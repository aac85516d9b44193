"""Attribute the v2 SpMM kernel's wall-clock: issue vs wait vs transfer vs
reduce, via the kernel's ``ablate`` variants (garbage outputs, honest timing).

Variants on the 100k/1M random graph:

* ``full``       — production kernel (static/MXU mode)
* ``noreduce``   — issue + wait, out = 0: issue + transfer-bound wait cost
* ``nomatmul``   — issue + wait + TR-row copy: everything but the K-reduce
* ``sumreduce``  — issue + wait + VPU sum over K (no weights, no MXU)
* ``onlyreduce`` — no DMAs at all, MXU reduce on stale scratch
* ``none``       — empty body: grid/pipeline overhead

Also sweeps (dtype, B): f32x16 (8 KB rows), f32x32 (16 KB), bf16x32 (8 KB),
bf16x64 (16 KB) — bf16 halves bytes per issued copy at equal payload width.

Run on the chip: ``python benchmarks/exp_spmm_attrib.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def bench(n=100_000, deg=10, b=16, f=128, dtype=np.float32, ablate="",
          seed=0, reps=10):
    import bikg_graph_explainability_public_tpu as px
    from bikg_graph_explainability_public_tpu.ops import spmm_pallas as sp
    from bikg_graph_explainability_public_tpu.ops.ell import build_neighbor_table

    rng = np.random.default_rng(seed)
    e = n * deg
    ei = np.stack([rng.integers(0, n, e), np.repeat(np.arange(n), deg)])
    g = px.from_arrays(rng.standard_normal((n, 8), dtype=np.float32),
                       ei.astype(np.int64), pad_mode="exact")
    table = build_neighbor_table(g)
    # feats generated ON DEVICE: shipping ~1 GB of host randoms over the
    # remote-TPU tunnel wedges the stream for minutes
    feats = jax.random.normal(
        jax.random.PRNGKey(0), (g.n_pad, b * f)
    ).astype(np.dtype(dtype).name)
    itemsize = np.dtype(dtype).itemsize
    plan = sp.plan_for_table(table, b * f, itemsize)
    w2 = jnp.asarray(sp._static_weights(np.asarray(table.valid), plan.tr))
    p_src, p_dst, p_cnt = map(jnp.asarray, (plan.src, plan.dst, plan.cnt))

    def run():
        return sp.spmm_ell_pallas(
            p_src, p_dst, p_cnt, w2, feats, k=table.k, tr=plan.tr, b=b,
            n=int(table.nbr.shape[0]), interpret=False, ablate=ablate)

    jax.block_until_ready(run())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    bytes_moved = (e + n) * b * f * itemsize
    name = f"{np.dtype(dtype).name}xB{b}"
    print(f"{name:12s} {ablate or 'full':10s} rows={b*f*itemsize//1024}KB "
          f"TR={plan.tr} K={table.k}: {dt*1e3:7.2f} ms  "
          f"{bytes_moved/dt/1e9:6.1f} GB/s")
    return dt


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    for ab in ("full", "noreduce", "nomatmul", "sumreduce", "onlyreduce",
               "none"):
        bench(b=16, dtype=np.float32, ablate="" if ab == "full" else ab)
    print("--- shape sweep (full kernel) ---")
    for dtype, b in ((np.float32, 32), (np.dtype("bfloat16"), 32),
                     (np.dtype("bfloat16"), 64)):
        bench(b=b, dtype=dtype)

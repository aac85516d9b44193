"""Sweep TR (rows per block) at fixed workload: grid overhead is ~5.6 us per
step regardless of body, so fewer/bigger blocks should shrink it — at the
cost of a bigger gather scratch and more block-diagonal MXU FLOPs (which run
at higher M-efficiency).  Run on chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def bench(tr, ablate="", n=100_000, deg=10, b=16, f=128, seed=0, reps=10):
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
    feats = jax.random.normal(jax.random.PRNGKey(0), (g.n_pad, b * f), jnp.float32)
    plan = sp.build_compact_plan(
        np.asarray(table.nbr), np.asarray(table.valid), tr)
    w2 = jnp.asarray(sp._static_weights(np.asarray(table.valid), tr))
    p_src, p_dst, p_cnt = map(jnp.asarray, (plan.src, plan.dst, plan.cnt))

    def run():
        return sp.spmm_ell_pallas(
            p_src, p_dst, p_cnt, w2, feats, k=table.k, tr=tr, b=b,
            n=int(table.nbr.shape[0]), interpret=False, ablate=ablate)

    jax.block_until_ready(run())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    bytes_moved = (e + n) * b * f * 4
    print(f"TR={tr:4d} {ablate or 'full':10s}: {dt*1e3:7.2f} ms  "
          f"{bytes_moved/dt/1e9:6.1f} GB/s")
    return dt


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    for tr in (64, 128, 256):
        for ab in ("none", "noreduce", ""):
            bench(tr, ab)

"""Measure the run-coalesced DMA plan's payoff vs graph locality.

Three graphs, same N/E/degree profile, different neighbour-id structure:

* ``random``  — ids uniform over [0, N): runs of consecutive source ids are
  vanishingly rare, the plan degenerates to single-row DMAs (the issue-rate
  floor).
* ``window``  — each node's neighbours drawn from a 64-wide contiguous
  window: moderate run formation after the table's per-row source sort.
* ``interval`` — each node's neighbours ARE a contiguous id interval
  (mesh/road/B-matrix-like adjacency): maximal runs, the plan collapses to
  ~E/deg multi-row DMAs.

Also sweeps the issue chunk G on the random graph (scalar-loop overhead).

Run on the chip: ``python benchmarks/exp_coalesce.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def make_edges(n, deg, kind, rng):
    e = n * deg
    rcv = np.repeat(np.arange(n), deg)
    if kind == "random":
        snd = rng.integers(0, n, e)
    elif kind == "window":
        base = rng.integers(0, n, n)
        snd = (base[rcv] + rng.integers(0, 64, e)) % n
    elif kind == "interval":
        base = rng.integers(0, n, n)
        snd = (base[rcv] + np.tile(np.arange(deg), n)) % n
    return np.stack([snd, rcv]).astype(np.int64)


def bench_one(kind, n=100_000, deg=10, b=16, f=128, g_override=None, seed=0):
    import bikg_graph_explainability_public_tpu as px
    from bikg_graph_explainability_public_tpu.ops import spmm_pallas as sp
    from bikg_graph_explainability_public_tpu.ops.ell import build_neighbor_table

    rng = np.random.default_rng(seed)
    ei = make_edges(n, deg, kind, rng)
    g = px.from_arrays(rng.standard_normal((n, 8), dtype=np.float32), ei,
                       pad_mode="exact")
    table = build_neighbor_table(g)
    feats = jnp.asarray(
        rng.standard_normal((g.n_pad, b * f), dtype=np.float32)
    )
    plan = sp.plan_for_table(table, b * f, 4)
    ncnt = sp._NCNT
    cnt2 = plan.cnt.reshape(-1, ncnt)
    runs = cnt2[:, :-1].sum()
    rows = cnt2[:, -1].sum()
    if g_override is not None:
        old = sp._G
        sp._G = g_override
    # fresh jit per config (the module-level jit cache can't see _G)
    fn = jax.jit(
        sp.spmm_ell_pallas.__wrapped__,
        static_argnames=("k", "tr", "b", "n", "interpret"),
    )
    w2 = jnp.asarray(sp._static_weights(np.asarray(table.valid), plan.tr))
    # device-resident plan: numpy args would re-cross the tunnel every call
    p_src, p_dst, p_cnt = map(jnp.asarray, (plan.src, plan.dst, plan.cnt))

    def run():
        return fn(p_src, p_dst, p_cnt, w2, feats,
                  k=table.k, tr=plan.tr, b=b, n=int(table.nbr.shape[0]),
                  interpret=False)

    out = run()
    jax.block_until_ready(out)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    if g_override is not None:
        sp._G = old
    e = n * deg
    bytes_moved = (e + n) * b * f * 4
    gbps = bytes_moved / dt / 1e9
    print(
        f"{kind:9s} g={g_override or sp._G:3d}: {dt*1e3:7.2f} ms  "
        f"{gbps:6.1f} GB/s  dmas/row={runs/rows:.3f}  ns/dma={dt/runs*1e9:.1f}"
    )
    return gbps


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    for kind in ("random", "window", "interval"):
        bench_one(kind)
    for g in (16, 64, 128):
        bench_one("random", g_override=g)

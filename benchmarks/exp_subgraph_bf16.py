"""Subgraph dense-path precision experiment: f32 vs bf16 storage dtype.

The primary bench workload (2048 nodes / 16384 edges, hidden 128 x 2, B=1000)
runs the dense-adjacency MXU path.  v5e f32 matmuls decompose into multiple
bf16 passes; storing adjacency/activations in bf16 (accumulating f32) should
approach single-pass MXU rate.  Measures throughput + query-output drift.

Run:  nohup python benchmarks/exp_subgraph_bf16.py > /tmp/exp_bf16.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, E, F_IN, HIDDEN, B = 2048, 16384, 84, 128, 1000


def timeit(fn, *args, reps=5):
    import jax

    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    import bikg_graph_explainability_public_tpu as px
    from bikg_graph_explainability_public_tpu.models.fast_gcn import FastBatchedGCN

    rng = np.random.default_rng(2)
    feat = rng.normal(size=(N, F_IN)).astype(np.float32)
    ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(np.int64)
    g = px.from_arrays(feat, ei, pad_mode="exact")
    mdef = px.GCNNodeModel(
        F_IN, conv_channels=(HIDDEN, HIDDEN), fc_channels=(HIDDEN, 64)
    )
    params = mdef.init(jax.random.PRNGKey(0))
    masks = jnp.asarray(rng.random((B, g.n_pad)) > 0.3)

    outs = {}
    for name, dtype, chunk in [
        ("f32 chunk=250", jnp.float32, 250),
        ("bf16 chunk=250", jnp.bfloat16, 250),
        ("bf16 chunk=500", jnp.bfloat16, 500),
        ("bf16 chunk=1000", jnp.bfloat16, 1000),
    ]:
        engine = FastBatchedGCN(mdef, params, g, dtype=dtype)
        run = jax.jit(lambda m, e=engine, c=chunk: e.query_outputs(m, 17, chunk_size=c))
        dt = timeit(run, masks)
        outs[name] = np.asarray(run(masks))
        # dense-path matmul FLOPs per forward: deg einsum + 2 conv layers
        flops = 2 * N * N * (1 + HIDDEN + HIDDEN)
        tflops = flops * B / dt / 1e12
        print(f"{name}: {dt*1e3:.1f} ms, {B/dt:.0f} fwd/s, {tflops:.1f} TFLOP/s",
              flush=True)

    ref = outs["f32 chunk=250"]
    for k, v in outs.items():
        print(f"max|{k} - f32| = {np.abs(v - ref).max():.3e}", flush=True)


if __name__ == "__main__":
    main()

"""nbf-layout big-graph variant: sorted-COO both layers, batch-contiguous
[N,B,F] activations, bf16 gather rows, NO eager device ops.

All graph prep is host-side numpy; the jitted program takes numpy inputs
directly (one H2D transfer each at call time).  Phases printed separately so
the slow step is identifiable (axon remote compiles are minutes each).

Usage: python benchmarks/exp_nbf_coo.py [bf16|f32] [chunk]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, E, F_IN, HIDDEN = 100_000, 1_000_000, 84, 128
B_TOTAL = 64


def main():
    dtype_name = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    gdtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32

    # ---- host-side prep (numpy only; no device traffic) ----
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(N, F_IN)).astype(np.float32)
    src = rng.integers(0, N, E).astype(np.int64)
    dst = rng.integers(0, N, E).astype(np.int64)

    from bikg_graph_explainability_public_tpu.runtime import native

    _rp, col, eid = native.build_csr(N, src, dst)
    snd_s_np = col.astype(np.int32)
    rcv_s_np = dst[eid].astype(np.int32)
    not_self_np = (snd_s_np != rcv_s_np).astype(np.float32)

    k0 = np.random.default_rng(1)
    w0 = (k0.normal(size=(HIDDEN, F_IN)) * 0.05).astype(np.float32)
    w1 = (k0.normal(size=(HIDDEN, HIDDEN)) * 0.05).astype(np.float32)
    wh = (k0.normal(size=(HIDDEN, 1)) * 0.05).astype(np.float32)
    xw0_np = feat @ w0.T  # [N, C] host matmul
    masks_np = (rng.random((B_TOTAL, N)) > 0.3).astype(np.float32)
    query = 17
    print(f"host prep {time.perf_counter()-t0:.1f}s", flush=True)

    def chunk_fwd(mt, xw0, w1_t, wh, snd_s, rcv_s, not_self):
        b = mt.shape[1]
        w_eb = mt[snd_s] * mt[rcv_s] * not_self[:, None]  # [E,b]
        deg = 1.0 + jax.ops.segment_sum(
            w_eb, rcv_s, num_segments=N, indices_are_sorted=True)
        dis = jax.lax.rsqrt(deg)  # [N,b]
        selfw = dis * dis
        norm = (w_eb * dis[snd_s] * dis[rcv_s]).astype(gdtype)  # [E,b]

        def agg(hw_shared, hw_batched):
            # hw_shared [N,C] or hw_batched [N,b,C]
            if hw_batched is None:
                c = hw_shared.shape[1]
                msg = hw_shared.astype(gdtype)[snd_s][:, None, :] * norm[:, :, None]
            else:
                c = hw_batched.shape[-1]
                msg = hw_batched.astype(gdtype)[snd_s] * norm[:, :, None]
            return jax.ops.segment_sum(
                msg.reshape(E, b * c).astype(jnp.float32), rcv_s,
                num_segments=N, indices_are_sorted=True,
            ).reshape(N, b, c)

        h = agg(xw0, None) + selfw[:, :, None] * xw0[:, None, :]
        h = jax.nn.relu(h)
        hw = jnp.einsum("nbc,gc->nbg", h, w1_t, preferred_element_type=jnp.float32)
        h2 = agg(None, hw) + selfw[:, :, None] * hw
        h2 = jax.nn.relu(h2)
        return (h2[query] @ wh)[:, 0]  # [b]

    @jax.jit
    def run(masks, xw0, w1_t, wh, snd_s, rcv_s, not_self):
        mt_all = masks.T  # [N, B]
        chunks = jnp.moveaxis(
            mt_all.reshape(N, B_TOTAL // chunk, chunk), 1, 0)
        return jax.lax.map(
            lambda mt: chunk_fwd(mt, xw0, w1_t, wh, snd_s, rcv_s, not_self),
            chunks,
        ).reshape(B_TOTAL)

    args = (masks_np, xw0_np, w1, wh, snd_s_np, rcv_s_np, not_self_np)

    t0 = time.perf_counter()
    lowered = run.lower(*args)
    print(f"trace/lower {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    out = jax.block_until_ready(compiled(*args))
    print(f"first run (incl transfers) {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        out = compiled(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"nbf-coo {dtype_name} chunk={chunk}: {dt*1e3:.1f} ms, "
          f"{B_TOTAL/dt:.1f} fwd/s", flush=True)
    print("out[:4]:", np.asarray(out)[:4], flush=True)


if __name__ == "__main__":
    main()

"""Big-graph masked-forward layout experiments (100k nodes / 1M edges).

Compares, on real TPU hardware, per-chunk latency of the batched masked
2-layer GCN backbone (the full-graph explainer hot loop) across layouts:

  A. current FastBatchedGCN ELL path ([B,N,*] layout, f32 gathers)
  B. unified [N,B,F] batch-contiguous layout end-to-end (no transposes,
     mask gathers fetch 4*B-byte rows instead of B scalar gathers)
  C. B + bf16 gather rows (halve the dominant HBM gather traffic)
  D. C at chunk sizes 16 and 32 (amortise per-row index overhead)

Run:  nohup python benchmarks/exp_bigraph_layouts.py > /tmp/exp_layouts.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, E, F_IN, HIDDEN = 100_000, 1_000_000, 84, 128
B_TOTAL = 64


def timeit(fn, *args, reps=3):
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
    from bikg_graph_explainability_public_tpu.ops.ell import build_neighbor_table
    from bikg_graph_explainability_public_tpu.runtime import native

    rng = np.random.default_rng(0)
    feat = rng.normal(size=(N, F_IN)).astype(np.float32)
    ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(np.int64)
    g = px.from_arrays(feat, ei, pad_mode="exact")
    mdef = px.GCNNodeModel(F_IN, conv_channels=(HIDDEN, HIDDEN), fc_channels=(HIDDEN, 64))
    params = mdef.init(jax.random.PRNGKey(0))
    masks_np = (rng.random((B_TOTAL, g.n_pad)) > 0.3)
    masks = jnp.asarray(masks_np)
    query = 17

    # ---------------- A: current engine ----------------
    engine = FastBatchedGCN(mdef, params, g)
    run_a = jax.jit(lambda m: engine.query_outputs(m, query, chunk_size=8))
    dt = timeit(run_a, masks)
    print(f"A current engine chunk=8: {dt*1e3:.1f} ms total, "
          f"{B_TOTAL/dt:.1f} fwd/s", flush=True)

    # shared precomputes for variants B-D
    table = build_neighbor_table(g)
    nbr, valid = table.nbr, table.valid  # [N,K], [N,K]
    w0 = np.asarray(params["conv"][0]["weight"])
    xw0 = jnp.asarray(np.asarray(g.x)[:, :F_IN] @ w0.T)  # [N, C]
    b0 = params["conv"][0].get("bias")
    p1 = params["conv"][1]
    w1_t = jnp.asarray(np.asarray(p1["weight"]).T)  # [C, G]
    b1 = p1.get("bias")
    snd_all = np.asarray(g.senders)[: g.num_edges]
    rcv_all = np.asarray(g.receivers)[: g.num_edges]
    _rp, col, eid = native.build_csr(g.n_pad, snd_all, rcv_all)
    snd_s = jnp.asarray(col)
    rcv_s = jnp.asarray(rcv_all[eid])
    not_self = jnp.asarray((col != rcv_all[eid]).astype(np.float32))

    def make_nbf(gdtype):
        g0 = xw0[nbr].astype(gdtype)  # [N,K,C] batch-shared

        def chunk_fwd(mt):  # mt: [N, b] float32
            dis = None
            mnbr = mt[nbr]  # [N,K,b]
            w = valid[:, :, None] * mnbr * mt[:, None, :]
            deg = 1.0 + w.sum(1)  # [N,b]
            dis = jax.lax.rsqrt(deg)
            coeff = (w * dis[:, None, :] * dis[nbr]).astype(gdtype)  # [N,K,b]
            selfw = dis * dis  # [N,b]
            h = jnp.einsum("nkb,nkc->nbc", coeff, g0,
                           preferred_element_type=jnp.float32)
            h = h + selfw[:, :, None] * xw0[:, None, :]
            if b0 is not None:
                h = h + b0
            h = jax.nn.relu(h)
            hw = jnp.einsum("nbc,cg->nbg", h, w1_t,
                            preferred_element_type=jnp.float32)
            hwg = hw.astype(gdtype)
            w_eb = mt[snd_s] * mt[rcv_s] * not_self[:, None]  # [E,b]
            norm = (w_eb * dis[snd_s] * dis[rcv_s]).astype(gdtype)
            b = mt.shape[1]
            gdim = hw.shape[-1]
            msg = hwg[snd_s] * norm[:, :, None]  # [E,b,G]
            out = jax.ops.segment_sum(
                msg.reshape(E, b * gdim).astype(jnp.float32), rcv_s,
                num_segments=N, indices_are_sorted=True,
            ).reshape(N, b, gdim)
            h2 = out + selfw[:, :, None] * hw
            if b1 is not None:
                h2 = h2 + b1
            h2 = jax.nn.relu(h2)
            hq = h2[query]  # [b, G]
            return mdef.head(params, hq)[:, 0]

        return chunk_fwd

    def run_variant(name, gdtype, chunk):
        fwd = make_nbf(gdtype)

        @jax.jit
        def run(masks):
            mt_all = masks.astype(jnp.float32).T  # [N, B]
            chunks = mt_all.reshape(N, B_TOTAL // chunk, chunk)
            chunks = jnp.moveaxis(chunks, 1, 0)  # [nc, N, chunk]
            return jax.lax.map(fwd, chunks).reshape(B_TOTAL)

        dt = timeit(run, masks)
        print(f"{name}: {dt*1e3:.1f} ms total, {B_TOTAL/dt:.1f} fwd/s", flush=True)
        return run

    run_b = run_variant("B nbf f32 chunk=8", jnp.float32, 8)
    run_c = run_variant("C nbf bf16 chunk=8", jnp.bfloat16, 8)
    run_variant("D1 nbf bf16 chunk=16", jnp.bfloat16, 16)
    run_variant("D2 nbf bf16 chunk=32", jnp.bfloat16, 32)

    # numerics check (f32 variant vs current engine)
    ya = np.asarray(run_a(masks))
    yb = np.asarray(run_b(masks))
    yc = np.asarray(run_c(masks))
    print("max|A-B|:", np.abs(ya - yb).max(),
          " max|A-C|:", np.abs(ya - yc).max(), flush=True)


if __name__ == "__main__":
    main()

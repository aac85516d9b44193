"""Isolate one nbf-layout variant with phase timing (trace/compile/run).

Usage: python benchmarks/exp_nbf_single.py [f32|bf16] [chunk] [--no-ell1]
`--no-ell1` replaces the ELL first layer with the sorted-COO path too,
removing the [N,K,b] gathers from the program.
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
    use_ell1 = "--no-ell1" not in sys.argv

    import jax
    import jax.numpy as jnp

    import bikg_graph_explainability_public_tpu as px
    from bikg_graph_explainability_public_tpu.ops.ell import build_neighbor_table
    from bikg_graph_explainability_public_tpu.runtime import native

    gdtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32

    rng = np.random.default_rng(0)
    feat = rng.normal(size=(N, F_IN)).astype(np.float32)
    ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(np.int64)
    t0 = time.perf_counter()
    g = px.from_arrays(feat, ei, pad_mode="exact")
    mdef = px.GCNNodeModel(F_IN, conv_channels=(HIDDEN, HIDDEN), fc_channels=(HIDDEN, 64))
    params = mdef.init(jax.random.PRNGKey(0))
    masks = jnp.asarray((rng.random((B_TOTAL, g.n_pad)) > 0.3))
    query = 17
    print(f"setup {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    table = build_neighbor_table(g)
    nbr, valid = table.nbr, table.valid
    w0 = np.asarray(params["conv"][0]["weight"])
    xw0 = jnp.asarray(np.asarray(g.x)[:, :F_IN] @ w0.T)
    b0 = params["conv"][0].get("bias")
    p1 = params["conv"][1]
    w1_t = jnp.asarray(np.asarray(p1["weight"]).T)
    b1 = p1.get("bias")
    snd_all = np.asarray(g.senders)[: g.num_edges]
    rcv_all = np.asarray(g.receivers)[: g.num_edges]
    _rp, col, eid = native.build_csr(g.n_pad, snd_all, rcv_all)
    snd_s = jnp.asarray(col)
    rcv_s = jnp.asarray(rcv_all[eid])
    not_self = jnp.asarray((col != rcv_all[eid]).astype(np.float32))
    print(f"tables {time.perf_counter()-t0:.1f}s  K={table.k}", flush=True)

    g0 = None
    if use_ell1:
        g0 = xw0[nbr].astype(gdtype)

    def chunk_fwd(mt):  # [N, b] f32
        if use_ell1:
            mnbr = mt[nbr]
            w = valid[:, :, None] * mnbr * mt[:, None, :]
            deg = 1.0 + w.sum(1)
            dis = jax.lax.rsqrt(deg)
            coeff = (w * dis[:, None, :] * dis[nbr]).astype(gdtype)
            selfw = dis * dis
            h = jnp.einsum("nkb,nkc->nbc", coeff, g0,
                           preferred_element_type=jnp.float32)
        else:
            w_eb0 = mt[snd_s] * mt[rcv_s] * not_self[:, None]  # [E,b]
            deg = 1.0 + jax.ops.segment_sum(
                w_eb0, rcv_s, num_segments=N, indices_are_sorted=True)
            dis = jax.lax.rsqrt(deg)
            selfw = dis * dis
            norm0 = (w_eb0 * dis[snd_s] * dis[rcv_s]).astype(gdtype)
            xw0g = xw0.astype(gdtype)
            b = mt.shape[1]
            msg0 = xw0g[snd_s][:, None, :] * norm0[:, :, None]  # [E,b,C]
            h = jax.ops.segment_sum(
                msg0.reshape(E, b * xw0.shape[1]).astype(jnp.float32),
                rcv_s, num_segments=N, indices_are_sorted=True,
            ).reshape(N, b, xw0.shape[1])
        h = h + (dis * dis)[:, :, None] * xw0[:, None, :]
        if b0 is not None:
            h = h + b0
        h = jax.nn.relu(h)
        hw = jnp.einsum("nbc,cg->nbg", h, w1_t, preferred_element_type=jnp.float32)
        hwg = hw.astype(gdtype)
        w_eb = mt[snd_s] * mt[rcv_s] * not_self[:, None]
        norm = (w_eb * dis[snd_s] * dis[rcv_s]).astype(gdtype)
        b = mt.shape[1]
        gdim = hw.shape[-1]
        msg = hwg[snd_s] * norm[:, :, None]
        out = jax.ops.segment_sum(
            msg.reshape(E, b * gdim).astype(jnp.float32), rcv_s,
            num_segments=N, indices_are_sorted=True,
        ).reshape(N, b, gdim)
        h2 = out + (dis * dis)[:, :, None] * hw
        if b1 is not None:
            h2 = h2 + b1
        h2 = jax.nn.relu(h2)
        return mdef.head(params, h2[query])[:, 0]

    def run(masks):
        mt_all = masks.astype(jnp.float32).T
        chunks = mt_all.reshape(N, B_TOTAL // chunk, chunk)
        chunks = jnp.moveaxis(chunks, 1, 0)
        return jax.lax.map(chunk_fwd, chunks).reshape(B_TOTAL)

    t0 = time.perf_counter()
    lowered = jax.jit(run).lower(masks)
    print(f"trace/lower {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)

    out = jax.block_until_ready(compiled(masks))
    t0 = time.perf_counter()
    for _ in range(3):
        out = compiled(masks)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    tag = f"nbf {dtype_name} chunk={chunk} ell1={use_ell1}"
    print(f"{tag}: {dt*1e3:.1f} ms total, {B_TOTAL/dt:.1f} fwd/s", flush=True)
    print("out[:4]:", np.asarray(out)[:4], flush=True)


if __name__ == "__main__":
    main()

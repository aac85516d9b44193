"""Profile the big-graph batched forward's stages on real hardware.

Breaks ``FastBatchedGCN.batch_node_outputs`` (ELL mode) into its pieces —
coefficient build, layer-1 shared-gather aggregate, layer-2 batch-contiguous
segment-sum, bare gather, bare segment-sum — to show where the milliseconds
go.  Public engine API only, no private internals.

Run: python benchmarks/prof_big.py [--n 100000] [--e 1000000] [--b 8]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.models.fast_gcn import FastBatchedGCN
from bikg_graph_explainability_public_tpu.ops.ell import (
    ell_aggregate_shared,
    gcn_coeffs_from_node_mask,
)
from bikg_graph_explainability_public_tpu.runtime import native
from bikg_graph_explainability_public_tpu.graph import host_view


def timeit(f, *a, n=5):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--e", type=int, default=1_000_000)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--f", type=int, default=84)
    ap.add_argument("--hidden", type=int, default=128)
    args = ap.parse_args()
    n_nodes, e_edges, b, f, h_dim = args.n, args.e, args.b, args.f, args.hidden

    rng = np.random.default_rng(0)
    feat = rng.standard_normal(size=(n_nodes, f), dtype=np.float32)
    ei = np.stack(
        [rng.integers(0, n_nodes, e_edges), rng.integers(0, n_nodes, e_edges)]
    ).astype(np.int64)
    g = px.from_arrays(feat, ei, pad_mode="exact")
    mdef = px.GCNNodeModel(f, conv_channels=(h_dim, h_dim), fc_channels=(h_dim, 64))
    params = mdef.init(jax.random.PRNGKey(0))
    eng = FastBatchedGCN(mdef, params, g)
    print("mode", eng.mode, "K", eng.table.nbr.shape)

    masks = jnp.asarray(rng.random((b, g.n_pad)) > 0.3)

    full = jax.jit(lambda m: eng.batch_node_outputs(m))
    print("full fwd   %.1f ms" % (timeit(full, masks) * 1e3))

    table = eng.table
    coeffs = jax.jit(
        jax.vmap(lambda m: gcn_coeffs_from_node_mask(table, m.astype(jnp.float32)))
    )
    print("coeffs     %.1f ms" % (timeit(coeffs, masks) * 1e3))

    g0 = eng.xw0[table.nbr]
    jax.block_until_ready(g0)
    c, _sw = coeffs(masks)
    l1 = jax.jit(lambda c: ell_aggregate_shared(c.astype(eng.dtype), g0))
    print("layer1 ell %.1f ms" % (timeit(l1, c) * 1e3))

    # layer>=2 batch-contiguous segment-sum, isolated (receiver-sorted CSR)
    hv = host_view(g)
    _row_ptr, col, eid = native.build_csr(
        g.n_pad, hv.senders[: g.num_edges], hv.receivers[: g.num_edges]
    )
    snd_s = jnp.asarray(col)
    rcv_s = jnp.asarray(hv.receivers[: g.num_edges][eid])
    n_pad = g.n_pad
    h = jnp.asarray(rng.standard_normal(size=(b, n_pad, h_dim), dtype=np.float32))
    norm_eb = jnp.asarray(rng.random((e_edges, b), dtype=np.float32))

    @jax.jit
    def layer2(h, norm_eb):
        hw_t = jnp.transpose(h, (1, 0, 2))
        msg = hw_t[snd_s] * norm_eb[:, :, None]
        out_t = jax.ops.segment_sum(
            msg.reshape(-1, b * h_dim), rcv_s, num_segments=n_pad,
            indices_are_sorted=True,
        )
        return jnp.transpose(out_t.reshape(n_pad, b, h_dim), (1, 0, 2))

    print("layer2 seg %.1f ms" % (timeit(layer2, h, norm_eb) * 1e3))

    @jax.jit
    def gath(h):
        return jnp.transpose(h, (1, 0, 2))[snd_s]

    print("gather     %.1f ms" % (timeit(gath, h) * 1e3))

    msg = jnp.asarray(
        rng.standard_normal(size=(e_edges, b * h_dim), dtype=np.float32)
    )
    seg = jax.jit(
        lambda m: jax.ops.segment_sum(
            m, rcv_s, num_segments=n_pad, indices_are_sorted=True
        )
    )
    print("segsum     %.1f ms" % (timeit(seg, msg) * 1e3))


if __name__ == "__main__":
    main()

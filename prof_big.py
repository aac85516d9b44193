import time, numpy as np, jax, jax.numpy as jnp
import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.models.fast_gcn import FastBatchedGCN
from bikg_graph_explainability_public_tpu.graph import host_view

N, E, B, F, H = 100_000, 1_000_000, 8, 84, 128
rng = np.random.default_rng(0)
feat = rng.normal(size=(N, F)).astype(np.float32)
ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(np.int64)
g = px.from_arrays(feat, ei, pad_mode="exact")
mdef = px.GCNNodeModel(F, conv_channels=(H, H), fc_channels=(H, 64))
params = mdef.init(jax.random.PRNGKey(0))
eng = FastBatchedGCN(mdef, params, g)
print("mode", eng.mode, "K", eng.table.nbr.shape)

masks = jnp.asarray((rng.random((B, g.n_pad)) > 0.3))

def timeit(f, *a, n=5):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n

# full forward
full = jax.jit(lambda m: eng.batch_node_outputs(m))
print("full fwd   %.1f ms" % (timeit(full, masks) * 1e3))

# coeffs only
coeffs = jax.jit(lambda m: eng._coeffs(m, False))
print("coeffs     %.1f ms" % (timeit(coeffs, masks) * 1e3))

# layer1 shared-gather aggregate
from bikg_graph_explainability_public_tpu.ops.ell import ell_aggregate_shared
g0 = eng.xw0[eng.table.nbr]
jax.block_until_ready(g0)
c, sw = eng._coeffs(masks, False)
l1 = jax.jit(lambda c: ell_aggregate_shared(c.astype(eng.dtype), g0))
print("layer1 ell %.1f ms" % (timeit(l1, c) * 1e3))

# layer2 segment-sum path, isolated
snd_s, rcv_s = eng.snd_sorted, eng.rcv_sorted
n = g.n_pad
h = jnp.asarray(rng.normal(size=(B, n, H)).astype(np.float32))
norm_eb = jnp.asarray(rng.random((E, B)).astype(np.float32))

@jax.jit
def layer2(h, norm_eb):
    hw_t = jnp.transpose(h, (1, 0, 2))
    msg = hw_t[snd_s] * norm_eb[:, :, None]
    out_t = jax.ops.segment_sum(
        msg.reshape(-1, B * H), rcv_s, num_segments=n, indices_are_sorted=True)
    return jnp.transpose(out_t.reshape(n, B, H), (1, 0, 2))
print("layer2 seg %.1f ms" % (timeit(layer2, h, norm_eb) * 1e3))

# gather alone
@jax.jit
def gath(h):
    hw_t = jnp.transpose(h, (1, 0, 2))
    return hw_t[snd_s]
print("gather     %.1f ms" % (timeit(gath, h) * 1e3))

# segment-sum alone on pre-made msg
msg = np.asarray(rng.normal(size=(E, B * H))).astype(np.float32)
msg = jnp.asarray(msg)
seg = jax.jit(lambda m: jax.ops.segment_sum(m, rcv_s, num_segments=n, indices_are_sorted=True))
print("segsum     %.1f ms" % (timeit(seg, msg) * 1e3))

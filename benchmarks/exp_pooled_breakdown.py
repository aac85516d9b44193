import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.models.fast_gcn import FastBatchedGCN
from bikg_graph_explainability_public_tpu.ops.ell import ell_aggregate_shared

N, E, B, F, H = 100_000, 1_000_000, 8, 84, 128
rng = np.random.default_rng(0)
feat = rng.normal(size=(N, F)).astype(np.float32)
ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(np.int64)
g = px.from_arrays(feat, ei, pad_mode="exact")
mdef = px.GCNNodeModel(F, conv_channels=(H, H), fc_channels=(H, 64))
params = mdef.init(jax.random.PRNGKey(0))
eng = FastBatchedGCN(mdef, params, g)  # ell mode
masks = jnp.asarray(rng.random((B, g.n_pad)) > 0.3)

def slope(make_step, arg, n1=3, n2=13):
    def scan_n(n):
        @jax.jit
        def run(a):
            def body(carry, _):
                dep = (carry.reshape(-1)[:1] > 1e30)
                out = make_step(jnp.logical_xor(a, dep[0]) if a.dtype == jnp.bool_ else a + dep[0])
                return carry + out, ()
            out, _ = jax.lax.scan(body, jnp.zeros(make_step(arg).shape, jnp.float32), None, length=n)
            return out
        return run
    t = {}
    for n in (n1, n2):
        f = scan_n(n); np.asarray(f(arg))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); np.asarray(f(arg)); best = min(best, time.perf_counter()-t0)
        t[n] = best
    return (t[n2]-t[n1])/(n2-n1)

# full pooled forward
dt = slope(lambda m: eng.query_outputs(m, None, "graph_prediction", chunk_size=8)[:1], masks)
print(f"pooled fwd chunk8: {dt*1e3:.1f} ms -> {B/dt:.1f} fwd/s", flush=True)

# coeffs only
dt = slope(lambda m: eng._coeffs(m, False)[0].sum((1,2)), masks)
print(f"coeffs: {dt*1e3:.1f} ms", flush=True)

# layer1 ELL shared
coeff, self_w = eng._coeffs(masks, False)
g0 = jax.device_put(np.asarray(eng.xw0)[np.asarray(eng.table.nbr)])

def l1(c):
    return ell_aggregate_shared(c, g0).sum((1, 2))

# g0 enters as a jit argument (an 819MB closure constant blows the remote
# compile request)
l1j = jax.jit(lambda c, gg: ell_aggregate_shared(c, gg).sum((1, 2)))
np.asarray(l1j(coeff, g0))
t0 = time.perf_counter(); np.asarray(l1j(coeff, g0)); dt = time.perf_counter()-t0
print(f"layer1 ell shared (single dispatch incl overhead): {dt*1e3:.1f} ms", flush=True)

# layer2 batch-contiguous segment sum
h = jnp.asarray(rng.normal(size=(B, g.n_pad, H)).astype(np.float32))
snd_s, rcv_s = eng.snd_sorted, eng.rcv_sorted
norm_eb = jnp.asarray(rng.random((snd_s.shape[0], B)).astype(np.float32))
def l2(hw):
    hw_t = jnp.transpose(hw, (1, 0, 2))
    msg = hw_t[snd_s] * norm_eb[:, :, None]
    out_t = jax.ops.segment_sum(msg.reshape(-1, B*H), rcv_s, num_segments=g.n_pad, indices_are_sorted=True)
    return jnp.transpose(out_t.reshape(g.n_pad, B, H), (1, 0, 2)).sum((1,2))
dt = slope(l2, h)
print(f"layer2 segsum: {dt*1e3:.1f} ms", flush=True)

# head on all nodes
def head(hh):
    return mdef.head(params, hh)[..., 0].sum(-1)
dt = slope(head, h)
print(f"head all nodes: {dt*1e3:.1f} ms", flush=True)

import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.models.fast_gcn import FastBatchedGCN

N, E, B, H = 100_000, 1_000_000, 8, 128
rng = np.random.default_rng(0)
feat = rng.normal(size=(N, 84)).astype(np.float32)
ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(np.int64)
g = px.from_arrays(feat, ei, pad_mode="exact")
mdef = px.GCNNodeModel(84, conv_channels=(H, H), fc_channels=(H, 64))
params = mdef.init(jax.random.PRNGKey(0))
eng = FastBatchedGCN(mdef, params, g)
snd_s, rcv_s = eng.snd_sorted, eng.rcv_sorted
h = jnp.asarray(rng.normal(size=(B, g.n_pad, H)).astype(np.float32))
norm_eb = jnp.asarray(rng.random((snd_s.shape[0], B)).astype(np.float32))

def single(f, *a):
    out = np.asarray(f(*a))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(f(*a)); best = min(best, time.perf_counter()-t0)
    return best, out

@jax.jit
def v_base(hw, ne):
    hw_t = jnp.transpose(hw, (1, 0, 2))
    msg = hw_t[snd_s] * ne[:, :, None]
    out_t = jax.ops.segment_sum(msg.reshape(-1, B*H), rcv_s, num_segments=g.n_pad, indices_are_sorted=True)
    return out_t.reshape(g.n_pad, B, H).sum()

@jax.jit
def v_bf16(hw, ne):
    hw_t = jnp.transpose(hw, (1, 0, 2)).astype(jnp.bfloat16)
    msg = (hw_t[snd_s] * ne[:, :, None].astype(jnp.bfloat16)).astype(jnp.float32)
    out_t = jax.ops.segment_sum(msg.reshape(-1, B*H), rcv_s, num_segments=g.n_pad, indices_are_sorted=True)
    return out_t.reshape(g.n_pad, B, H).sum()

@jax.jit
def v_ell(hw, ne_nk):
    # per-sample ELL: gathered [B, N, K, H]
    tab = eng.table
    gathered = hw[:, tab.nbr]  # [B, N, K, H]
    return jnp.einsum("bnk,bnkh->", ne_nk, gathered, preferred_element_type=jnp.float32)

for name, f, args in [
    ("base segsum", v_base, (h, norm_eb)),
    ("bf16 gather", v_bf16, (h, norm_eb)),
]:
    t, _ = single(f, *args)
    print(f"{name}: {t*1e3:.1f} ms", flush=True)

ne_nk = jnp.asarray(rng.random((B, g.n_pad, eng.table.k)).astype(np.float32))
t, _ = single(v_ell, h, ne_nk)
print(f"per-sample ELL: {t*1e3:.1f} ms", flush=True)

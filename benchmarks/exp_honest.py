"""Slope-based honest timing of the batched masked-forward candidates.

The axon tunnel adds ~26 ms fixed RPC overhead per dispatch; marginal cost is
measured by scanning the hot computation n times inside ONE jit (sequential
data dependence) and differencing two n values.
"""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.models.fast_gcn import FastBatchedGCN

N, E, B, F, H = 2048, 16384, 1000, 84, 128
rng = np.random.default_rng(2)
feat = rng.normal(size=(N, F)).astype(np.float32)
ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(np.int64)
g = px.from_arrays(feat, ei, pad_mode="exact")
mdef = px.GCNNodeModel(F, conv_channels=(H, H), fc_channels=(H, 64))
params = mdef.init(jax.random.PRNGKey(0))
masks = jnp.asarray(rng.random((B, g.n_pad)) > 0.3)
query = 17

def marginal(make_step, n1=10, n2=110):
    """make_step(masks)->[B] outputs; returns seconds per step."""
    def scan_n(n):
        @jax.jit
        def run(masks):
            def body(carry, _):
                dep = (carry[:1] > 1e30)[None, :]  # [1,1] always-False, data-dependent
                out = make_step(jnp.logical_xor(masks, dep))
                return carry + out, ()  # consume EVERY element of every iteration
            carry = jnp.zeros((B,), jnp.float32)
            out, _ = jax.lax.scan(body, carry, None, length=n)
            return out
        return run
    t = {}
    for n in (n1, n2):
        f = scan_n(n)
        np.asarray(f(masks))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(f(masks)); best = min(best, time.perf_counter()-t0)
        t[n] = best
    return (t[n2]-t[n1])/(n2-n1)

eng = FastBatchedGCN(mdef, params, g)
dt = marginal(lambda m: eng.query_outputs(m, query, chunk_size=1000))
print(f"current dense: {dt*1e3:.3f} ms/step -> {B/dt:,.0f} fwd/s")

engp = FastBatchedGCN(mdef, params, g, backend="pallas")
dtp = marginal(lambda m: engp.query_outputs(m, query, chunk_size=1000))
print(f"pallas dense:  {dtp*1e3:.3f} ms/step -> {B/dtp:,.0f} fwd/s")

# --- hop-restricted candidate ---
import collections
snd = np.asarray(g.senders)[:g.num_edges]; rcv = np.asarray(g.receivers)[:g.num_edges]
in_nbrs = collections.defaultdict(list)
for s_, r_ in zip(snd, rcv): in_nbrs[r_].append(s_)
hop = {query: 0}; frontier = [query]
for d in range(1, 2):
    nxt = []
    for v in frontier:
        for u in in_nbrs[v]:
            if u not in hop: hop[u] = d; nxt.append(u)
    frontier = nxt
rows1 = sorted(hop)
k = max(8, ((len(rows1)+7)//8)*8)
rows1 = np.array((rows1 + [rows1[0]]*k)[:k], np.int32)
a_np = np.zeros((N, N), np.float32)
keep = snd != rcv
np.add.at(a_np, (rcv[keep], snd[keep]), 1.0)
A = jnp.asarray(a_np); A1 = jnp.asarray(a_np[rows1])
qpos = int(np.nonzero(rows1 == query)[0][0])
aq_r = jnp.asarray(a_np[query][rows1])
xw0 = eng.xw0
p0, p1 = params["conv"][0], params["conv"][1]
rows1_j = jnp.asarray(rows1)

def hoprestrict(masks):
    m = masks.astype(jnp.float32)
    deg = 1.0 + m * jnp.einsum("vu,bu->bv", A, m, preferred_element_type=jnp.float32)
    dis = jax.lax.rsqrt(deg); self_w = dis*dis; s = m*dis
    a1s = A1[None] * s[:, None, :]
    agg = jnp.einsum("bkn,nc->bkc", a1s, xw0, preferred_element_type=jnp.float32)
    h = s[:, rows1_j, None]*agg + self_w[:, rows1_j, None]*xw0[rows1_j]
    h = jax.nn.relu(h + p0["bias"])
    hw = h @ p1["weight"].T
    aggq = jnp.einsum("k,bkc->bc", aq_r, s[:, rows1_j][:, :, None]*hw)
    hq = s[:, query, None]*aggq + self_w[:, query, None]*hw[:, qpos]
    hq = jax.nn.relu(hq + p1["bias"])
    return mdef.head(params, hq)[:, 0]

dth = marginal(hoprestrict)
print(f"hoprestrict:   {dth*1e3:.3f} ms/step -> {B/dth:,.0f} fwd/s")

# deg-only floor (the unavoidable [B,N] mask-degree matmul)
def degonly(masks):
    m = masks.astype(jnp.float32)
    deg = 1.0 + m * jnp.einsum("vu,bu->bv", A, m, preferred_element_type=jnp.float32)
    return deg[:, 0]
dtd = marginal(degonly)
print(f"deg only:      {dtd*1e3:.3f} ms/step")

# bf16 deg
def degonly16(masks):
    m = masks.astype(jnp.bfloat16)
    deg = 1.0 + m * jnp.einsum("vu,bu->bv", A.astype(jnp.bfloat16), m, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return deg[:, 0].astype(jnp.float32)
dtd16 = marginal(degonly16)
print(f"deg bf16 only: {dtd16*1e3:.3f} ms/step")

# --- integrated restricted engine ---
eng_r = FastBatchedGCN(mdef, params, g)  # restrict=True default
dtr = marginal(lambda m: eng_r.query_outputs(m, query, chunk_size=1000))
print(f"engine restricted: {dtr*1e3:.3f} ms/step -> {B/dtr:,.0f} fwd/s")

# edge problem at same scale
masks_e = jnp.asarray(rng.random((B, g.e_pad)) > 0.3)
def marginal_e(make_step, n1=10, n2=110):
    def scan_n(n):
        @jax.jit
        def run(masks):
            def body(carry, _):
                dep = (carry[:1] > 1e30)[None, :]
                out = make_step(jnp.logical_xor(masks, dep))
                return carry + out, ()
            out, _ = jax.lax.scan(body, jnp.zeros((B,), jnp.float32), None, length=n)
            return out
        return run
    t = {}
    for n in (n1, n2):
        f = scan_n(n); np.asarray(f(masks_e))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(f(masks_e)); best = min(best, time.perf_counter()-t0)
        t[n] = best
    return (t[n2]-t[n1])/(n2-n1)
dte = marginal_e(lambda m: eng_r.query_outputs(m, query, "edge_prediction", chunk_size=1000))
print(f"engine restricted edge: {dte*1e3:.3f} ms/step -> {B/dte:,.0f} fwd/s")

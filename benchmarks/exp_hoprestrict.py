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

def timeit(fn, *a, reps=5):
    out = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0)/reps, out

eng = FastBatchedGCN(mdef, params, g)
f0 = jax.jit(lambda m: eng.query_outputs(m, query, chunk_size=1000))
t, ref = timeit(f0, masks)
print(f"current: {B/t:.0f} fwd/s ({t*1e3:.2f} ms)")

# hop sets (host, BFS over undirected? GCN messages flow src->dst; query output
# needs senders into query: in-neighbors. hop_l = nodes reaching query in <= l steps)
import collections
snd = np.asarray(g.senders)[:g.num_edges]; rcv = np.asarray(g.receivers)[:g.num_edges]
in_nbrs = collections.defaultdict(list)
for s_, r_ in zip(snd, rcv): in_nbrs[r_].append(s_)
L = 2
hop = {query: 0}; frontier = [query]
for d in range(1, L):
    nxt = []
    for v in frontier:
        for u in in_nbrs[v]:
            if u not in hop: hop[u] = d; nxt.append(u)
    frontier = nxt
# rows_l for conv layer l (1-indexed): nodes with hop <= L - l
def pad_rows(rows, mult=8):
    k = max(mult, ((len(rows)+mult-1)//mult)*mult)
    out = np.full(k, rows[0] if rows else 0, np.int32)  # pad with dup of first (harmless: rows are gathered, output rows ignored beyond real)
    out[:len(rows)] = rows
    return out
rows1 = pad_rows([v for v,d in hop.items() if d <= L-1])
print("K1 =", len(rows1))
a_np = np.zeros((N, N), np.float32)
keep = snd != rcv
np.add.at(a_np, (rcv[keep], snd[keep]), 1.0)
A = jnp.asarray(a_np)
A1 = jnp.asarray(a_np[rows1])          # [K1, N]
qpos = int(np.nonzero(rows1 == query)[0][0]) if query in rows1 else None
aq_r = jnp.asarray(a_np[query][rows1]) # [K1] columns restricted to rows1
xw0 = eng.xw0
p0, p1 = params["conv"][0], params["conv"][1]
rows1_j = jnp.asarray(rows1)

def hoprestrict(masks):
    m = masks.astype(jnp.float32)
    deg = 1.0 + m * jnp.einsum("vu,bu->bv", A, m, preferred_element_type=jnp.float32)
    dis = jax.lax.rsqrt(deg); self_w = dis*dis; s = m*dis
    # layer 1 at rows1 only: [B,K,N] scaled adjacency @ [N,C]
    a1s = A1[None] * s[:, None, :]                       # [B,K,N]
    agg = jnp.einsum("bkn,nc->bkc", a1s, xw0, preferred_element_type=jnp.float32)
    h = s[:, rows1_j, None]*agg + self_w[:, rows1_j, None]*xw0[rows1_j]
    h = jax.nn.relu(h + p0["bias"])
    # layer 2 at query only
    hw = h @ p1["weight"].T                              # [B,K,H]
    aggq = jnp.einsum("k,bkc->bc", aq_r, s[:, rows1_j, None].squeeze(-1)[:, :, None]*hw)
    hq = s[:, query, None]*aggq + self_w[:, query, None]*hw[:, qpos]
    hq = jax.nn.relu(hq + p1["bias"])
    return mdef.head(params, hq)[:, 0]

f1 = jax.jit(hoprestrict)
t, out = timeit(f1, masks)
err = np.abs(np.asarray(out) - np.asarray(ref)).max()
print(f"hoprestrict: {B/t:.0f} fwd/s ({t*1e3:.2f} ms)  max_err={err:.2e}")

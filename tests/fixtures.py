"""Shared test fixtures: reproducible mock graphs and a dense numpy oracle.

The oracle implements PyG-semantics GCN/GAT with *dense* adjacency matrices —
a deliberately different algorithm from the framework's segment-sum path, so
agreement is a genuine cross-check (mirrors the reference's hand-built ground
truths, ``/root/reference/tests/test_data.py``).
"""

from __future__ import annotations

import numpy as np


def make_graph(
    n: int = 36, f: int = 84, e: int = 116, seed: int = 0, self_loops: bool = True
):
    """Random directed graph, reference test scale (36 nodes / 116 edges,
    ``tests/test_explainer.py:317-608``)."""
    rng = np.random.default_rng(seed)
    feat = rng.normal(size=(n, f)).astype(np.float32)
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    if not self_loops:
        bad = src == dst
        dst[bad] = (dst[bad] + 1) % n
    edge_index = np.stack([src, dst]).astype(np.int64)
    names = [str(i) for i in range(n)]
    return feat, edge_index, names


def make_communities(n: int, k: int = 4, seed: int = 1):
    """k communities partitioning [0, n) with string names."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    chunks = np.array_split(perm, k)
    pathways = [[str(int(v)) for v in c] for c in chunks]
    names = [f"community_{i}" for i in range(k)]
    return pathways, names


# ---------------------------------------------------------------------------
# dense numpy oracle (PyG semantics)
# ---------------------------------------------------------------------------


def dense_gcn_conv(
    x: np.ndarray,
    edge_index: np.ndarray,
    weight: np.ndarray,
    bias: np.ndarray | None = None,
    edge_keep: np.ndarray | None = None,
) -> np.ndarray:
    """GCNConv oracle: A+I with data self-loops replaced, symmetric norm,
    aggregation at targets.  weight is torch layout [out, in]."""
    n = x.shape[0]
    a = np.zeros((n, n), np.float64)
    src, dst = edge_index
    keep = np.ones(src.shape[0], bool) if edge_keep is None else edge_keep.astype(bool)
    for s, d, k in zip(src, dst, keep):
        if k and s != d:
            a[d, s] += 1.0  # messages flow source -> target
    a += np.eye(n)
    deg = a.sum(axis=1)
    dis = np.where(deg > 0, deg**-0.5, 0.0)
    a_norm = dis[:, None] * a * dis[None, :]
    out = a_norm @ (x.astype(np.float64) @ weight.T.astype(np.float64))
    if bias is not None:
        out = out + bias
    return out


def dense_gat_conv(
    x_src: np.ndarray,
    x_dst: np.ndarray,
    edge_index: np.ndarray,
    lin_src: np.ndarray,
    lin_dst: np.ndarray,
    att_src: np.ndarray,
    att_dst: np.ndarray,
    bias: np.ndarray | None = None,
    negative_slope: float = 0.2,
    edge_keep: np.ndarray | None = None,
) -> np.ndarray:
    """Single-head GATConv oracle (add_self_loops=False)."""
    n = x_dst.shape[0]
    h = 1
    c = lin_src.shape[0]
    xs = x_src.astype(np.float64) @ lin_src.T.astype(np.float64)  # [N, C]
    xd = x_dst.astype(np.float64) @ lin_dst.T.astype(np.float64)
    a_s = (xs * att_src.reshape(1, -1)).sum(-1)
    a_d = (xd * att_dst.reshape(1, -1)).sum(-1)
    src, dst = edge_index
    keep = np.ones(src.shape[0], bool) if edge_keep is None else edge_keep.astype(bool)
    out = np.zeros((n, c), np.float64)
    for v in range(n):
        inc = [i for i in range(src.shape[0]) if dst[i] == v and keep[i]]
        if not inc:
            continue
        logits = np.array([a_s[src[i]] + a_d[v] for i in inc])
        logits = np.where(logits >= 0, logits, negative_slope * logits)
        logits -= logits.max()
        alpha = np.exp(logits)
        alpha /= alpha.sum()
        for a_i, i in zip(alpha, inc):
            out[v] += a_i * xs[src[i]]
    if bias is not None:
        out = out + bias
    return out


def dense_khop(edge_index: np.ndarray, query: int, hops: int, n: int):
    """k-hop receptive field oracle: nodes reaching query along <=k directed
    edges (PyG flow='source_to_target')."""
    src, dst = edge_index
    reach = np.zeros(n, bool)
    reach[query] = True
    for _ in range(hops):
        new = reach.copy()
        for s, d in zip(src, dst):
            if reach[d]:
                new[s] = True
        reach = new
    return reach


def mlp_head(x, fc_params, final="sigmoid"):
    """ReLU MLP head with sigmoid output (oracle)."""
    h = x.astype(np.float64)
    for i, p in enumerate(fc_params):
        h = h @ p["weight"].T.astype(np.float64) + p["bias"].astype(np.float64)
        if i == len(fc_params) - 1:
            h = 1.0 / (1.0 + np.exp(-h)) if final == "sigmoid" else h
        else:
            h = np.maximum(h, 0.0)
    return h


def dense_gat_conv_selfloops(
    x: np.ndarray,
    edge_index: np.ndarray,
    lin_src: np.ndarray,
    att_src: np.ndarray,
    att_dst: np.ndarray,
    bias: np.ndarray | None = None,
    lin_dst: np.ndarray | None = None,
    negative_slope: float = 0.2,
    edge_keep: np.ndarray | None = None,
) -> np.ndarray:
    """Single-head homogeneous GATConv oracle with PyG's default
    ``add_self_loops=True`` (self-loops join the softmax and are never
    masked)."""
    n = x.shape[0]
    c = lin_src.shape[0]
    xs = x.astype(np.float64) @ lin_src.T.astype(np.float64)
    xd = (
        xs
        if lin_dst is None
        else x.astype(np.float64) @ lin_dst.T.astype(np.float64)
    )
    a_s = (xs * att_src.reshape(1, -1)).sum(-1)
    a_d = (xd * att_dst.reshape(1, -1)).sum(-1)
    src, dst = edge_index
    keep = np.ones(src.shape[0], bool) if edge_keep is None else edge_keep.astype(bool)
    out = np.zeros((n, c), np.float64)
    for v in range(n):
        inc = [i for i in range(src.shape[0]) if dst[i] == v and keep[i]]
        srcs = [src[i] for i in inc] + [v]  # the unit self-loop
        logits = np.array([a_s[u] + a_d[v] for u in srcs])
        logits = np.where(logits >= 0, logits, negative_slope * logits)
        logits -= logits.max()
        alpha = np.exp(logits)
        alpha /= alpha.sum()
        for a_i, u in zip(alpha, srcs):
            out[v] += a_i * xs[u]
    if bias is not None:
        out = out + bias
    return out


def dense_sage_conv(
    x: np.ndarray,
    edge_index: np.ndarray,
    w_l: np.ndarray,
    b_l: np.ndarray | None,
    w_r: np.ndarray,
    edge_keep: np.ndarray | None = None,
) -> np.ndarray:
    """PyG SAGEConv oracle: ``lin_l(mean_in(x_u)) + lin_r(x)`` (mean over
    kept in-edges; zero when none)."""
    n = x.shape[0]
    src, dst = edge_index
    keep = np.ones(src.shape[0], bool) if edge_keep is None else edge_keep.astype(bool)
    x64 = x.astype(np.float64)
    agg = np.zeros_like(x64)
    for v in range(n):
        inc = [src[i] for i in range(src.shape[0]) if dst[i] == v and keep[i]]
        if inc:
            agg[v] = x64[inc].mean(0)
    out = agg @ w_l.T.astype(np.float64) + x64 @ w_r.T.astype(np.float64)
    if b_l is not None:
        out = out + b_l
    return out


def dense_graph_conv(
    x: np.ndarray,
    edge_index: np.ndarray,
    w_rel: np.ndarray,
    b_rel: np.ndarray | None,
    w_root: np.ndarray,
    edge_keep: np.ndarray | None = None,
) -> np.ndarray:
    """PyG GraphConv oracle: ``lin_rel(sum_in(x_u)) + lin_root(x)`` (sum
    over kept in-edges)."""
    n = x.shape[0]
    src, dst = edge_index
    keep = (
        np.ones(src.shape[0], bool) if edge_keep is None
        else edge_keep.astype(bool)
    )
    x64 = x.astype(np.float64)
    agg = np.zeros_like(x64)
    for i in range(src.shape[0]):
        if keep[i]:
            agg[dst[i]] += x64[src[i]]
    out = agg @ w_rel.T.astype(np.float64) + x64 @ w_root.T.astype(np.float64)
    if b_rel is not None:
        out = out + b_rel
    return out


def dense_gin_conv(
    x: np.ndarray,
    edge_index: np.ndarray,
    mlp: list,
    eps: float = 0.0,
    edge_keep: np.ndarray | None = None,
) -> np.ndarray:
    """PyG GINConv oracle: ``mlp((1+eps) x + sum_in(x_u))``; ``mlp`` is a
    list of (weight, bias) with ReLU between layers."""
    n = x.shape[0]
    src, dst = edge_index
    keep = np.ones(src.shape[0], bool) if edge_keep is None else edge_keep.astype(bool)
    x64 = x.astype(np.float64)
    agg = np.zeros_like(x64)
    for i in range(src.shape[0]):
        if keep[i]:
            agg[dst[i]] += x64[src[i]]
    h = (1.0 + eps) * x64 + agg
    for li, (w, b) in enumerate(mlp):
        h = h @ w.T.astype(np.float64) + b
        if li != len(mlp) - 1:
            h = np.maximum(h, 0.0)
    return h


def dense_gat_multihead(
    x: np.ndarray,
    edge_index: np.ndarray,
    lin_src: np.ndarray,  # [H*C, in]
    att_src: np.ndarray,  # [1, H, C]
    att_dst: np.ndarray,
    bias: np.ndarray | None = None,
    lin_dst: np.ndarray | None = None,
    negative_slope: float = 0.2,
    edge_keep: np.ndarray | None = None,
    add_self_loops: bool = True,
    concat: bool = True,
) -> np.ndarray:
    """Multi-head GATConv oracle: per-head masked softmax attention, heads
    concatenated ([N, H*C]) or averaged ([N, C])."""
    n = x.shape[0]
    _, h, c = att_src.shape
    xs = (x.astype(np.float64) @ lin_src.T.astype(np.float64)).reshape(n, h, c)
    w_dst = lin_src if lin_dst is None else lin_dst
    xd = (x.astype(np.float64) @ w_dst.T.astype(np.float64)).reshape(n, h, c)
    a_s = (xs * att_src.astype(np.float64)).sum(-1)  # [N, H]
    a_d = (xd * att_dst.astype(np.float64)).sum(-1)
    src, dst = edge_index
    keep = np.ones(src.shape[0], bool) if edge_keep is None else edge_keep.astype(bool)
    out = np.zeros((n, h, c), np.float64)
    for v in range(n):
        inc = [i for i in range(src.shape[0]) if dst[i] == v and keep[i]]
        srcs = [src[i] for i in inc] + ([v] if add_self_loops else [])
        if not srcs:
            continue
        for head in range(h):
            logits = np.array([a_s[u, head] + a_d[v, head] for u in srcs])
            logits = np.where(logits >= 0, logits, negative_slope * logits)
            logits -= logits.max()
            alpha = np.exp(logits)
            alpha /= alpha.sum()
            for a_i, u in zip(alpha, srcs):
                out[v, head] += a_i * xs[u, head]
    out = out.reshape(n, h * c) if concat else out.mean(axis=1)
    if bias is not None:
        out = out + bias
    return out


def dense_gatv2_conv(
    x: np.ndarray,
    edge_index: np.ndarray,
    lin_l: np.ndarray,  # [H*C, in]
    lin_r: np.ndarray,
    att: np.ndarray,  # [1, H, C]
    bias: np.ndarray | None = None,
    bias_l: np.ndarray | None = None,
    bias_r: np.ndarray | None = None,
    negative_slope: float = 0.2,
    edge_keep: np.ndarray | None = None,
    add_self_loops: bool = True,
    concat: bool = True,
) -> np.ndarray:
    """GATv2Conv oracle: e_ij = att . leaky_relu(lin_l(x_j) + lin_r(x_i)),
    out_i = sum_j alpha_ij lin_l(x_j)."""
    n = x.shape[0]
    _, h, c = att.shape
    xl = x.astype(np.float64) @ lin_l.T.astype(np.float64)
    xr = x.astype(np.float64) @ lin_r.T.astype(np.float64)
    if bias_l is not None:
        xl = xl + bias_l
    if bias_r is not None:
        xr = xr + bias_r
    xl = xl.reshape(n, h, c)
    xr = xr.reshape(n, h, c)
    src, dst = edge_index
    keep = np.ones(src.shape[0], bool) if edge_keep is None else edge_keep.astype(bool)
    out = np.zeros((n, h, c), np.float64)
    att64 = att.astype(np.float64)[0]  # [H, C]
    for v in range(n):
        inc = [i for i in range(src.shape[0]) if dst[i] == v and keep[i]]
        srcs = [src[i] for i in inc] + ([v] if add_self_loops else [])
        if not srcs:
            continue
        for head in range(h):
            pre = np.stack([xl[u, head] + xr[v, head] for u in srcs])
            pre = np.where(pre >= 0, pre, negative_slope * pre)
            logits = pre @ att64[head]
            logits -= logits.max()
            alpha = np.exp(logits)
            alpha /= alpha.sum()
            for a_i, u in zip(alpha, srcs):
                out[v, head] += a_i * xl[u, head]
    out = out.reshape(n, h * c) if concat else out.mean(axis=1)
    if bias is not None:
        out = out + bias
    return out


def dense_rgcn_conv(
    x: np.ndarray,
    edge_index: np.ndarray,
    edge_type: np.ndarray,
    weight: np.ndarray,  # [R, in, out] or [B, in, out]
    root: np.ndarray,  # [in, out]
    bias: np.ndarray | None = None,
    comp: np.ndarray | None = None,  # [R, B]
    edge_keep: np.ndarray | None = None,
) -> np.ndarray:
    """RGCNConv oracle: out_i = x_i @ root + sum_r mean_{j in N_r(i)}
    (x_j @ W_r) + bias, with optional basis decomposition."""
    n = x.shape[0]
    w = weight.astype(np.float64)
    if comp is not None:
        w = np.einsum("rb,bio->rio", comp.astype(np.float64), w)
    r_total = w.shape[0]
    x64 = x.astype(np.float64)
    out = x64 @ root.astype(np.float64)
    src, dst = edge_index
    keep = np.ones(src.shape[0], bool) if edge_keep is None else edge_keep.astype(bool)
    for v in range(n):
        for r in range(r_total):
            nbrs = [
                src[i]
                for i in range(src.shape[0])
                if dst[i] == v and keep[i] and edge_type[i] == r
            ]
            if not nbrs:
                continue
            agg = np.mean([x64[u] for u in nbrs], axis=0)
            out[v] += agg @ w[r]
    if bias is not None:
        out = out + bias
    return out

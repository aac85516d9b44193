"""Batched multi-query explanation (explanations/sec path).

The reference explains exactly one element per ``run()`` (a Python loop of
repeats around torch training, ``explainer.py:490-519``).  Production serving
wants *many* queries explained at once.  Here the entire per-query pipeline —
Shapley mask sampling, masked black-box forwards, KernelSHAP weighting,
surrogate Adam training — is one pure function of (subgraph arrays, query,
PRNG key), vmapped over a stack of budget-padded computational subgraphs.
One compiled program explains Q nodes.

v1 scope: homogeneous GCNNodeModel, KernelSHAP (no communities), dense
subgraph formulation (the common case: computational subgraphs fit the dense
threshold).  Community mode and hetero models go through
:class:`.explainer.Explainer` per query.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..models.gnn import GCNNodeModel
from ..ops.khop import extract_khop_subgraph
from ..utils.padding import round_up_pow2
from ..utils.prng import repeat_key
from .kernels import shap_kernel
from .masks import MaskSampler
from .wlm import init_surrogate_weights, train_surrogate
from ..graph import Graph, host_view


def _stack_subgraphs(graph: Graph, queries: Sequence[int], n_hops: int):
    """Extract each query's computational subgraph and pad all of them to a
    common (max-bucket) capacity; returns stacked numpy arrays."""
    subs = [
        extract_khop_subgraph(graph, int(q), n_hops, host_only=True)
        for q in queries
    ]
    n_pad = max(round_up_pow2(s.graph.num_nodes) for s in subs)
    f = graph.num_features

    qn = len(subs)
    xs = np.zeros((qn, n_pad, f), np.float32)
    adjs = np.zeros((qn, n_pad, n_pad), np.float32)
    qidx = np.zeros((qn,), np.int32)
    nvalid = np.zeros((qn,), np.int32)
    parent_nodes: List[np.ndarray] = []
    for i, s in enumerate(subs):
        g = s.graph
        n = g.num_nodes
        hv = host_view(g)
        xs[i, :n] = hv.x[:n]
        snd = hv.senders[: g.num_edges]
        rcv = hv.receivers[: g.num_edges]
        keep = snd != rcv
        np.add.at(adjs[i], (rcv[keep], snd[keep]), 1.0)
        qidx[i] = s.query
        nvalid[i] = n
        parent_nodes.append(np.asarray(s.parent_nodes)[:n])
    return xs, adjs, qidx, nvalid, parent_nodes


@partial(
    jax.jit,
    static_argnames=("model_def", "n_masks", "epochs", "lr", "l1", "wd", "chunk"),
)
def _explain_one_query(
    model_def: GCNNodeModel,
    params,
    x,  # [N, F]
    adj,  # [N, N]
    query,  # scalar int
    n_valid,  # scalar int (actual node count)
    key,
    n_masks: int,
    epochs: int,
    lr: float,
    l1: float,
    wd: float,
    chunk: int,
    masks=None,  # [n_masks, N] bool — community mode passes pre-sampled masks
):
    n = x.shape[0]
    # fold_in (not split) so the surrogate-init key is identical whether the
    # mask draw happens here (Shapley mode) or masks arrive pre-sampled
    # (community mode) — no dead randomness either way
    k_init = jax.random.fold_in(key, 1)
    col_valid = jnp.arange(n) < n_valid
    if masks is None:
        k_mask = jax.random.fold_in(key, 0)
        masks = jax.random.bernoulli(k_mask, 0.5, (n_masks, n)) & col_valid[None, :]

    xw0 = x[:, : model_def.convs[0].in_features] @ params["conv"][0]["weight"].T

    def forward_chunk(mchunk):
        m = mchunk.astype(jnp.float32)
        deg = 1.0 + m * jnp.einsum(
            "vu,bu->bv", adj, m, preferred_element_type=jnp.float32
        )
        dis = jax.lax.rsqrt(deg)
        s = m * dis
        self_w = dis * dis

        def layer(feats_w, first):
            scaled = s[:, :, None] * (feats_w[None] if first else feats_w)
            agg = jnp.einsum(
                "vu,buc->bvc", adj, scaled, preferred_element_type=jnp.float32
            )
            return s[:, :, None] * agg

        p0 = params["conv"][0]
        h = layer(xw0, True) + self_w[:, :, None] * xw0[None]
        if "bias" in p0:
            h = h + p0["bias"]
        h = jax.nn.relu(h)
        for conv, p in zip(model_def.convs[1:], params["conv"][1:]):
            hw = h[..., : conv.in_features] @ p["weight"].T
            h = layer(hw, False) + self_w[:, :, None] * hw
            if "bias" in p:
                h = h + p["bias"]
            h = jax.nn.relu(h)
        hq = h[:, query, :]
        return model_def.head(params, hq)[:, 0]

    chunks = masks.reshape(n_masks // chunk, chunk, n)
    outputs = jax.lax.map(forward_chunk, chunks).reshape(n_masks)

    # kernel with traced element count (mask width is padded)
    k = jnp.sum(masks, axis=1).astype(jnp.float32)
    nv = n_valid.astype(jnp.float32) - 1.0
    logw = (
        jnp.log(nv)
        - (
            jax.lax.lgamma(nv + 2.0)
            - jax.lax.lgamma(k + 1.0)
            - jax.lax.lgamma(nv + 2.0 - k)
        )
        - jnp.log(jnp.maximum(nv + 1.0 - k, 1e-30))
        - jnp.log(jnp.maximum(k, 1e-30))
    )
    valid = (k >= 1.0) & (k <= nv)
    safe = jnp.where(valid, logw, -jnp.inf)
    logw = logw - jnp.max(jnp.where(jnp.isfinite(safe), safe, -1e30))
    kern = jnp.where(valid, jnp.exp(logw), 0.0)

    # surrogate training (same scan as wlm.train_surrogate, but with a traced
    # valid-column count)
    bs = n_masks // epochs
    maskf = masks.astype(jnp.float32).reshape(epochs, bs, n)
    y = outputs.reshape(epochs, bs)
    kb = kern.reshape(epochs, bs)
    limit = jax.lax.rsqrt(n_valid.astype(jnp.float32))
    w0 = (
        jax.random.uniform(k_init, (n,), jnp.float32, -1.0, 1.0)
        * limit
        * col_valid.astype(jnp.float32)
    )
    colf = col_valid.astype(jnp.float32)

    def loss_fn(w, mb, yb, kbb):
        pred = mb @ w
        wmse = jnp.mean(kbb * (pred - yb) ** 2) / jnp.maximum(kbb.sum(), 1e-30)
        return wmse + l1 * jnp.sum(jnp.abs(w) * colf) / n_valid.astype(jnp.float32)

    def step(carry, batch):
        w, m_, v_, t, bw, bl = carry
        mb, yb, kbb = batch
        loss, g = jax.value_and_grad(loss_fn)(w, mb, yb, kbb)
        g = (g + wd * w) * colf
        t = t + 1
        m_ = 0.9 * m_ + 0.1 * g
        v_ = 0.999 * v_ + 0.001 * g * g
        w = w - lr * (m_ / (1 - 0.9**t)) / (jnp.sqrt(v_ / (1 - 0.999**t)) + 1e-8)
        imp = loss < bl
        return (w, m_, v_, t, jnp.where(imp, w, bw), jnp.where(imp, loss, bl)), loss

    carry0 = (w0, jnp.zeros_like(w0), jnp.zeros_like(w0), jnp.float32(0), w0,
              jnp.float32(jnp.inf))
    (w, *_rest, best_w, _), _losses = jax.lax.scan(step, carry0, (maskf, y, kb))
    return best_w


def explain_many(
    model,
    graph: Graph,
    queries: Sequence[int],
    params_cfg: dict,
    names: Optional[Sequence[str]] = None,
    times: int = 1,
    chunk: int = 250,
    mesh=None,
    pathways=None,
    pathway_names=None,
):
    """Explain Q node queries with one vmapped program per repeat.

    ``model``: a :class:`..models.adapter.Model` wrapping a GCNNodeModel.
    Returns one sorted DataFrame per query (same schema as
    ``Explainer.run``).

    ``mesh``: an optional :class:`jax.sharding.Mesh` — the query axis shards
    over its first axis (queries are embarrassingly parallel, so scaling is
    linear in devices with zero communication; Q is padded to a multiple of
    the axis size by repeating the last query).

    ``pathways`` / ``pathway_names``: communities as element-name lists
    (Configuration-Value mode, like ``Explainer``): masks are sampled with
    the reference's community-structured sampler per query, stacks are
    row-padded to a common budget with all-False rows (kernel weight 0 —
    inert in the weighted loss), and the return value becomes a list of
    ``(element_df, pathway_df)`` pairs.
    """
    model_def = model.model_def
    if not isinstance(model_def, GCNNodeModel):
        raise TypeError("explain_many v1 supports GCNNodeModel")
    n_hops = model_def.num_hops + 1
    xs, adjs, qidx, nvalid, parent_nodes = _stack_subgraphs(graph, queries, n_hops)

    n_masks = int(params_cfg["interpret_samples"]) * int(params_cfg["epochs"])
    epochs = int(params_cfg["epochs"])
    seed = int(params_cfg.get("seed", 0))
    lr = float(abs(params_cfg.get("lr", 0.01)))
    l1 = float(params_cfg.get("l1_lambda", 1e-4))
    wd = float(params_cfg.get("weight_decay", 1e-2))
    chunk = min(chunk, n_masks)
    while n_masks % chunk:
        chunk -= 1

    qn = len(queries)

    all_names_arr = (
        np.array(names, dtype=str)
        if names is not None
        else np.arange(graph.n_pad).astype(str)
    )
    mask_stacks = None  # [T][Q] host masks in community mode
    sub_pw_per_q = None
    if pathways is not None:
        from .pathways import Pathways

        bucket_n = xs.shape[1]
        mask_stacks = [[None] * qn for _ in range(times)]
        sub_pw_per_q = []
        m_max = 0
        for qi in range(qn):
            nv = int(nvalid[qi])
            sub_names = all_names_arr[parent_nodes[qi]].tolist()
            pclass = Pathways(pathways, pathway_names)
            sub_pw, sub_pw_names, _ = pclass.comp_graph(sub_names)
            sub_inds = Pathways(sub_pw, sub_pw_names).names2inds(sub_names)
            sub_pw_per_q.append((sub_inds, sub_pw_names))
            sampler = MaskSampler(nv, bucket_n, params_cfg, sub_inds)
            for t in range(times):
                key = repeat_key(seed, t)
                mq, _tags, _bs = sampler.sample(jax.random.fold_in(key, qi))
                mask_stacks[t][qi] = np.asarray(mq)
                m_max = max(m_max, mq.shape[0])
        # common row budget, divisible by epochs; all-False padding rows have
        # kernel weight zero (k=0 coalitions) so they are inert
        m_max = -(-m_max // epochs) * epochs
        n_masks = m_max
        for t in range(times):
            for qi in range(qn):
                mq = mask_stacks[t][qi]
                if mq.shape[0] < m_max:
                    pad = np.zeros((m_max - mq.shape[0], bucket_n), bool)
                    mask_stacks[t][qi] = np.concatenate([mq, pad])
        while n_masks % chunk:
            chunk -= 1

    q_run = qn
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        size = int(mesh.shape[axis])
        q_run = -(-qn // size) * size
        if q_run != qn:
            xs = np.concatenate([xs, np.repeat(xs[-1:], q_run - qn, 0)])
            adjs = np.concatenate([adjs, np.repeat(adjs[-1:], q_run - qn, 0)])
            qidx = np.concatenate([qidx, np.repeat(qidx[-1:], q_run - qn)])
            nvalid = np.concatenate([nvalid, np.repeat(nvalid[-1:], q_run - qn)])

        def put(a):
            spec = P(axis, *([None] * (a.ndim - 1)))
            return jax.device_put(a, NamedSharding(mesh, spec))

        xs_d, adjs_d, qidx_d, nvalid_d = put(xs), put(adjs), put(qidx), put(nvalid)
    else:
        xs_d, adjs_d = jnp.asarray(xs), jnp.asarray(adjs)
        qidx_d, nvalid_d = jnp.asarray(qidx), jnp.asarray(nvalid)

    if mask_stacks is None:
        run_q = jax.vmap(
            lambda x, a, q, nv, key: _explain_one_query(
                model_def, model.params, x, a, q, nv, key,
                n_masks=n_masks, epochs=epochs, lr=lr, l1=l1, wd=wd, chunk=chunk,
            )
        )
    else:
        run_q = jax.vmap(
            lambda x, a, q, nv, key, m: _explain_one_query(
                model_def, model.params, x, a, q, nv, key,
                n_masks=n_masks, epochs=epochs, lr=lr, l1=l1, wd=wd, chunk=chunk,
                masks=m,
            )
        )

    weights_reps = []
    for t in range(times):
        key = repeat_key(seed, t)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(q_run))
        if mesh is not None:
            keys = jax.device_put(
                keys,
                NamedSharding(mesh, P(mesh.axis_names[0], None)),
            )
        if mask_stacks is None:
            w = run_q(xs_d, adjs_d, qidx_d, nvalid_d, keys)
        else:
            mstack = np.stack(mask_stacks[t])  # [Q, M, N]
            if q_run != qn:
                mstack = np.concatenate(
                    [mstack, np.repeat(mstack[-1:], q_run - qn, 0)]
                )
            if mesh is not None:
                mstack = jax.device_put(
                    mstack,
                    NamedSharding(
                        mesh, P(mesh.axis_names[0], None, None)
                    ),
                )
            w = run_q(xs_d, adjs_d, qidx_d, nvalid_d, keys, jnp.asarray(mstack))
        weights_reps.append(np.asarray(w)[:qn])
    stack = np.stack(weights_reps)  # [T, Q, N_pad]
    mean = stack.mean(0)
    std = stack.std(0)

    dfs = []
    for qi in range(len(queries)):
        nv = int(nvalid[qi])
        sub_names = all_names_arr[parent_nodes[qi]]
        order = np.argsort(-mean[qi, :nv], kind="stable")
        df = pd.DataFrame(
            {
                "config_value_mean": mean[qi, :nv][order],
                "config_value_std": std[qi, :nv][order],
            },
            index=pd.Index(np.asarray(sub_names)[order], name="name"),
        )
        if sub_pw_per_q is not None:
            from .pathways import Pathways

            sub_inds, sub_pw_names = sub_pw_per_q[qi]
            pw_df = Pathways(sub_inds, sub_pw_names).aggregate(
                mean[qi, :nv], sub_inds
            )
            dfs.append((df, pw_df))
        else:
            dfs.append(df)
    return dfs

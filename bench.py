"""Headline benchmark: perturbation forwards/sec (the explainer hot loop).

Primary workload — the shape every explanation actually runs (SURVEY §6):
B = 1000 masked GCN forwards (reference default budget,
``interpret_samples x epochs = 20 x 50``, ``/root/reference/config/
configs.json``) on a 2-hop computational subgraph (2048 nodes / 16384 edges,
hidden 128 x 2 layers), query-node output per perturbation.  Uses the fused
ELL fast path (:mod:`bikg_graph_explainability_public_tpu.models.fast_gcn`).

The JSON line carries the complete honest surface:

* ``value`` — plan-restricted forwards/s (receptive-field query plans, the
  production path for node queries).  This conflates an algorithmic win
  (restricting work to the query's hop ball) with kernel speed, so:
* ``unrestricted_forwards_per_sec`` — the same workload with query plans
  disabled (every forward touches the whole padded subgraph); the honest
  kernel-speed comparison against the reference's mega-graph.
* ``fullgraph_*`` — graph-problem masked forwards at BASELINE.json config-3
  scale (100k nodes / 1M edges, B=64): pooled outputs force every edge to be
  aggregated per perturbation, so edges/s/chip cannot be inflated by
  receptive-field restriction.
* ``spmm_gbps`` / ``spmm_sol_fraction`` — achieved bytes/s of the batched
  sparse aggregation (the torch-scatter role) at the 100k/1M workload vs the
  chip's HBM roofline (SpMM is bandwidth-bound: ~1 row read per edge, 1 row
  write per node; BASELINE.md "per-chip SpMM efficiency >= 90% SoL").
* ``explanations_per_sec`` / ``community_explanations_per_sec`` /
  ``hetero_explanations_per_sec`` — end-to-end multi-query explanation
  throughput (Shapley, Configuration-Value, and hetero-model modes).
* ``scaling_efficiency_8dev`` — weak-scaling efficiency of query-sharded
  ``explain_many`` on a virtual 8-device CPU mesh (1 vs 8 devices,
  per-device throughput ratio; real multi-chip needs hardware this
  environment does not have — BASELINE.md "needs real multi-chip").

vs_baseline: the same primary workload executed the reference's way — a
torch-CPU block-diagonal "mega-graph" GCN forward
(``/root/reference/src/pathway_explanations/data.py:556-648``), measured at
B=20 (one reference DataLoader batch) and extrapolated linearly.  The
reference publishes no numbers of its own (SURVEY §6).  Cached in
``.bench_baseline.json``.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# primary: subgraph-scale hot loop
SUB_N, SUB_E, B_SUB = 2048, 16384, 1000
# secondary: full-graph stress
# BIG_CHUNK=48: 24 KB aggregation rows — the v7 SpMM kernel's DMA issue
# cost amortises with row width (round-5 chunk sweep on the fullgraph
# workload: 357 f/s at 32, 518 at 48, 416 at 64; spmm_sol_fraction 0.527 /
# 0.605 / 0.641 at B=32/48/64 — 48 is the engine optimum)
BIG_N, BIG_E, B_BIG, BIG_CHUNK = 100_000, 1_000_000, 96, 48
N_FEATS, HIDDEN = 84, 128
BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")

#: HBM bandwidth roofline by device kind (GB/s).  Sources: public TPU
#: datasheets (v4: 1228, v5e: 819, v5p: 2765, v6e/Trillium: 1640).
HBM_GBPS = {
    "v5 lite": 819.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6": 1640.0,
    "trillium": 1640.0,
}


def hbm_roofline_gbps() -> float | None:
    import jax

    if jax.default_backend() != "tpu":
        return None
    kind = jax.devices()[0].device_kind.lower()
    for key, bw in HBM_GBPS.items():
        if key in kind:
            return bw
    return None


def make_graph(n, e, seed=0):
    rng = np.random.default_rng(seed)
    feat = rng.normal(size=(n, N_FEATS)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int64)
    return feat, ei


def torch_megagraph_fps(feat, ei, node_masks, b):
    """Reference-style torch-CPU mega-graph forward; forwards/sec."""
    import torch

    n = feat.shape[0]
    with torch.no_grad():
        x = torch.tensor(feat)
        w1 = torch.randn(HIDDEN, N_FEATS) * 0.05
        w2 = torch.randn(HIDDEN, HIDDEN) * 0.05
        src_t = torch.tensor(ei[0])
        dst_t = torch.tensor(ei[1])

        def forward(bb):
            srcs, dsts = [], []
            for i in range(bb):
                keep = torch.tensor(
                    (node_masks[i][ei[0]] > 0) & (node_masks[i][ei[1]] > 0)
                )
                srcs.append(src_t[keep] + i * n)
                dsts.append(dst_t[keep] + i * n)
            ms, md = torch.cat(srcs), torch.cat(dsts)

            def conv(h, w):
                hw = h @ w.T
                deg = torch.zeros(bb * n).scatter_add_(
                    0, md, torch.ones_like(ms, dtype=torch.float32)
                ) + 1.0
                dis = deg.rsqrt()
                msg = hw[ms] * (dis[ms] * dis[md]).unsqueeze(1)
                out = torch.zeros(bb * n, w.shape[0]).scatter_add_(
                    0, md.unsqueeze(1).expand_as(msg), msg
                )
                return out + hw * (dis * dis).unsqueeze(1)

            h = torch.relu(conv(x.repeat(bb, 1), w1))
            return torch.relu(conv(h, w2))

        forward(min(b, 2))  # warm up
        t0 = time.perf_counter()
        forward(b)
        return b / (time.perf_counter() - t0)


def get_baselines():
    if os.path.exists(BASELINE_CACHE):
        try:
            with open(BASELINE_CACHE) as f:
                d = json.load(f)
            if "sub_fps" in d and "big_fps" in d:
                return d
        except Exception:
            pass
    rng = np.random.default_rng(1)
    feat_s, ei_s = make_graph(SUB_N, SUB_E, seed=2)
    masks_s = (rng.random((20, SUB_N)) > 0.3).astype(np.float32)
    sub_fps = torch_megagraph_fps(feat_s, ei_s, masks_s, 20)
    feat_b, ei_b = make_graph(BIG_N, BIG_E, seed=0)
    masks_b = (rng.random((2, BIG_N)) > 0.3).astype(np.float32)
    big_fps = torch_megagraph_fps(feat_b, ei_b, masks_b, 2)
    d = {"sub_fps": sub_fps, "big_fps": big_fps}
    with open(BASELINE_CACHE, "w") as f:
        json.dump(d, f)
    return d


def _best_of(fn, reps=8):
    """Best wall time of ``reps`` calls.  The end-to-end eps benches time a
    handful of dispatches over the remote-TPU tunnel, whose RTT spikes by
    2x under transient congestion — a single timed call measured the tunnel's
    mood, not the framework (observed 109 vs 225 eps minutes apart; the
    round-4 "serving regression" was exactly this, see
    docs/serving_variance.md).  Each call is now ~40 ms (launch-plan cache),
    so 8 reps cost little and ride out both congestion spikes and the
    first-seconds tunnel warm-up drift observed after compile."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _marginal_time(make_step, masks, n1=3, n2=13):  # noqa: C901
    """Marginal seconds per step, slope-measured.

    The axon TPU tunnel adds ~26 ms fixed RPC overhead per dispatch, so a
    single timed call mostly measures the tunnel.  Instead the step runs n
    times inside ONE jit via lax.scan with a sequential data dependence
    (every output element consumed by the accumulating carry — nothing can
    be dead-code-eliminated or hoisted), the result is fetched by value, and
    the per-step cost is the slope between two n values (best of 3).
    """
    import jax
    import jax.numpy as jnp

    def scan_n(n):
        @jax.jit
        def run(masks):
            def body(carry, _):
                dep = (carry[:1] > 1e30)[None, :]  # always-False, data-dep
                out = make_step(jnp.logical_xor(masks, dep))
                return carry + out, ()

            out, _ = jax.lax.scan(
                body, jnp.zeros((masks.shape[0],), jnp.float32), None, length=n
            )
            return out

        return run

    def best_of(n, reps=3):
        f = scan_n(n)
        np.asarray(f(masks))  # warm up (compile) + value fetch
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(masks))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(n1)
    span = n2 - n1
    while True:
        t2 = best_of(n1 + span)
        delta = t2 - t1
        # widen until the delta clears the tunnel's ~ms jitter
        if delta > 0.05 or span >= 8000 or t2 > 60.0:
            break
        span *= 5
    return max(delta / span, 1e-9)


#: MXU peak FLOP/s by device kind (dense bf16 matmul; public datasheets)
MXU_PEAK_FLOPS = {
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6": 918e12,
    "trillium": 918e12,
}


def mxu_peak_flops() -> float | None:
    import jax

    if jax.default_backend() != "tpu":
        return None
    kind = jax.devices()[0].device_kind.lower()
    for key, pk in MXU_PEAK_FLOPS.items():
        if key in kind:
            return pk
    return None


def _dense_flops_per_forward(engine, query, restrict):
    """Matmul FLOPs of ONE masked forward in the engine's actual
    formulation (einsum contraction terms only; elementwise ignored)."""
    if restrict:
        plan = engine.query_plan(query)
        if plan is None:
            return None
        fl = 2 * plan.a_deg.size  # deg einsum kn,bn->bk
        prev_rows = plan.a_deg.shape[0]
        for i, (conv, a_i) in enumerate(
            zip(engine.model_def.convs, plan.a_layers)
        ):
            c = conv.out_features
            if i > 0:
                fl += 2 * prev_rows * conv.in_features * c  # hw matmul
            fl += 2 * a_i.size * c  # agg einsum over the layer slice
            prev_rows = a_i.shape[0]
        return fl
    n = engine.graph.n_pad
    fl = 2 * n * n  # deg einsum vu,bu->bv
    for i, conv in enumerate(engine.model_def.convs):
        c = conv.out_features
        if i > 0:
            fl += 2 * n * conv.in_features * c
        fl += 2 * n * n * c  # dense aggregation
    return fl


def bench_masked_forwards(
    feat, ei, b_total, chunk, seed=3, problem="node_prediction", restrict=True
):
    import jax
    import jax.numpy as jnp

    import bikg_graph_explainability_public_tpu as px
    from bikg_graph_explainability_public_tpu.models.fast_gcn import FastBatchedGCN

    g = px.from_arrays(feat, ei, pad_mode="exact")
    mdef = px.GCNNodeModel(
        N_FEATS, conv_channels=(HIDDEN, HIDDEN), fc_channels=(HIDDEN, 64)
    )
    params = mdef.init(jax.random.PRNGKey(0))
    engine = FastBatchedGCN(mdef, params, g, restrict=restrict)
    rng = np.random.default_rng(seed)
    masks = jnp.asarray((rng.random((b_total, g.n_pad)) > 0.3))
    query = None if "graph" in problem else 17

    dt = _marginal_time(
        lambda m: engine.query_outputs(m, query, problem, chunk_size=chunk), masks
    )
    fps = b_total / dt
    mfu = None
    if "graph" not in problem and engine.mode == "dense":
        peak = mxu_peak_flops()
        fl = _dense_flops_per_forward(engine, query, restrict)
        if peak and fl:
            mfu = fps * fl / peak
    return fps, mfu


def bench_spmm_sol(
    n=BIG_N, e=BIG_E, b=BIG_CHUNK, f=128, seed=0,
    measure_sep=True, measure_weighted=True,
):
    """Achieved bytes/s of the batched sparse aggregation vs HBM roofline.

    Minimum-traffic model for out[v] = sum_e w[e,:] * feats[snd_e]:
    every edge reads one (b*f) f32 feature row, every node writes one, and
    the per-edge weights are read once — (e + n) * b*f*4 + e*b*4 bytes.
    Gather locality can only *reduce* real traffic below this bound via
    cache reuse, so sol_fraction is conservative.
    """
    import jax.numpy as jnp

    import bikg_graph_explainability_public_tpu as px
    from bikg_graph_explainability_public_tpu.graph import host_view
    from bikg_graph_explainability_public_tpu.ops.ell import build_neighbor_table
    from bikg_graph_explainability_public_tpu.ops import spmm

    rng = np.random.default_rng(seed)
    feat = rng.standard_normal((n, 8), dtype=np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int64)
    g = px.from_arrays(feat, ei, pad_mode="exact")
    table = build_neighbor_table(g)

    hv = host_view(g)
    from bikg_graph_explainability_public_tpu.runtime import native

    _rp, col_s, eid = native.build_csr(
        g.n_pad, hv.senders[: g.num_edges], hv.receivers[: g.num_edges]
    )
    snd_s = jnp.asarray(col_s)
    rcv_s = jnp.asarray(hv.receivers[: g.num_edges][eid])

    feats = jnp.asarray(rng.standard_normal((g.n_pad, b * f), dtype=np.float32))
    w_eb = jnp.asarray(rng.random((g.e_pad, b), dtype=np.float32))
    w_sorted = w_eb[jnp.asarray(eid)]

    use_pallas = spmm._use_pallas(None, table, b * f)
    kw = dict(table=table) if use_pallas else dict(backend="xla")
    a_bn = jnp.asarray(rng.random((b, g.n_pad), dtype=np.float32))

    # the production node-problem aggregation: rank-1 separable weights
    def op(a, feats):
        return spmm.gather_sum_batched_separable(
            a, feats, snd_s, rcv_s, g.n_pad, b, **kw
        )

    # the weighted primitive as the edge-problem engines run it: weights
    # arrive as the coeff tensor [B, N, K] (built from masks via the
    # table, ops/ell.py::gcn_coeffs_from_edge_mask) and are transposed
    # into slot layout in-op (~2 ms) — the [E, B]-indexed wrapper instead
    # pays an XLA slot re-index gather measured at 20 ms (B=16) to 189 ms
    # (B=48) here, which no production path uses anymore
    valid_np = np.asarray(table.valid)
    w_bnk = jnp.asarray(
        rng.random((b, g.n_pad, table.k), dtype=np.float32)
        * valid_np[None, :, :]
    )

    def op_weighted(w, feats):
        if use_pallas:
            kk = table.k
            w_slot = jnp.transpose(
                w.reshape(b, g.n_pad * kk)
            ).reshape(g.n_pad, kk, b)
            return spmm.weighted_gather_sum_batched(
                None, feats, snd_s, rcv_s, g.n_pad, b, w_slot=w_slot, **kw
            )
        return spmm.weighted_gather_sum_batched(
            w, feats, snd_s, rcv_s, g.n_pad, b, **kw
        )

    # big operands must be jit ARGUMENTS (closure constants ship with the
    # HLO and overflow the remote compiler); slope-time a scan with a
    # sequential data dependence through the weights
    import jax

    def slope(fn, w0):
        def scan_n(nn):
            @jax.jit
            def run(w, feats):
                def body(carry, _):
                    dep = (carry[0, 0] > 1e30).astype(jnp.float32)
                    out = fn(w + dep, feats)
                    return out[:1] * 1e-30 + carry, ()

                c0 = jnp.zeros((1, feats.shape[-1]), jnp.float32)
                out, _ = jax.lax.scan(body, c0, None, length=nn)
                return out

            return run

        def best_of(nn, reps=3):
            fjit = scan_n(nn)
            np.asarray(fjit(w0, feats))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(fjit(w0, feats))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = best_of(2), best_of(8)
        return max((t2 - t1) / 6, 1e-9)

    bytes_moved = (e + n) * b * f * 4
    roof = hbm_roofline_gbps()
    out = {
        "spmm_backend": "pallas" if use_pallas else "xla",
        "hbm_roofline_gbps": roof,
    }
    if measure_sep:
        dt = slope(op, a_bn)
        gbps = bytes_moved / dt / 1e9
        out["spmm_gbps"] = round(gbps, 1)
        out["spmm_sol_fraction"] = (
            round(gbps / roof, 3) if roof else None
        )
    if measure_weighted:
        dt_w = slope(op_weighted, w_bnk if use_pallas else w_sorted)
        out["spmm_weighted_gbps"] = round(
            (bytes_moved + e * b * 4) / dt_w / 1e9, 1
        )
        out["spmm_weighted_b"] = b
    return out


def _explain_graph(n, e, seed):
    import jax

    import bikg_graph_explainability_public_tpu as px

    rng = np.random.default_rng(seed)
    feat = rng.normal(size=(n, N_FEATS)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int64)
    g = px.from_arrays(feat, ei, pad_mode="exact")
    mdef = px.GCNNodeModel(N_FEATS, conv_channels=(HIDDEN,), fc_channels=(HIDDEN, 64))
    params = mdef.init(jax.random.PRNGKey(0))
    return g, px.Model(mdef, params), rng


CFG_FULL = {"seed": 1, "interpret_samples": 20, "epochs": 50, "lr": 0.01,
            "l1_lambda": 1e-4}


def bench_explanations_per_sec(n=20_000, e=160_000, q=16, seed=5):
    """End-to-end Shapley-mode explanations/sec: Q full node explanations
    (subgraph extraction + 1000 masked forwards + surrogate training each)
    via the vmapped multi-query path."""
    import bikg_graph_explainability_public_tpu as px

    g, model, rng = _explain_graph(n, e, seed)
    queries = list(rng.integers(0, n, q))
    px.explain_many(model, g, queries, CFG_FULL)  # warm up / compile
    return q / _best_of(lambda: px.explain_many(model, g, queries, CFG_FULL))


def bench_community_explanations_per_sec(n=20_000, e=160_000, q=16, k=32, seed=7):
    """Configuration-Value mode: same workload with k communities."""
    import bikg_graph_explainability_public_tpu as px

    g, model, rng = _explain_graph(n, e, seed)
    names = [str(i) for i in range(n)]
    perm = rng.permutation(n)
    pathways = [[names[j] for j in perm[i::k]] for i in range(k)]
    pw_names = [f"pw{i}" for i in range(k)]
    queries = list(rng.integers(0, n, q))
    kw = dict(names=names, pathways=pathways, pathway_names=pw_names)
    px.explain_many(model, g, queries, CFG_FULL, **kw)  # warm up
    return q / _best_of(
        lambda: px.explain_many(model, g, queries, CFG_FULL, **kw)
    )


def bench_hetero_explanations_per_sec(n_per_type=4000, e_per_rel=24_000,
                                      q=16, seed=9):
    """Hetero-model explanations/sec (2 node types, 3 relations — the
    reference's hetero checkpoint shape at production scale).  Q matches
    the homo benches: per-call fixed costs (remote-tunnel RTTs) amortise
    over the same query count, so the three eps figures are comparable."""
    import jax

    import bikg_graph_explainability_public_tpu as px
    from bikg_graph_explainability_public_tpu.graph import hetero_to_homo

    rng = np.random.default_rng(seed)
    f = 32
    feat = {
        "a": rng.normal(size=(n_per_type, f)).astype(np.float32),
        "b": rng.normal(size=(n_per_type, f)).astype(np.float32),
    }
    relations = [("a", "r1", "b"), ("b", "r2", "a"), ("a", "r3", "a")]
    ei = {
        r: np.stack([
            rng.integers(0, n_per_type, e_per_rel),
            rng.integers(0, n_per_type, e_per_rel),
        ]) for r in relations
    }
    g, _info = hetero_to_homo(feat, ei)
    mdef = px.hetero_gcn_for_relations(
        ["a", "b"], relations, in_features=f,
        conv_channels=(HIDDEN,), fc_channels=(HIDDEN, 64),
    )
    params = mdef.init(jax.random.PRNGKey(seed))
    model = px.Model(mdef, params)
    queries = list(rng.integers(0, n_per_type, q))
    px.explain_many(model, g, queries, CFG_FULL)  # warm up
    return q / _best_of(lambda: px.explain_many(model, g, queries, CFG_FULL))


def bench_hetero_fullgraph_forwards(
    n_per_type=BIG_N // 2, e_per_rel=BIG_E // 3, b=B_BIG, seed=11,
    problem="graph_prediction",
):
    """Big-hetero unrestricted forwards/s: the ELL-tier workload.

    2 node types x 3 relations at the homo fullgraph scale (~1e5 nodes /
    ~1e6 edges, the reference's stated KG target scale, README.md:50) —
    graph-problem masked forwards through
    ``FastBatchedHeteroGCN.batch_node_outputs_ell``.  Comparable to
    ``fullgraph_forwards_per_sec`` (same node/edge totals, B, chunk); the
    reference's hetero path would run a Python loop per perturbation here
    (``model.py:196-249``).  ``problem="edge_prediction"`` measures the
    same workload with per-edge masks through the tier's v7w weighted
    path (round-5: the last config that fell back to the generic COO
    vmap)."""
    import jax
    import jax.numpy as jnp

    import bikg_graph_explainability_public_tpu as px
    from bikg_graph_explainability_public_tpu.graph import hetero_to_homo
    from bikg_graph_explainability_public_tpu.models.fast_hetero import (
        FastBatchedHeteroGCN,
    )

    rng = np.random.default_rng(seed)
    f = 32
    feat = {
        "a": rng.normal(size=(n_per_type, f)).astype(np.float32),
        "b": rng.normal(size=(n_per_type, f)).astype(np.float32),
    }
    relations = [("a", "r1", "b"), ("b", "r2", "a"), ("a", "r3", "a")]
    ei = {
        r: np.stack([
            rng.integers(0, n_per_type, e_per_rel),
            rng.integers(0, n_per_type, e_per_rel),
        ]) for r in relations
    }
    g, _info = hetero_to_homo(feat, ei)
    mdef = px.hetero_gcn_for_relations(
        ["a", "b"], relations, in_features=f,
        conv_channels=(HIDDEN, HIDDEN), fc_channels=(HIDDEN, 64),
    )
    params = mdef.init(jax.random.PRNGKey(seed))
    is_edge = "edge" in problem
    # restrict=False for the edge workload: a concrete edge query would be
    # served by the (much faster) receptive-field plan — the figure here
    # measures the UNRESTRICTED ELL weighted path, like the node figure's
    # pooled graph problem measures the unrestricted separable path
    engine = FastBatchedHeteroGCN(mdef, params, g, restrict=not is_edge)
    assert g.n_pad > engine.DENSE_CAP  # must exercise the ELL tier
    # the ELL tier is internally jitted (operands as arguments — closures
    # would inline ~400 MB of HLO literals), so time EAGERLY: marginal
    # between two batch sizes cancels the per-call dispatch + tunnel RTT
    width = g.e_pad if is_edge else g.n_pad
    query = 17 if is_edge else None  # receiver-node row (edge problems)
    masks = jnp.asarray(rng.random((b, width)) > 0.3)
    half = masks[: b // 2]

    def timed(m):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(engine.query_outputs(m, query, problem))
            best = min(best, time.perf_counter() - t0)
        return best

    np.asarray(engine.query_outputs(half, query, problem))
    np.asarray(engine.query_outputs(masks, query, problem))
    dt = max(timed(masks) - timed(half), 1e-9)
    return (b - b // 2) / dt


# ---------------------------------------------------------------------------
# weak scaling on a virtual CPU mesh (subprocess: needs its own JAX platform)
# ---------------------------------------------------------------------------


def _scaling_child():
    """Run inside JAX_PLATFORMS=cpu with 8 virtual devices: weak-scaling
    explain_many (queries proportional to devices), print one JSON line."""
    # XLA_FLAGS from the spawning env is not honoured under the container's
    # sitecustomize; it must be (re)set in-process BEFORE the first backend
    # init, followed by a config update (same dance as tests/conftest.py)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= 8, "could not force 8 virtual devices"

    import bikg_graph_explainability_public_tpu as px
    from bikg_graph_explainability_public_tpu.parallel.mesh import make_mesh

    n, e, q_per_dev = 2000, 12000, 16
    rng = np.random.default_rng(11)
    feat = rng.normal(size=(n, 16)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int64)
    g = px.from_arrays(feat, ei, pad_mode="exact")
    mdef = px.GCNNodeModel(16, conv_channels=(32,), fc_channels=(32, 16))
    params = mdef.init(jax.random.PRNGKey(0))
    model = px.Model(mdef, params)
    cfg = {"seed": 1, "interpret_samples": 10, "epochs": 10, "lr": 0.01,
           "l1_lambda": 1e-4}

    def eps(mesh, queries, reps=3):
        px.explain_many(model, g, queries, cfg, mesh=mesh)  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            px.explain_many(model, g, queries, cfg, mesh=mesh)
            best = min(best, time.perf_counter() - t0)
        return len(queries) / best

    out = {}
    for nd in (1, 2, 4, 8):
        queries = list(rng.integers(0, n, q_per_dev * nd))
        out[str(nd)] = eps(make_mesh(nd), queries)
    # fixed total work, growing mesh: partitioning overhead isolated from
    # host-core limits (the CI host has ~2 cores; 8 virtual devices cannot
    # physically speed anything up, but sharding must not slow it down).
    # The two configs are measured INTERLEAVED, best-of-5 each: on a 2-core
    # host, back-to-back best-of-3 blocks sampled under different ambient
    # load swung this ratio 0.76..1.31 across rounds (attributed in
    # benchmarks/exp_fixedwork_sharding.py — the sharded program itself has
    # no measurable partitioning cost; device_put splitting is ~0.05 ms).
    fixed_q = list(rng.integers(0, n, 8 * q_per_dev))
    m1, m8 = make_mesh(1), make_mesh(8)
    px.explain_many(model, g, fixed_q, cfg, mesh=m1)  # compile
    px.explain_many(model, g, fixed_q, cfg, mesh=m8)  # compile
    best = {1: float("inf"), 8: float("inf")}
    for _ in range(5):
        for nd, mesh in ((1, m1), (8, m8)):
            t0 = time.perf_counter()
            px.explain_many(model, g, fixed_q, cfg, mesh=mesh)
            best[nd] = min(best[nd], time.perf_counter() - t0)
    # ratio of 8-shard to 1-shard fixed-work throughput: 1.0 = sharding
    # costs nothing; <1 = partitioning overhead; >1 = the 8 device threads
    # exploit the second host core
    out["sharding_overhead"] = best[1] / best[8]
    print(json.dumps(out))


def bench_weak_scaling():
    """Weak-scaling efficiency 1 -> 8 virtual CPU devices (per-device
    throughput ratio; 1.0 = perfect).  Returns None if the child fails."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child"],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        data = json.loads(proc.stdout.strip().splitlines()[-1])
        overhead = data.pop("sharding_overhead", None)
        eff = (data["8"] / 8.0) / data["1"]
        return {
            "scaling_eps_per_ndev": {k: round(v, 3) for k, v in data.items()},
            "scaling_efficiency_8dev": round(eff, 3),
            # fixed work, 8-shard vs 1-shard throughput ratio (interleaved
            # best-of-5): 1.0 = partitioning costs nothing, <1 = sharding
            # overhead, >1 = the 8 device threads use the second host core
            "sharding_overhead_8dev": round(overhead, 3) if overhead else None,
            "scaling_note": (
                "virtual 8-device CPU mesh on a ~2-core host: weak scaling "
                "is host-core-bound; sharding_overhead_8dev is the fixed-"
                "work partitioning check (8-shard/1-shard eps, interleaved "
                "sampling; >=1 means sharding costs nothing) — real "
                "scaling efficiency needs multi-chip hardware"
            ),
        }
    except Exception as exc:  # noqa: BLE001 — bench must still print its line
        return {"scaling_efficiency_8dev": None,
                "scaling_error": f"{type(exc).__name__}: {exc}"[:200]}


def main():
    baselines = get_baselines()

    import jax

    sub_fps, mfu_restricted = bench_masked_forwards(
        *make_graph(SUB_N, SUB_E, seed=2), B_SUB, 250
    )
    sub_fps_unrestricted, mfu_unrestricted = bench_masked_forwards(
        *make_graph(SUB_N, SUB_E, seed=2), B_SUB, 250, restrict=False
    )
    # graph-problem (pooled) forwards genuinely aggregate over every edge per
    # perturbation — the honest edges/s workload (node queries are served by
    # receptive-field plans that skip work outside the query ball)
    big_fps, _ = bench_masked_forwards(
        *make_graph(BIG_N, BIG_E, seed=0), B_BIG, BIG_CHUNK,
        problem="graph_prediction",
    )
    het_big_fps = bench_hetero_fullgraph_forwards()
    het_edge_fps = bench_hetero_fullgraph_forwards(
        problem="edge_prediction", seed=12
    )
    spmm = bench_spmm_sol(measure_weighted=False)
    # the weighted (edge-problem) primitive prefers narrower rows: its
    # per-call [N, K, B] slot re-index scales with B (measured 133.8 GB/s
    # at b=16 vs 82.3 at b=32), so it is measured at ITS production width
    spmm.update(bench_spmm_sol(b=16, measure_sep=False))
    eps = bench_explanations_per_sec()
    eps_comm = bench_community_explanations_per_sec()
    eps_het = bench_hetero_explanations_per_sec()
    scaling = bench_weak_scaling()

    record = {
        "metric": "perturb_forwards_per_sec",
        "value": round(sub_fps, 2),
        "unit": "forwards/s",
        "vs_baseline": round(sub_fps / baselines["sub_fps"], 2),
        "workload": f"GCN-{HIDDEN}x2 subgraph {SUB_N}n/{SUB_E}e B={B_SUB}",
        "unrestricted_forwards_per_sec": round(sub_fps_unrestricted, 2),
        "unrestricted_vs_baseline": round(
            sub_fps_unrestricted / baselines["sub_fps"], 2
        ),
        "fullgraph_workload": f"graph-problem {BIG_N}n/{BIG_E}e B={B_BIG}",
        "fullgraph_forwards_per_sec": round(big_fps, 2),
        "fullgraph_vs_baseline": round(big_fps / baselines["big_fps"], 2),
        "fullgraph_edges_per_sec_per_chip": round(big_fps * BIG_E, 0),
        "hetero_fullgraph_workload": (
            f"graph-problem 2x{BIG_N // 2}n/3x{BIG_E // 3}e 3rel B={B_BIG}"
        ),
        "hetero_fullgraph_forwards_per_sec": round(het_big_fps, 2),
        "hetero_vs_homo_fullgraph": round(het_big_fps / big_fps, 3),
        # edge-problem masks through the ELL tier's v7w weighted path —
        # the last configuration that fell back to the generic COO vmap
        # (VERDICT r4 missing 2); done-criterion: within 2x of the node
        # figure
        "hetero_edge_fullgraph_forwards_per_sec": round(het_edge_fps, 2),
        "hetero_edge_vs_node_fullgraph": round(
            het_edge_fps / het_big_fps, 3
        ),
        "explanations_per_sec": round(eps, 3),
        "community_explanations_per_sec": round(eps_comm, 3),
        "hetero_explanations_per_sec": round(eps_het, 3),
        "baseline": "torch-cpu mega-graph (reference style)",
        "backend": jax.default_backend(),
        # model FLOP utilisation of the dense MXU formulations (matmul
        # FLOPs of the engine's own einsum contraction structure / wall
        # time / dense-bf16 peak) — VERDICT r2 item 6
        "mfu_restricted": (
            round(mfu_restricted, 4) if mfu_restricted else None
        ),
        # the restricted path is BANDWIDTH-bound: at this workload's
        # arithmetic intensity (43 fl/B) the achievable MFU caps at 0.179
        # and the path runs at 98-99% of the HBM roofline — measured
        # decomposition in benchmarks/exp_mfu_restricted.py, published in
        # docs/architecture.md ("Why mfu_restricted ~= 0.17 is the
        # roofline")
        "mfu_restricted_roofline": 0.179,
        "mfu_unrestricted": (
            round(mfu_unrestricted, 4) if mfu_unrestricted else None
        ),
        "mxu_peak_tflops": (
            round(mxu_peak_flops() / 1e12, 0) if mxu_peak_flops() else None
        ),
    }
    record.update(spmm)
    record.update(scaling)
    print(json.dumps(record))


if __name__ == "__main__":
    if "--scaling-child" in sys.argv:
        _scaling_child()
    else:
        main()

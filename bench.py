"""Headline benchmark: perturbation forwards/sec on the flagship workload.

Workload (BASELINE.json config 3 scale): 2-layer GCN (hidden 128) on a
100k-node / 1M-edge homogeneous graph; B perturbation masked forwards — the
hot loop of every explanation (1000 such forwards per repeat at reference
defaults, ``/root/reference/config/configs.json``).

vs_baseline: same workload executed the reference's way — a torch-CPU
block-diagonal "mega-graph" forward (``/root/reference/src/
pathway_explanations/data.py:556-648``), extrapolated linearly in B (the
reference has no published numbers; SURVEY §6).  The torch baseline is
measured once and cached in ``.bench_baseline.json``.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

N_NODES = 100_000
N_EDGES = 1_000_000
N_FEATS = 84
HIDDEN = 128
B_TOTAL = 64  # perturbation forwards timed on device
CHUNK = 8
BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")


def make_workload(seed=0):
    rng = np.random.default_rng(seed)
    feat = rng.normal(size=(N_NODES, N_FEATS)).astype(np.float32)
    ei = np.stack(
        [rng.integers(0, N_NODES, N_EDGES), rng.integers(0, N_NODES, N_EDGES)]
    ).astype(np.int64)
    node_masks = (rng.random((B_TOTAL, N_NODES)) > 0.3).astype(np.float32)
    return feat, ei, node_masks


def torch_megagraph_baseline(feat, ei, node_masks, b=2):
    """Reference-style baseline: tile features b times, shift edge indices,
    drop masked edges, one big scatter-add GCN forward on CPU (torch).
    Returns forwards/sec (linear in b — each perturbation is an independent
    block)."""
    import torch

    with torch.no_grad():
        x = torch.tensor(feat)
        w1 = torch.randn(HIDDEN, N_FEATS) * 0.05
        w2 = torch.randn(HIDDEN, HIDDEN) * 0.05
        src = torch.tensor(ei[0])
        dst = torch.tensor(ei[1])

        def forward(bb):
            # build mega-graph edge list (reference data.py:424-425, 540-541)
            srcs, dsts = [], []
            for i in range(bb):
                keep = torch.tensor(
                    (node_masks[i][ei[0]] > 0) & (node_masks[i][ei[1]] > 0)
                )
                srcs.append(src[keep] + i * N_NODES)
                dsts.append(dst[keep] + i * N_NODES)
            ms, md = torch.cat(srcs), torch.cat(dsts)
            xx = x.repeat(bb, 1)

            def conv(h, w):
                hw = h @ w.T
                deg = torch.zeros(bb * N_NODES).scatter_add_(
                    0, md, torch.ones_like(ms, dtype=torch.float32)
                ) + 1.0
                dis = deg.rsqrt()
                msg = hw[ms] * (dis[ms] * dis[md]).unsqueeze(1)
                out = torch.zeros(bb * N_NODES, w.shape[0]).scatter_add_(
                    0, md.unsqueeze(1).expand_as(msg), msg
                )
                return out + hw * (dis * dis).unsqueeze(1)

            h = torch.relu(conv(x.repeat(bb, 1), w1))
            h = torch.relu(conv(h, w2))
            return h

        forward(1)  # warm up
        t0 = time.perf_counter()
        forward(b)
        dt = time.perf_counter() - t0
    return b / dt


def get_torch_baseline(feat, ei, node_masks):
    if os.path.exists(BASELINE_CACHE):
        try:
            with open(BASELINE_CACHE) as f:
                return json.load(f)["torch_cpu_forwards_per_sec"]
        except Exception:
            pass
    fps = torch_megagraph_baseline(feat, ei, node_masks)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"torch_cpu_forwards_per_sec": fps}, f)
    return fps


def main():
    feat, ei, node_masks = make_workload()
    baseline_fps = get_torch_baseline(feat, ei, node_masks)

    import jax
    import jax.numpy as jnp

    import bikg_graph_explainability_public_tpu as px

    g = px.from_arrays(feat, ei, pad_mode="exact")
    mdef = px.GCNNodeModel(
        N_FEATS, conv_channels=(HIDDEN, HIDDEN), fc_channels=(HIDDEN, 64)
    )
    params = mdef.init(jax.random.PRNGKey(0))
    query = 17

    base_ew = g.edge_mask.astype(jnp.float32)
    snd, rcv = g.senders, g.receivers

    def one(m):
        ew = base_ew * m[snd] * m[rcv]
        return mdef.apply_query(params, g.x, snd, rcv, ew, query)

    @jax.jit
    def batch(masks):
        chunks = masks.reshape(B_TOTAL // CHUNK, CHUNK, N_NODES)
        return jax.lax.map(jax.vmap(one), chunks).reshape(B_TOTAL)

    masks = jnp.asarray(node_masks)
    out = jax.block_until_ready(batch(masks))  # compile + warm up

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = batch(masks)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    fps = B_TOTAL / dt
    edges_per_sec = fps * N_EDGES
    print(
        json.dumps(
            {
                "metric": "perturb_forwards_per_sec",
                "value": round(fps, 2),
                "unit": "forwards/s",
                "vs_baseline": round(fps / baseline_fps, 2),
                "edges_per_sec_per_chip": round(edges_per_sec, 0),
                "workload": f"GCN-{HIDDEN}x2 {N_NODES}n/{N_EDGES}e B={B_TOTAL}",
                "baseline": "torch-cpu mega-graph (reference style)",
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()

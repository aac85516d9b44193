"""Sparse aggregation backends (the torch-scatter/torch-sparse role,
``/root/reference/dev_setup.sh:6-8``).

Two entry points:

* :func:`weighted_gather_sum` — per-edge scalar weights, ``[N, F]`` features
  (the generic layer path: GCNConv / GATConv / SAGEConv / GINConv).
* :func:`weighted_gather_sum_batched` — per-edge per-sample weights over
  batch-contiguous ``[N, B*F]`` features (the batched explainer hot loop,
  ``models/fast_gcn.py`` layers >= 2).

Backends (process-global via :func:`set_backend`, or per-call; the
``ExplainerConfig.spmm_backend`` knob routes here through
``models/fast_gcn.FastBatchedGCN``):

* ``"xla"``    — gather + XLA scatter-add.  Always correct, any shape.
* ``"pallas"`` — the blocked-ELL DMA-gather kernel (:mod:`.spmm_pallas`).
  Requires a :class:`.ell.NeighborTable` and a row payload of >= 512 floats
  (the measured v5e crossover, ``MIN_PALLAS_WIDTH``); narrower calls fall
  back to XLA, where its gather is faster than per-row DMA issue.
* ``"auto"``   — ``pallas`` whenever its requirements hold on TPU, else
  ``xla``.  The default.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .spmm_pallas import MIN_PALLAS_WIDTH, batched_gather_sum, gather_sum_static

_BACKENDS = ("xla", "pallas", "auto")
_BACKEND = "auto"


def set_backend(name: str) -> None:
    """Select the process-global aggregation backend ('xla' | 'pallas' | 'auto')."""
    global _BACKEND
    if name not in _BACKENDS:
        raise ValueError(f"unknown spmm backend {name!r}; one of {_BACKENDS}")
    _BACKEND = name


def get_backend() -> str:
    """Current process-global aggregation backend name."""
    return _BACKEND


def _use_pallas(backend: Optional[str], table, width: int) -> bool:
    b = backend or _BACKEND
    if b == "xla" or table is None:
        return False
    if width % 128 or width < MIN_PALLAS_WIDTH:
        return False  # measured: XLA gather beats per-row DMA below this
    if b == "pallas":
        return True
    return jax.default_backend() == "tpu"


def weighted_gather_sum(
    edge_weight: jax.Array,
    feats: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    num_nodes: int,
    *,
    table=None,
    backend: Optional[str] = None,
) -> jax.Array:
    """out[v] = sum over edges e with receivers[e]==v of
    edge_weight[e] * feats[senders[e]].

    Masked/padded edges must carry weight 0 (they then contribute nothing,
    wherever their indices point).  Passing the graph's ``table``
    (:class:`.ell.NeighborTable`) enables the Pallas backend for wide rows.
    """
    if _use_pallas(backend, table, feats.shape[-1]):
        # NeighborTable drops self-loop data edges; add them back separately
        # (cheap [E] pass, exact for graphs with or without self-loops)
        out = batched_gather_sum(table, edge_weight[:, None], feats, b=1)
        self_w = jax.ops.segment_sum(
            jnp.where(senders == receivers, edge_weight, 0.0), receivers,
            num_segments=num_nodes,
        )
        return out + self_w[:, None] * feats
    msg = edge_weight[:, None] * feats[senders]
    return jax.ops.segment_sum(msg, receivers, num_segments=num_nodes)


def weighted_gather_sum_batched(
    edge_weight_eb: jax.Array,  # [E, B] per-edge per-sample weights
    feats_bc: jax.Array,        # [N, B*F] batch-contiguous features
    senders: jax.Array,         # [E] (receiver-sorted for the XLA path)
    receivers: jax.Array,       # [E]
    num_nodes: int,
    b: int,
    *,
    table=None,
    backend: Optional[str] = None,
    indices_are_sorted: bool = True,
    w_slot=None,                # [N, K, B] pre-built slot-layout weights
    plan=None,                  # caller-warmed CompactPlan (v7 weighted)
) -> jax.Array:                 # [N, B*F]
    """Batched aggregation: out[v] = sum_e w[e, :] * feats[snd_e] with the
    per-sample weight broadcast over each sample's F block.

    The hot op of big-graph batched forwards.  ``edge_weight_eb`` rows must
    be indexed like ``senders``/``receivers`` (for the pallas path the
    table's ``eid`` re-indexes into the same order).  Callers that already
    hold slot-layout weights (the engines' coeff tensors) pass ``w_slot``
    and skip that re-index (see ``spmm_pallas.batched_gather_sum``);
    ``edge_weight_eb`` may then be None when the pallas path is taken.
    """
    if _use_pallas(backend, table, feats_bc.shape[-1]):
        return batched_gather_sum(
            table, edge_weight_eb, feats_bc, b=b, w_slot=w_slot, plan=plan
        )
    f = feats_bc.shape[-1] // b
    msg = feats_bc[senders].reshape(-1, b, f) * edge_weight_eb[:, :, None]
    return jax.ops.segment_sum(
        msg.reshape(-1, b * f).astype(jnp.float32),  # f32 accumulation
        receivers, num_segments=num_nodes,
        indices_are_sorted=indices_are_sorted,
    )


def gather_sum_batched_separable(
    a_bn: jax.Array,            # [B, N_src] per-node per-sample factors
    feats_bc: jax.Array,        # [N_src, B*F] batch-contiguous features
    senders: jax.Array,         # [E] (receiver-sorted for the XLA path)
    receivers: jax.Array,       # [E]
    num_nodes: int,
    b: int,
    *,
    table=None,
    backend: Optional[str] = None,
    indices_are_sorted: bool = True,
    plan=None,
    static_w=None,
    post_a_bn: Optional[jax.Array] = None,  # [B, N_out] dest-side factors
    drop_self_loops: bool = True,
) -> jax.Array:                 # [N_out, B*F]
    """Batched aggregation with rank-1 separable weights.

    Type-scoped callers (hetero dst-block aggregation): feats/senders live
    in a SOURCE row space and the output/receivers in a (smaller)
    destination row space — pass the destination-side factors as
    ``post_a_bn`` ([B, num_nodes], defaults to ``a_bn``) and, since local
    source/receiver ids no longer encode self-loops, pre-filter them at
    table build and pass ``drop_self_loops=False``.

    ``out[v, s] = a[s,v] * sum over non-self-loop in-edges (snd -> v) of
    a[s,snd] * feats[snd, s]`` — the GCN node-mask case, where the per-edge
    weight ``mask[snd]*mask[rcv]*deg^-1/2[snd]*deg^-1/2[rcv]`` factors as
    ``a[snd]*a[rcv]`` with ``a = mask * deg^-1/2``.

    Scaling rows before and outputs after lets the aggregation itself run
    with STATIC weights: the Pallas path skips the per-call
    ``edge_weight[table.eid]`` slot re-index (a 3.2M-tiny-row gather, ~20 ms
    at the 100k/1M workload — ~35% of the weighted path) and the XLA path
    skips materialising the [E, B] weight matrix.

    ``plan`` / ``static_w``: optional precomputed CompactPlan and static
    slot weights — callers jitting big-graph programs pass them as traced
    ARGUMENTS so multi-MB plan tables don't inline as HLO literals (the
    remote compiler caps the request body).
    """
    f = feats_bc.shape[-1] // b
    a_t = jnp.transpose(a_bn).astype(feats_bc.dtype)  # [N_src, B]
    a_out = (
        a_t if post_a_bn is None
        else jnp.transpose(post_a_bn).astype(feats_bc.dtype)
    )  # [N_out, B]
    scaled = (
        feats_bc.reshape(-1, b, f) * a_t[:, :, None]
    ).reshape(-1, b * f)
    if _use_pallas(backend, table, feats_bc.shape[-1]):
        # the destination-side scale rides the kernel (one VMEM pass per
        # block) instead of a full [N, W] HBM read+write after it
        return gather_sum_static(
            table, scaled, b=b, plan=plan, static_w=static_w,
            post_scale=a_out.astype(jnp.float32),
        )
    if drop_self_loops:
        loop = (senders != receivers).astype(scaled.dtype)
        msg = scaled[senders] * loop[:, None]
    else:
        msg = scaled[senders]
    out = jax.ops.segment_sum(
        msg.astype(jnp.float32), receivers, num_segments=num_nodes,
        indices_are_sorted=indices_are_sorted,
    )
    return (out.reshape(-1, b, f) * a_out[:, :, None]).reshape(-1, b * f)

"""Segment / scatter primitives for neighbourhood aggregation.

These replace the torch-scatter / torch-sparse native kernels the reference
depends on (pinned at ``/root/reference/dev_setup.sh:6-8``).  On TPU the
default lowering is XLA ``scatter-add``; the Pallas CSR path in
:mod:`..ops.spmm` overrides the hot case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Sum ``data`` rows into ``num_segments`` buckets."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Per-segment mean (reference pathways.py:418 aggregation primitive)."""
    s = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    ones = jnp.ones(data.shape[:1], data.dtype)
    cnt = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    cnt = jnp.maximum(cnt, 1)
    if data.ndim > 1:
        cnt = cnt.reshape((-1,) + (1,) * (data.ndim - 1))
    return s / cnt


def segment_max(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Per-segment max."""
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_softmax(
    logits: jax.Array, segment_ids: jax.Array, num_segments: int
) -> jax.Array:
    """Numerically-stable softmax within segments (used by GAT attention).

    Equivalent of PyG's ``softmax(alpha, index)`` that the reference's hetero
    test model relies on via ``GATConv`` (``/root/reference/tests/test_utils.py:135``).
    """
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[segment_ids]
    ex = jnp.exp(shifted)
    denom = jax.ops.segment_sum(ex, segment_ids, num_segments=num_segments)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    return ex / denom[segment_ids]


def scatter_or(mask_updates: jax.Array, index: jax.Array, size: int) -> jax.Array:
    """Boolean scatter-OR: out[index[i]] |= mask_updates[i]."""
    out = jnp.zeros((size,), jnp.int32)
    out = out.at[index].max(mask_updates.astype(jnp.int32))
    return out.astype(bool)

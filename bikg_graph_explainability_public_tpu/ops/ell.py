"""ELL (padded neighbour-table) aggregation — the TPU-native SpMM layout.

Motivation (measured on v5e): XLA scatter-add over 1M edges x 128 feats costs
~16 ms sorted / ~24 ms unsorted, while an ELL formulation — gather the
transformed features once per *batch* of perturbations and contract
``[B,N,K] x [N,K,F] -> [B,N,F]`` on the MXU — costs ~4 ms per sample at B=8
and keeps falling with B.  The perturbation batch is exactly the workload
shape of this framework (SURVEY §2.3: the mega-graph batching is the
reference's only throughput mechanism; this is its TPU replacement).

Tables are built by the native C++ runtime (:mod:`..runtime.native`).
Self-loop data edges are excluded at build time because PyG ``gcn_norm``
replaces them with unit self-loops anyway (see :mod:`.norm`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime import native
from ..utils.padding import round_up
from ..graph import host_view


class NeighborTable(NamedTuple):
    """Static padded in-neighbour lists for a padded graph.

    nbr:   [N_pad, K] int32 — sender of each slot (0 when invalid)
    valid: [N_pad, K] float32 — 1 for real slots
    eid:   [N_pad, K] int32 — original edge id of each slot (for edge masks)
    k:     slot count (static)
    """

    nbr: jax.Array
    valid: jax.Array
    eid: jax.Array

    @property
    def k(self) -> int:
        """Padded neighbours per row (ELL width)."""
        return self.nbr.shape[1]


def build_neighbor_table(
    graph, *, k: Optional[int] = None, drop_self_loops: bool = True
) -> NeighborTable:
    """Build the table host-side from a :class:`..graph.Graph` (valid edges
    only).  ``k`` defaults to max in-degree rounded up to a multiple of 8."""
    hv = host_view(graph)
    snd = hv.senders[: graph.num_edges]
    rcv = hv.receivers[: graph.num_edges]
    eids = np.arange(graph.num_edges, dtype=np.int32)
    if drop_self_loops:
        keep = snd != rcv
        snd, rcv, eids = snd[keep], rcv[keep], eids[keep]
    return build_neighbor_table_edges(graph.n_pad, snd, rcv, eids, k=k)


def build_neighbor_table_edges(
    n: int,
    snd: np.ndarray,
    rcv: np.ndarray,
    eids: np.ndarray,
    *,
    k: Optional[int] = None,
    to_jax: bool = True,
) -> NeighborTable:
    """Build a table from explicit edge arrays (already filtered).

    The per-relation entry: hetero engines pass each relation's edge subset
    (``eids`` are ORIGINAL edge ids, so edge-problem masks index correctly);
    :func:`build_neighbor_table` passes a whole graph's valid edges.
    ``to_jax=False`` keeps the fields host numpy — REQUIRED when the caller
    caches the table across jit traces (a ``jnp.asarray`` issued inside a
    trace is a tracer; caching it leaks it out of the trace).
    """
    if k is None:
        k = max(native.max_degree(n, rcv), 1)
        k = round_up(k, 8)
    nbr, slot_eid, valid, dropped = native.build_ell(n, snd, rcv, k)
    if dropped:
        raise ValueError(
            f"neighbor table overflow: {dropped} edges dropped at K={k}; "
            "pass a larger k"
        )
    # map slot -> original edge id
    eid_full = np.zeros_like(slot_eid)
    eid_full[valid] = eids[slot_eid[valid]]
    # sort each row's valid slots by source id (invalid slots last): the
    # Pallas plan coalesces consecutive (source row, gather slot) pairs into
    # multi-row DMAs, and source-sorted slots make every consecutive
    # neighbour-id range one run (ops/spmm_pallas.build_compact_plan)
    key = np.where(valid, nbr.astype(np.int64), np.iinfo(np.int64).max)
    order = np.argsort(key, axis=1, kind="stable")
    rows = np.arange(n)[:, None]
    nbr = nbr[rows, order]
    eid_full = eid_full[rows, order]
    valid = valid[rows, order]
    conv = jnp.asarray if to_jax else np.asarray
    return NeighborTable(
        nbr=conv(nbr),
        valid=conv(valid.astype(np.float32)),
        eid=conv(eid_full),
    )


def gcn_coeffs_from_node_mask(
    table: NeighborTable, node_mask_row: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Per-slot GCN coefficients and self-loop weights for ONE perturbation.

    node_mask_row: [N] float (1 = node active).  Edge weight of slot (v,k) =
    m[v] * m[nbr] (the reference's node perturbation semantics,
    data.py:390-498); degree/normalisation as in :func:`..ops.norm`.
    Returns (coeff [N,K], self_w [N]).
    """
    m = node_mask_row
    w = table.valid * m[table.nbr] * m[:, None]  # [N, K]
    deg = 1.0 + w.sum(axis=1)  # [N]
    dis = jax.lax.rsqrt(deg)
    coeff = w * dis[:, None] * dis[table.nbr]
    self_w = dis * dis
    return coeff, self_w


def gcn_coeffs_from_edge_mask(
    table: NeighborTable, edge_mask_row: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Same, for edge-problem masks indexed by original edge id."""
    w = table.valid * edge_mask_row[table.eid]
    deg = 1.0 + w.sum(axis=1)
    dis = jax.lax.rsqrt(deg)
    coeff = w * dis[:, None] * dis[table.nbr]
    return coeff, dis * dis


def ell_aggregate_shared(coeff_b: jax.Array, gathered: jax.Array) -> jax.Array:
    """Batched aggregation with a batch-shared gathered table.

    coeff_b:  [B, N, K]  per-perturbation slot coefficients
    gathered: [N, K, F]  XW[nbr] — gathered ONCE for the whole batch
    returns   [B, N, F]

    The contraction is a per-node [B,K] x [K,F] matmul batched over N — MXU
    work instead of scatter-adds.
    """
    return jnp.einsum(
        "bnk,nkf->bnf", coeff_b, gathered, preferred_element_type=jnp.float32
    )


def ell_aggregate_per_sample(
    coeff_b: jax.Array, feats_b: jax.Array, table: NeighborTable
) -> jax.Array:
    """Batched aggregation when features differ per sample (layer >= 2).

    coeff_b: [B, N, K]; feats_b: [B, N, F] -> [B, N, F].
    """
    gathered = feats_b[:, table.nbr]  # [B, N, K, F]
    return jnp.einsum(
        "bnk,bnkf->bnf", coeff_b, gathered, preferred_element_type=jnp.float32
    )

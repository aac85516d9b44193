"""Static-shape k-hop computational-subgraph extraction.

TPU-native replacement for the reference's use of PyG ``k_hop_subgraph``
(``/root/reference/src/pathway_explanations/data.py:281-361``).  The frontier
expansion is a fixed number of scatter-OR sweeps over the (padded) edge list —
no data-dependent shapes, so it jits and shards.  Extraction into a padded
subgraph happens with a host-chosen capacity bucket.

Semantics match PyG ``k_hop_subgraph(ind, k, edge_index, relabel_nodes=True)``
with the default ``flow="source_to_target"``: a node is kept iff it can reach
the query along <=k directed edges (messages flow source->target); the edge
set is the subgraph induced on kept nodes; kept nodes are relabelled in
ascending original order.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import Graph, host_view, seed_host_view
from ..utils.padding import pad_budget


@partial(jax.jit, static_argnames=("n_hops", "num_nodes"))
def khop_reachable(
    senders: jax.Array,
    receivers: jax.Array,
    edge_valid: jax.Array,
    query: jax.Array,
    n_hops: int,
    num_nodes: int,
) -> jax.Array:
    """Boolean mask of nodes within ``n_hops`` (following edge direction
    towards the query), query included."""
    reach0 = jnp.zeros((num_nodes,), jnp.int32).at[query].set(1)

    def body(_, reach):
        # edges whose target is already reached contribute their source
        hot = reach[receivers] * edge_valid.astype(jnp.int32)
        return jnp.maximum(reach, jnp.zeros_like(reach).at[senders].max(hot))

    reach = jax.lax.fori_loop(0, n_hops, body, reach0)
    return reach.astype(bool)


class Subgraph(NamedTuple):
    """Padded k-hop subgraph plus its mapping back into the parent graph."""
    graph: Graph
    # position of each kept node in the parent graph, padded with parent n_pad
    # (host numpy — only read host-side, never shipped to the device)
    parent_nodes: np.ndarray
    # new index of the query node
    query: int
    # [E_parent] bool: which parent edges were kept (host numpy)
    parent_edge_mask: np.ndarray


def extract_khop_subgraph(
    graph: Graph,
    query: int,
    n_hops: int,
    *,
    pad_mode: str = "multiple",
    host_bfs: bool = True,
    host_only: bool = False,
) -> Subgraph:
    """Extract the padded k-hop computational subgraph around ``query``.

    Host-side sizing + gathers.  The frontier sweep runs in the native C++
    runtime by default (``host_bfs=True``; zero device round-trips — the
    extraction feeds the device, it doesn't need it); set ``host_bfs=False``
    to use the jitted on-device sweep instead (useful when the graph only
    exists on device).  If the subgraph has no edges the query gets a single
    self-loop, mirroring the reference fallback (``data.py:337-339``).

    ``host_only=True`` skips the device upload entirely (the Graph fields are
    numpy, usable as jit-argument/constant inputs) — for callers that only
    read the subgraph host-side, e.g. the batched multi-query stacker.
    """
    if host_bfs:
        from ..runtime import native

        hv = host_view(graph)
        row_ptr, col, _eid = hv.csr()
        reach = (
            native.bfs_levels_csr(graph.n_pad, row_ptr, col, int(query), n_hops)
            <= n_hops
        )
    else:
        reach = np.asarray(
            khop_reachable(
                graph.senders,
                graph.receivers,
                graph.edge_mask,
                jnp.asarray(query, jnp.int32),
                n_hops,
                graph.n_pad,
            )
        ).copy()
    hv = host_view(graph)
    reach &= hv.node_mask
    snd = hv.senders
    rcv = hv.receivers
    keep_edge = reach[snd] & reach[rcv] & hv.edge_mask

    kept_nodes = np.nonzero(reach)[0]  # ascending → matches PyG relabel order
    n_sub = int(kept_nodes.shape[0])
    kept_edges = np.nonzero(keep_edge)[0]
    e_sub = int(kept_edges.shape[0])

    relabel = np.full((graph.n_pad,), -1, np.int64)
    relabel[kept_nodes] = np.arange(n_sub)
    new_query = int(relabel[query])

    n_pad = pad_budget(n_sub, pad_mode, 8)
    self_loop_fallback = e_sub == 0
    e_pad = pad_budget(max(e_sub, 1), pad_mode, 8)

    x = np.zeros((n_pad, graph.num_features), np.float32)
    x[:n_sub] = hv.x[kept_nodes]
    new_snd = np.zeros((e_pad,), np.int32)
    new_rcv = np.zeros((e_pad,), np.int32)
    new_et = np.zeros((e_pad,), np.int32)
    if self_loop_fallback:
        new_snd[0] = new_query
        new_rcv[0] = new_query
        e_sub = 1
    else:
        new_snd[:e_sub] = relabel[snd[kept_edges]]
        new_rcv[:e_sub] = relabel[rcv[kept_edges]]
        new_et[:e_sub] = hv.edge_type[kept_edges]
    nmask = np.zeros((n_pad,), bool)
    nmask[:n_sub] = True
    emask = np.zeros((e_pad,), bool)
    emask[:e_sub] = True
    nt = np.zeros((n_pad,), np.int32)
    nt[:n_sub] = hv.node_type[kept_nodes]

    parent_nodes = np.full((n_pad,), graph.n_pad, np.int64)
    parent_nodes[:n_sub] = kept_nodes
    if host_only:
        (x_d, snd_d, rcv_d, nm_d, em_d, nt_d, et_d) = (
            x, new_snd, new_rcv, nmask, emask, nt, new_et
        )
    else:
        # ONE batched transfer: per-array device_put is an RPC each through
        # the remote-TPU tunnel
        (x_d, snd_d, rcv_d, nm_d, em_d, nt_d, et_d) = jax.device_put(
            (x, new_snd, new_rcv, nmask, emask, nt, new_et)
        )
    sub = Graph(
        x=x_d,
        senders=snd_d,
        receivers=rcv_d,
        node_mask=nm_d,
        edge_mask=em_d,
        node_type=nt_d,
        edge_type=et_d,
        num_nodes=n_sub,
        num_edges=e_sub,
        typed=graph.typed,
    )
    seed_host_view(
        sub,
        x=x,
        senders=new_snd,
        receivers=new_rcv,
        node_mask=nmask,
        edge_mask=emask,
        node_type=nt,
        edge_type=new_et,
    )
    return Subgraph(
        graph=sub,
        parent_nodes=parent_nodes,
        query=new_query,
        parent_edge_mask=keep_edge,
    )

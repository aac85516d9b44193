"""Typed, padded, static-shape graph substrate.

TPU-native replacement for the reference's graph data layer
(``/root/reference/src/pathway_explanations/data.py``).  Key differences by
design:

* Graphs are immutable JAX pytrees with **static padded capacities** so every
  downstream transform (k-hop extraction, masked forwards, sharding) compiles
  once per capacity bucket instead of per concrete size.
* Heterogeneous graphs are represented as a *typed homogeneous* graph —
  one feature matrix + node/edge type vectors + host-side pointer metadata —
  mirroring the reference's homogenisation (``data.py:95-147``) but keeping the
  result device-resident and shape-stable.  The dict-of-arrays API surface is
  preserved at the boundary.
* Edge validity is a boolean mask, never a dynamic edge drop: removing an edge
  means multiplying its weight by zero, which XLA fuses into the aggregation
  kernel (contrast ``data.py:453-554`` which materialises filtered edge lists).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .utils.padding import pad_budget


def _as_np(a) -> np.ndarray:
    """Convert torch tensors / jax arrays / lists to numpy without copying twice."""
    if hasattr(a, "detach"):  # torch tensor
        a = a.detach().cpu().numpy()
    return np.asarray(a)


class HostView:
    """Host (numpy) copies of a graph's arrays, fetched at most once.

    Every device→host read of a remote-TPU buffer is an RPC (~10 ms through
    the axon tunnel); host-side planning code (k-hop extraction, query plans,
    neighbour tables) reads the same arrays per query, so the fetches are
    memoised per Graph instance (weakly — a collected Graph drops its view).
    """

    __slots__ = ("_graph", "_cache")

    def __init__(self, graph: "Graph"):
        self._graph = graph
        self._cache: Dict[str, np.ndarray] = {}

    def __getattr__(self, name: str) -> np.ndarray:
        cache = object.__getattribute__(self, "_cache")
        if name not in cache:
            cache[name] = np.asarray(getattr(self._graph, name))
        return cache[name]

    def csr(self):
        """Receiver-CSR over valid edges, built once per graph:
        (row_ptr [n+1] i64, col [e] i32 senders, eid [e] i32)."""
        if "csr" not in self._cache:
            from .runtime import native

            g = self._graph
            self._cache["csr"] = native.build_csr(
                g.n_pad,
                self.senders[: g.num_edges],
                self.receivers[: g.num_edges],
            )
        return self._cache["csr"]


import weakref  # noqa: E402

_HOST_VIEWS: Dict[int, Tuple[Any, HostView]] = {}


def host_view(graph: "Graph") -> HostView:
    """The memoised :class:`HostView` for ``graph``."""
    key = id(graph)
    entry = _HOST_VIEWS.get(key)
    if entry is not None and entry[0]() is graph:
        return entry[1]
    if len(_HOST_VIEWS) > 64:  # prune dead entries
        for k in [k for k, (ref, _) in _HOST_VIEWS.items() if ref() is None]:
            del _HOST_VIEWS[k]
    hv = HostView(graph)
    _HOST_VIEWS[key] = (weakref.ref(graph), hv)
    return hv


def seed_host_view(graph: "Graph", **arrays: np.ndarray) -> "Graph":
    """Pre-populate ``graph``'s :class:`HostView` with the numpy arrays it
    was just built from, so later host-side planning never round-trips them
    through the device.  Returns ``graph`` for chaining."""
    hv = host_view(graph)
    hv._cache.update(arrays)
    return graph


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Graph:
    """A padded (possibly typed) graph.

    Data fields (traced):
      x:          [N_pad, F] float32 node features (zero for padding rows)
      senders:    [E_pad] int32 — edge source node index (edge_index[0])
      receivers:  [E_pad] int32 — edge target node index (edge_index[1])
      node_mask:  [N_pad] bool — True for real nodes
      edge_mask:  [E_pad] bool — True for real edges
      node_type:  [N_pad] int32 — node type id (0 for homogeneous)
      edge_type:  [E_pad] int32 — edge type id (0 for homogeneous)

    Meta fields (static; changing them recompiles):
      num_nodes / num_edges: actual (unpadded) counts.
      typed: whether type vectors are meaningful (heterogeneous origin).
    """

    x: jax.Array
    senders: jax.Array
    receivers: jax.Array
    node_mask: jax.Array
    edge_mask: jax.Array
    node_type: jax.Array
    edge_type: jax.Array
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))
    typed: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @property
    def n_pad(self) -> int:
        """Padded node count (static shape)."""
        return self.x.shape[0]

    @property
    def e_pad(self) -> int:
        """Padded edge count (static shape)."""
        return self.senders.shape[0]

    @property
    def num_features(self) -> int:
        """Feature width F."""
        return self.x.shape[1]

    def edge_index(self) -> jnp.ndarray:
        """[2, E_pad] COO edge index (reference layout, data.py:29)."""
        return jnp.stack([self.senders, self.receivers], axis=0)

    def with_features(self, x: jax.Array) -> "Graph":
        """Copy of this graph with a replaced [N_pad, F] feature matrix."""
        return dataclasses.replace(self, x=x)


@dataclass(frozen=True)
class HeteroInfo:
    """Host-side metadata recording how a heterogeneous graph was homogenised.

    Mirrors the reference's side-channel outputs of ``preprocess_hetero_graph``
    (``data.py:39-93``): type-name lists, start pointers of each type block,
    and per-type feature padding amounts.
    """

    node_type_names: List[str]
    edge_type_names: List[Tuple[str, ...]]
    node_pointers: List[int]
    edge_pointers: List[int]
    padded_dims: List[int]
    node_counts: List[int]
    edge_counts: List[int]

    @property
    def num_relations(self) -> int:
        """Number of edge types."""
        return len(self.edge_type_names)

    @property
    def num_node_types(self) -> int:
        """Number of node types."""
        return len(self.node_type_names)


def from_arrays(
    feat,
    edge_index,
    node_type=None,
    edge_type=None,
    *,
    node_budget: Optional[int] = None,
    edge_budget: Optional[int] = None,
    pad_mode: str = "multiple",
) -> Graph:
    """Build a padded :class:`Graph` from dense arrays.

    ``feat``: [N, F]; ``edge_index``: [2, E] (row 0 = senders, row 1 =
    receivers — the reference's layout throughout ``data.py``).
    """
    feat = _as_np(feat).astype(np.float32)
    edge_index = _as_np(edge_index).astype(np.int64)
    if edge_index.ndim != 2 or edge_index.shape[0] != 2:
        raise ValueError(f"edge_index must be [2, E], got {edge_index.shape}")
    n, f = feat.shape
    e = edge_index.shape[1]
    n_pad = node_budget if node_budget is not None else pad_budget(n, pad_mode, 8)
    e_pad = edge_budget if edge_budget is not None else pad_budget(max(e, 1), pad_mode, 8)
    if n_pad < n or e_pad < e:
        raise ValueError("budget smaller than actual size")

    x = np.zeros((n_pad, f), np.float32)
    x[:n] = feat
    snd = np.zeros((e_pad,), np.int32)
    rcv = np.zeros((e_pad,), np.int32)
    snd[:e] = edge_index[0]
    rcv[:e] = edge_index[1]
    nmask = np.zeros((n_pad,), bool)
    nmask[:n] = True
    emask = np.zeros((e_pad,), bool)
    emask[:e] = True

    nt = np.zeros((n_pad,), np.int32)
    et = np.zeros((e_pad,), np.int32)
    typed = node_type is not None or edge_type is not None
    if node_type is not None:
        nt[:n] = _as_np(node_type).astype(np.int32)
    if edge_type is not None:
        et[:e] = _as_np(edge_type).astype(np.int32)

    x_d, snd_d, rcv_d, nm_d, em_d, nt_d, et_d = jax.device_put(
        (x, snd, rcv, nmask, emask, nt, et)
    )
    g = Graph(
        x=x_d,
        senders=snd_d,
        receivers=rcv_d,
        node_mask=nm_d,
        edge_mask=em_d,
        node_type=nt_d,
        edge_type=et_d,
        num_nodes=int(n),
        num_edges=int(e),
        typed=bool(typed),
    )
    return seed_host_view(
        g,
        x=x,
        senders=snd,
        receivers=rcv,
        node_mask=nmask,
        edge_mask=emask,
        node_type=nt,
        edge_type=et,
    )


def pad_feature_blocks(
    feat_blocks: Sequence[np.ndarray],
) -> Tuple[List[np.ndarray], List[int], List[int]]:
    """Zero-pad per-type feature matrices to a common width.

    Reference parity: ``pad_feat_tensors`` (``data.py:825-878``) — returns the
    padded blocks, how much each was padded, and the start pointer of each
    block in the concatenated matrix.
    """
    widths = [b.shape[1] for b in feat_blocks]
    max_w = max(widths)
    padded, padded_dims, pointers = [], [], []
    ptr = 0
    for b in feat_blocks:
        diff = max_w - b.shape[1]
        padded_dims.append(diff)
        pointers.append(ptr)
        ptr += b.shape[0]
        if diff > 0:
            b = np.pad(b, ((0, 0), (0, diff)))
        padded.append(b)
    return padded, padded_dims, pointers


def hetero_to_homo(
    feat: Dict[str, Any],
    edge_index: Dict[Tuple[str, ...], Any],
    *,
    node_budget: Optional[int] = None,
    edge_budget: Optional[int] = None,
    pad_mode: str = "multiple",
) -> Tuple[Graph, HeteroInfo]:
    """Homogenise a heterogeneous graph into a typed :class:`Graph`.

    Semantics match the reference's ``hetero2homo`` (``data.py:95-147``):
    feature blocks are concatenated in dict order (zero-padded to a common
    width), node types are block ids, and each relation's edge index is
    shifted by the start pointer of its source/target node-type blocks
    (``data.py:743-822``).
    """
    node_type_names = list(feat.keys())
    edge_type_names = list(edge_index.keys())
    feat_blocks = [_as_np(v).astype(np.float32) for v in feat.values()]
    padded_blocks, padded_dims, node_pointers = pad_feature_blocks(feat_blocks)
    x = np.vstack(padded_blocks)
    node_counts = [b.shape[0] for b in padded_blocks]
    node_types = np.concatenate(
        [np.full((c,), i, np.int32) for i, c in enumerate(node_counts)]
    )

    edge_blocks = []
    edge_types = []
    edge_pointers = []
    edge_counts = []
    ptr = 0
    for i, (rel, ei) in enumerate(edge_index.items()):
        ei = _as_np(ei).astype(np.int64)
        src_block = node_type_names.index(rel[0])
        dst_block = node_type_names.index(rel[-1])
        shifted = ei + np.array(
            [[node_pointers[src_block]], [node_pointers[dst_block]]], np.int64
        )
        edge_blocks.append(shifted)
        edge_types.append(np.full((ei.shape[1],), i, np.int32))
        edge_pointers.append(ptr)
        edge_counts.append(ei.shape[1])
        ptr += ei.shape[1]
    homo_ei = np.hstack(edge_blocks) if edge_blocks else np.zeros((2, 0), np.int64)
    homo_et = np.concatenate(edge_types) if edge_types else np.zeros((0,), np.int32)

    g = from_arrays(
        x,
        homo_ei,
        node_type=node_types,
        edge_type=homo_et,
        node_budget=node_budget,
        edge_budget=edge_budget,
        pad_mode=pad_mode,
    )
    info = HeteroInfo(
        node_type_names=node_type_names,
        edge_type_names=[tuple(t) if isinstance(t, tuple) else t for t in edge_type_names],
        node_pointers=node_pointers,
        edge_pointers=edge_pointers,
        padded_dims=padded_dims,
        node_counts=node_counts,
        edge_counts=edge_counts,
    )
    return g, info


def homo_to_hetero_edge_indices(
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_type: np.ndarray,
    info: HeteroInfo,
    num_edges: Optional[int] = None,
) -> Dict[Tuple[str, ...], np.ndarray]:
    """Reconstruct per-relation LOCAL edge-index dicts from the homogenised
    arrays — the edge half of the reference's ``homo2hetero`` reconversion
    (``data.py:149-232``; the feature half is
    :func:`homo_to_hetero_features`).  Each relation's [2, E_r] indices are
    shifted back into its source/target type blocks' local numbering."""
    snd = _as_np(senders)
    rcv = _as_np(receivers)
    et = _as_np(edge_type)
    if num_edges is not None:
        snd, rcv, et = snd[:num_edges], rcv[:num_edges], et[:num_edges]
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    tname = info.node_type_names
    for ri, rel in enumerate(info.edge_type_names):
        sel = et == ri
        s_off = info.node_pointers[tname.index(rel[0])]
        d_off = info.node_pointers[tname.index(rel[-1])]
        out[tuple(rel)] = np.stack([snd[sel] - s_off, rcv[sel] - d_off])
    return out


def homo_to_hetero_features(
    x: np.ndarray, node_type: np.ndarray, info: HeteroInfo
) -> Dict[str, np.ndarray]:
    """Split a homogenised feature matrix back into per-type blocks, undoing
    the zero padding (reference ``homo2hetero``, ``data.py:149-232``)."""
    out: Dict[str, np.ndarray] = {}
    x = _as_np(x)
    node_type = _as_np(node_type)
    for i, name in enumerate(info.node_type_names):
        block = x[node_type == i]
        if info.padded_dims[i] > 0:
            block = block[:, : -info.padded_dims[i]]
        out[name] = block
    return out


def hetero_names_to_homo(names) -> Tuple[List[str], Optional[np.ndarray]]:
    """Flatten a dict of per-type name lists into one list plus a type vector
    (reference ``hetero2homo_names``, ``data.py:234-279``)."""
    if not isinstance(names, dict):
        return names, None
    homo: List[str] = []
    types: List[np.ndarray] = []
    for i, (_k, lst) in enumerate(names.items()):
        homo.extend(lst)
        types.append(np.full((len(lst),), i, np.int32))
    return homo, (np.concatenate(types) if types else np.zeros((0,), np.int32))


def element_size(graph: Graph, problem: str) -> int:
    """Number of elements to explain (reference ``element_size``,
    ``data.py:363-388``): edges for edge problems, else nodes."""
    if "edge" in problem:
        return graph.num_edges
    return graph.num_nodes

"""Halo-exchange edge partitioning: sharded node features, O(boundary) comms.

:mod:`.edge_partition` shards edges but replicates node features, combining
partial aggregates with an ``O(N)`` ``psum``.  This module is the scalable
variant promised there: nodes are range-partitioned across the mesh (each
device owns a contiguous block of rows), edges live with their *receiver's*
owner (so every aggregation output is device-local), and the only
communication per layer is an ``all_to_all`` of exactly the **boundary rows**
each device's edge shard reads from remote owners — the TPU-native equivalent
of a distributed graph engine's halo exchange, riding ICI instead of
NCCL/MPI (the reference has no distributed capability at all, SURVEY §2.3).

The partition is computed host-side once per (graph, mesh) and reused for
every layer / perturbation batch.  All shapes are static: send lists and edge
shards are padded to the max across devices, so the same compiled program
serves any mask.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..utils.padding import round_up

from ._shard_map import shard_map


class HaloPartition(NamedTuple):
    """Static halo-exchange plan for one (graph, n_devices) pair.

    Node u is owned by device ``u // n_local``.  Edge e is owned by
    ``owner(receivers[e])``.  Per-device arrays are stacked on a leading
    device axis (sharded ``P(axis)`` into ``shard_map``).

    n_local:    nodes per device (global padded node count = D * n_local)
    halo:       boundary rows per (owner, requester) pair (static, padded)
    send_idx:   [D, D, halo] int32 — device o's local row ids to ship to
                device d (slice ``send_idx[o, d]``); 0-padded
    edge_slot:  [D, E_loc] int32 — per edge, index into the device-local
                concat([own rows (n_local), received halo rows (D*halo)])
    edge_rcv:   [D, E_loc] int32 — receiver row id local to the device
    edge_id:    [D, E_loc] int32 — original (global) edge id, for per-edge
                weight gathers
    edge_valid: [D, E_loc] float32 — 1 for real edges, 0 for padding
    """

    n_local: int
    halo: int
    send_idx: jax.Array
    edge_slot: jax.Array
    edge_rcv: jax.Array
    edge_id: jax.Array
    edge_valid: jax.Array

    @property
    def n_devices(self) -> int:
        """Number of shards."""
        return self.send_idx.shape[0]

    @property
    def n_total(self) -> int:
        """Global padded node count."""
        return self.n_devices * self.n_local


def build_halo_partition(
    senders: np.ndarray, receivers: np.ndarray, num_nodes: int, n_devices: int
) -> HaloPartition:
    """Host-side partitioner.  Uses the native C++ planner
    (``runtime/graph_builder.cpp::halo_plan_*``) when available; numpy
    fallback otherwise."""
    snd = np.asarray(senders, dtype=np.int64)
    rcv = np.asarray(receivers, dtype=np.int64)
    n_local = round_up(max((num_nodes + n_devices - 1) // n_devices, 1), 8)
    d = n_devices

    from ..runtime import native

    plan = native.build_halo_plan(d * n_local, snd, rcv, n_local, d)
    if plan is not None:
        halo, _e_loc, send_idx, edge_slot, edge_rcv, edge_id, edge_valid = plan
        return HaloPartition(
            n_local=n_local,
            halo=halo,
            send_idx=jnp.asarray(send_idx),
            edge_slot=jnp.asarray(edge_slot),
            edge_rcv=jnp.asarray(edge_rcv),
            edge_id=jnp.asarray(edge_id),
            edge_valid=jnp.asarray(edge_valid),
        )
    owner_e = rcv // n_local  # edge owner = receiver's owner

    # per-(owner o -> requester dd) unique remote sender lists
    need: list[list[np.ndarray]] = [[None] * d for _ in range(d)]  # type: ignore
    halo = 8
    for dd in range(d):
        e_sel = owner_e == dd
        s = snd[e_sel]
        s_own = s // n_local
        for o in range(d):
            ids = np.unique(s[s_own == o]) if o != dd else np.empty(0, np.int64)
            need[o][dd] = ids
            halo = max(halo, len(ids))
    halo = round_up(halo, 8)

    send_idx = np.zeros((d, d, halo), np.int32)
    # map (requester dd, global node id) -> halo slot, built from send lists
    slot_of: list[dict[int, int]] = [dict() for _ in range(d)]
    for o in range(d):
        for dd in range(d):
            ids = need[o][dd]
            send_idx[o, dd, : len(ids)] = (ids - o * n_local).astype(np.int32)
            base = n_local + o * halo
            for pos, u in enumerate(ids):
                slot_of[dd][int(u)] = base + pos

    e_loc = 8
    shards = []
    for dd in range(d):
        eids = np.nonzero(owner_e == dd)[0]
        shards.append(eids)
        e_loc = max(e_loc, len(eids))
    e_loc = round_up(e_loc, 8)

    edge_slot = np.zeros((d, e_loc), np.int32)
    edge_rcv = np.zeros((d, e_loc), np.int32)
    edge_id = np.zeros((d, e_loc), np.int32)
    edge_valid = np.zeros((d, e_loc), np.float32)
    for dd in range(d):
        eids = shards[dd]
        k = len(eids)
        s, r = snd[eids], rcv[eids]
        local = (s // n_local) == dd
        slots = np.where(
            local,
            s - dd * n_local,
            np.array([slot_of[dd].get(int(u), 0) for u in s], dtype=np.int64),
        )
        edge_slot[dd, :k] = slots.astype(np.int32)
        edge_rcv[dd, :k] = (r - dd * n_local).astype(np.int32)
        edge_id[dd, :k] = eids.astype(np.int32)
        edge_valid[dd, :k] = 1.0

    return HaloPartition(
        n_local=n_local,
        halo=halo,
        send_idx=jnp.asarray(send_idx),
        edge_slot=jnp.asarray(edge_slot),
        edge_rcv=jnp.asarray(edge_rcv),
        edge_id=jnp.asarray(edge_id),
        edge_valid=jnp.asarray(edge_valid),
    )


def pad_nodes(x: np.ndarray | jax.Array, part: HaloPartition) -> jax.Array:
    """Zero-pad a [N, ...] node array to the partition's global row count."""
    n = x.shape[0]
    if n == part.n_total:
        return jnp.asarray(x)
    pad = [(0, part.n_total - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.asarray(np.pad(np.asarray(x), pad))


def _exchange(h_loc: jax.Array, send_idx_dev: jax.Array, axis: str) -> jax.Array:
    """Ship this device's boundary rows to every peer; return the device's
    complete lookup buffer [n_local + D*halo, F]."""
    send = h_loc[send_idx_dev]  # [D, halo, F]
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
    return jnp.concatenate([h_loc, recv.reshape(-1, h_loc.shape[-1])])


def halo_gather_sum(
    edge_weight: jax.Array,
    feats: jax.Array,
    part: HaloPartition,
    mesh: Mesh,
    axis: str = "data",
) -> jax.Array:
    """out[v] = sum_e w_e * feats[senders_e] over the halo partition.

    ``feats`` [N_total, F] and the result are node-sharded over ``axis``;
    ``edge_weight`` [E] is replicated (gathered per shard by edge id).
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(ew, x_loc, send_idx, slot, rcv, eid, valid):
        buf = _exchange(x_loc, send_idx[0], axis)
        w = ew[eid[0]] * valid[0]
        msg = w[:, None] * buf[slot[0]]
        return jax.ops.segment_sum(msg, rcv[0], num_segments=part.n_local)

    return run(
        edge_weight,
        feats,
        part.send_idx,
        part.edge_slot,
        part.edge_rcv,
        part.edge_id,
        part.edge_valid,
    )


def halo_masked_outputs(
    model_def,
    params,
    x: jax.Array,
    masks: jax.Array,
    part: HaloPartition,
    mesh: Mesh,
    problem: str = "node_prediction",
    query: int | None = None,
    axis: str = "data",
    num_nodes: int | None = None,
) -> jax.Array:
    """Batched perturbed outputs over the halo partition: B perturbations of
    a graph whose features/edges/activations are sharded.

    This is the explainer hot loop (``Model.perturbed_query_outputs``) for
    graphs too big for one chip — the capability BASELINE.json configs 4-5
    ask for.  Activations are kept batch-contiguous ([n_local, B, C]) so each
    halo ``all_to_all`` ships whole boundary rows for the entire batch at
    once; node masks are exchanged once and reused by every layer.

    Problems (the reference serves all three through one API,
    ``explainer.py:316-546``):
      * node_prediction:  masks [B, N_total]; returns the query node's
        prediction per perturbation.
      * edge_prediction:  masks [B, E] (global edge ids, replicated); each
        edge shard gathers its own weights by ``edge_id`` — no exchange.
        Returns the query node's prediction.
      * graph_prediction: masks [B, N_total]; returns the mean-pooled
        prediction over the first ``num_nodes`` rows (a local pool + one
        psum — no activation gather).
    """
    n_local = part.n_local
    is_edge = "edge" in problem
    is_graph = "graph" in problem
    if is_graph:
        q_dev, q_loc = 0, 0
    else:
        q_dev, q_loc = divmod(int(query), n_local)
    nn = part.n_total if num_nodes is None else int(num_nodes)

    mask_spec = P() if is_edge else P(None, axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), mask_spec, P(axis), P(axis), P(axis), P(axis),
                  P(axis)),
        out_specs=P(),
    )
    def run(x_loc, m_loc, send_idx, slot, rcv, eid, valid):
        sidx, slot0, rcv0 = send_idx[0], slot[0], rcv[0]
        is_self = (slot0 == rcv0) & (slot0 < n_local)
        if is_edge:
            b = m_loc.shape[0]
            # per-edge weights by global edge id; padding slots gather id 0
            # but are zeroed by `valid`
            w_e = valid[0][:, None] * m_loc.astype(jnp.float32).T[eid[0]]
        else:
            mt = m_loc.astype(jnp.float32).T  # [n_local, B]
            b = mt.shape[1]
            m_buf = _exchange(mt, sidx, axis)  # [n_local + D*halo, B]
            w_e = valid[0][:, None] * m_buf[slot0] * mt[rcv0]  # [E_loc, B]
        w_e = jnp.where(is_self[:, None], 0.0, w_e)
        deg = 1.0 + jax.ops.segment_sum(w_e, rcv0, num_segments=n_local)
        dis = jax.lax.rsqrt(deg)  # [n_local, B]
        dis_buf = _exchange(dis, sidx, axis)
        norm_e = w_e * dis_buf[slot0] * dis[rcv0]  # [E_loc, B]
        self_w = dis * dis  # [n_local, B]

        h = None  # [n_local, B, C] after the first layer
        for li, (conv, p) in enumerate(zip(model_def.convs, params["conv"])):
            if li == 0:
                hw = x_loc[:, : conv.in_features] @ p["weight"].T  # [n_local,C]
                c = hw.shape[-1]
                buf = _exchange(hw, sidx, axis)  # batch-shared rows
                msg = buf[slot0][:, None, :] * norm_e[:, :, None]  # [E,B,C]
                self_term = self_w[:, :, None] * hw[:, None, :]
            else:
                hw = jnp.einsum(
                    "nbc,gc->nbg",
                    h[..., : conv.in_features],
                    p["weight"],
                    preferred_element_type=jnp.float32,
                )
                c = hw.shape[-1]
                buf = _exchange(hw.reshape(n_local, b * c), sidx, axis)
                msg = buf[slot0].reshape(-1, b, c) * norm_e[:, :, None]
                self_term = self_w[:, :, None] * hw
            agg = jax.ops.segment_sum(
                msg.reshape(-1, b * c), rcv0, num_segments=n_local
            ).reshape(n_local, b, c)
            h = agg + self_term
            if "bias" in p:
                h = h + p["bias"]
            h = jax.nn.relu(h)

        my_dev = jax.lax.axis_index(axis)
        if is_graph:
            # local mean pool over real rows, then one psum
            out_nodes = model_def.head(params, h)[..., 0]  # [n_local, B]
            row_ok = (
                my_dev * n_local + jnp.arange(n_local) < nn
            ).astype(jnp.float32)
            pooled = (out_nodes * row_ok[:, None]).sum(0)  # [B]
            return jax.lax.psum(pooled, axis) / float(nn)
        hq = jnp.where(my_dev == q_dev, 1.0, 0.0) * h[q_loc]  # [B, C]
        out = model_def.head(params, hq)[:, 0]  # [B]
        # only the query owner's head output is meaningful; zero the rest
        # BEFORE the sum (head(0) != 0 in general because of biases)
        out = jnp.where(my_dev == q_dev, out, 0.0)
        return jax.lax.psum(out, axis)

    return run(
        x, masks, part.send_idx, part.edge_slot, part.edge_rcv, part.edge_id,
        part.edge_valid,
    )


def halo_masked_outputs_hetero(
    model_def,
    params,
    x: jax.Array,
    masks: jax.Array,
    part: HaloPartition,
    mesh: Mesh,
    etype_loc: jax.Array,  # [D, E_loc] int32 — edge type per local edge slot
    scope_loc: jax.Array,  # [D, R, n_local] f32 — dst-type scope per relation
    problem: str = "node_prediction",
    query: int | None = None,
    axis: str = "data",
    num_nodes: int | None = None,
) -> jax.Array:
    """Batched perturbed outputs for :class:`..models.gnn.HeteroGNN` (all-
    GCNConv convs) over the halo partition.

    Per-relation semantics match the single-chip ``HeteroGNN.backbone``
    exactly: each relation carries its own masked degree with the self-loop
    scoped to the relation's destination node type (PyG ``HeteroConv``
    ``aggr='sum'``).  Communication per layer stays ONE ``all_to_all`` of
    boundary activation rows: the halo buffer ships the *untransformed*
    activations and each device applies every relation's weight to its own
    local+halo rows (transform cost is O(n_local + D*halo), the exchange
    volume is relation-independent).  The R per-relation normalisation
    vectors are stacked into a single exchange as well.
    """
    n_local = part.n_local
    is_edge = "edge" in problem
    is_graph = "graph" in problem
    if is_graph:
        q_dev, q_loc = 0, 0
    else:
        q_dev, q_loc = divmod(int(query), n_local)
    nn = part.n_total if num_nodes is None else int(num_nodes)
    rels = model_def.relations
    nrel = len(rels)

    mask_spec = P() if is_edge else P(None, axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), mask_spec, P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis)),
        out_specs=P(),
    )
    def run(x_loc, m_loc, send_idx, slot, rcv, eid, valid, etl, scl):
        sidx, slot0, rcv0 = send_idx[0], slot[0], rcv[0]
        et0, sc0 = etl[0], scl[0]  # [E_loc], [R, n_local]
        is_self = (slot0 == rcv0) & (slot0 < n_local)
        if is_edge:
            b = m_loc.shape[0]
            w_base = valid[0][:, None] * m_loc.astype(jnp.float32).T[eid[0]]
        else:
            mt = m_loc.astype(jnp.float32).T  # [n_local, B]
            b = mt.shape[1]
            m_buf = _exchange(mt, sidx, axis)
            w_base = valid[0][:, None] * m_buf[slot0] * mt[rcv0]
        w_base = jnp.where(is_self[:, None], 0.0, w_base)  # [E_loc, B]

        # per-relation masked degrees with relation-scoped self-loops
        rel_sel = jnp.stack(
            [(et0 == ri).astype(jnp.float32) for ri in range(nrel)]
        )  # [R, E_loc]
        w_rel = rel_sel[:, :, None] * w_base[None]  # [R, E_loc, B]
        deg = sc0[:, :, None] + jax.vmap(
            lambda w: jax.ops.segment_sum(w, rcv0, num_segments=n_local)
        )(w_rel)  # [R, n_local, B]
        dis = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-30)), 0.0)
        # one exchange for all relations' normalisation vectors
        dis_flat = jnp.transpose(dis, (1, 0, 2)).reshape(n_local, nrel * b)
        dis_buf = _exchange(dis_flat, sidx, axis).reshape(-1, nrel, b)
        norm_e = (
            w_rel * jnp.transpose(dis_buf[slot0], (1, 0, 2)) * dis[:, rcv0]
        )  # [R, E_loc, B]
        self_w = sc0[:, :, None] * dis * dis  # [R, n_local, B]

        h = None  # [n_local, B, C]
        for li, (layer, lp) in enumerate(
            zip(model_def.conv_layers, params["conv"])
        ):
            if li == 0:
                c_in = next(iter(layer.values())).in_features
                buf = _exchange(x_loc[:, :c_in], sidx, axis)  # [rows, c_in]
                out = None
                for ri, (rel, conv) in enumerate(layer.items()):
                    p = lp["__".join(rel)]
                    hw_full = buf @ p["weight"].T  # [rows, C]
                    msg = hw_full[slot0][:, None, :] * norm_e[ri][:, :, None]
                    agg = jax.ops.segment_sum(
                        msg.reshape(-1, b * hw_full.shape[-1]), rcv0,
                        num_segments=n_local,
                    ).reshape(n_local, b, -1)
                    contrib = agg + self_w[ri][:, :, None] * hw_full[
                        :n_local, None, :
                    ]
                    if "bias" in p:
                        contrib = contrib + p["bias"] * sc0[ri][:, None, None]
                    out = contrib if out is None else out + contrib
            else:
                c_in = next(iter(layer.values())).in_features
                c_prev = h.shape[-1]
                buf = _exchange(
                    h.reshape(n_local, b * c_prev), sidx, axis
                ).reshape(-1, b, c_prev)[..., :c_in]
                out = None
                for ri, (rel, conv) in enumerate(layer.items()):
                    p = lp["__".join(rel)]
                    hw_full = jnp.einsum(
                        "nbc,gc->nbg", buf, p["weight"],
                        preferred_element_type=jnp.float32,
                    )  # [rows, B, C]
                    c = hw_full.shape[-1]
                    msg = hw_full[slot0] * norm_e[ri][:, :, None]
                    agg = jax.ops.segment_sum(
                        msg.reshape(-1, b * c), rcv0, num_segments=n_local
                    ).reshape(n_local, b, c)
                    contrib = agg + self_w[ri][:, :, None] * hw_full[:n_local]
                    if "bias" in p:
                        contrib = contrib + p["bias"] * sc0[ri][:, None, None]
                    out = contrib if out is None else out + contrib
            h = jax.nn.relu(out)

        my_dev = jax.lax.axis_index(axis)
        if is_graph:
            out_nodes = model_def.head(params, h)[..., 0]  # [n_local, B]
            row_ok = (
                my_dev * n_local + jnp.arange(n_local) < nn
            ).astype(jnp.float32)
            pooled = (out_nodes * row_ok[:, None]).sum(0)
            return jax.lax.psum(pooled, axis) / float(nn)
        hq = jnp.where(my_dev == q_dev, 1.0, 0.0) * h[q_loc]
        out = model_def.head(params, hq)[:, 0]
        out = jnp.where(my_dev == q_dev, out, 0.0)
        return jax.lax.psum(out, axis)

    return run(
        x, masks, part.send_idx, part.edge_slot, part.edge_rcv, part.edge_id,
        part.edge_valid, etype_loc, scope_loc,
    )


def halo_masked_query_outputs(
    model_def,
    params,
    x: jax.Array,
    masks: jax.Array,
    part: HaloPartition,
    mesh: Mesh,
    query: int,
    axis: str = "data",
) -> jax.Array:
    """Node-problem shorthand for :func:`halo_masked_outputs`."""
    return halo_masked_outputs(
        model_def, params, x, masks, part, mesh,
        problem="node_prediction", query=query, axis=axis,
    )


def halo_gcn_forward(
    model_def,
    params,
    x: jax.Array,
    edge_weight: jax.Array,
    part: HaloPartition,
    mesh: Mesh,
    axis: str = "data",
    senders: jax.Array | None = None,
    receivers: jax.Array | None = None,
) -> jax.Array:
    """Full GCN forward with nodes, edges AND activations sharded.

    Every layer: local matmul -> halo all_to_all of scaled boundary rows ->
    local segment-sum.  Communication per layer is ``D * halo * F`` elements
    per device, independent of N.  Matches the single-chip forward exactly
    (tests assert allclose).  ``senders``/``receivers`` are unused (the
    partition already encodes them) and accepted only for API symmetry with
    :func:`.edge_partition.partitioned_gcn_forward`.
    """
    n_local = part.n_local

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(ew, x_loc, send_idx, slot, rcv, eid, valid):
        sidx = send_idx[0]
        w_e = ew[eid[0]] * valid[0]
        # self-loop data edges are replaced by the unit self loop (gcn_norm)
        is_self = (slot[0] == rcv[0]) & (slot[0] < n_local)
        w_e = jnp.where(is_self, 0.0, w_e)
        deg = 1.0 + jax.ops.segment_sum(w_e, rcv[0], num_segments=n_local)
        dis = jax.lax.rsqrt(deg)  # [n_local]
        dis_buf = _exchange(dis[:, None], sidx, axis)[:, 0]
        norm_e = w_e * dis_buf[slot[0]] * dis[rcv[0]]
        self_w = dis * dis

        h = x_loc
        for conv, p in zip(model_def.convs, params["conv"]):
            hw = h[:, : conv.in_features] @ p["weight"].T
            buf = _exchange(hw, sidx, axis)
            msg = norm_e[:, None] * buf[slot[0]]
            agg = jax.ops.segment_sum(msg, rcv[0], num_segments=n_local)
            h = agg + self_w[:, None] * hw
            if "bias" in p:
                h = h + p["bias"]
            h = jax.nn.relu(h)
        return model_def.head(params, h)

    return run(
        edge_weight,
        x,
        part.send_idx,
        part.edge_slot,
        part.edge_rcv,
        part.edge_id,
        part.edge_valid,
    )

"""Edge-partitioned graph aggregation across a device mesh.

For graphs whose edge set exceeds one chip (BASELINE.json configs 4-5:
>=10M-edge knowledge graphs), edges shard across the mesh and every device
aggregates its shard's messages into a full node accumulator; a ``psum`` over
the mesh combines the partials.  Node features are replicated in this first
version (the all-to-all halo-exchange variant for sharded features is the
planned follow-up — the psum IS the boundary exchange, just unoptimised).

Written with ``shard_map`` so the collective is explicit and the per-device
computation is exactly the single-chip kernel.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ._shard_map import shard_map


def partition_edges(edge_arrays, mesh: Mesh, axis: str = "data"):
    """Place per-edge arrays edge-sharded over ``axis``.  Edge count must
    divide the axis size (pad with weight-0 edges otherwise)."""
    sh = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sh) for a in edge_arrays)


def partitioned_gather_sum(
    edge_weight: jax.Array,
    feats: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    mesh: Mesh,
    axis: str = "data",
) -> jax.Array:
    """out[v] = sum_e w_e * feats[senders_e] with dst receivers_e == v,
    edges sharded over ``axis``, feats replicated, result replicated."""
    num_nodes = feats.shape[0]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(), P(axis), P(axis)),
        out_specs=P(),
    )
    def run(ew, x, snd, rcv):
        msg = ew[:, None] * x[snd]
        part = jax.ops.segment_sum(msg, rcv, num_segments=num_nodes)
        return jax.lax.psum(part, axis)

    return run(edge_weight, feats, senders, receivers)


def partitioned_gcn_forward(
    model_def,
    params,
    x: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    edge_weight: jax.Array,
    mesh: Mesh,
    axis: str = "data",
) -> jax.Array:
    """Full GCN forward with the edge set sharded across the mesh.

    Degree computation and every conv layer's aggregation run edge-partitioned
    with a psum; linear layers and activations run replicated.  Matches the
    single-chip forward exactly (tests assert allclose).
    """
    num_nodes = x.shape[0]

    not_loop = (senders != receivers).astype(edge_weight.dtype)
    w = edge_weight * not_loop

    @partial(shard_map, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P())
    def sharded_degree(w, rcv):
        return jax.lax.psum(
            jax.ops.segment_sum(w, rcv, num_segments=num_nodes), axis
        )

    deg = sharded_degree(w, receivers) + 1.0
    dis = jax.lax.rsqrt(deg)
    norm_e = dis[senders] * w * dis[receivers]
    self_w = dis * dis

    h = x
    for conv, p in zip(model_def.convs, params["conv"]):
        hw = h[:, : conv.in_features] @ p["weight"].T
        agg = partitioned_gather_sum(norm_e, hw, senders, receivers, mesh, axis)
        h = agg + self_w[:, None] * hw
        if "bias" in p:
            h = h + p["bias"]
        h = jax.nn.relu(h)
    return model_def.head(params, h)

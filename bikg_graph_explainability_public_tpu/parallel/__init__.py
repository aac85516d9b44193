"""Scale-out layer: device meshes, GSPMD shardings, edge partitioning.

All of this is a *new* capability relative to the reference, which is
strictly single-device (SURVEY §2.3).  Three tiers:

1. :mod:`.mesh` / :mod:`.sharding` — shard the perturbation batch (data
   axis) and hidden dims (model axis) with GSPMD-inserted collectives.
2. :mod:`.edge_partition` — edges sharded, features replicated, ``psum``
   combine (simple; comms O(N)).
3. :mod:`.halo` — nodes, edges and activations sharded with all-to-all
   boundary-row exchange (comms O(boundary), independent of N).
"""

from .mesh import make_mesh, batch_sharding, replicated
from .sharding import (
    explain_training_step,
    shard_batch,
    shard_params_model_axis,
    sharded_query_outputs,
)
from .edge_partition import (
    partition_edges,
    partitioned_gather_sum,
    partitioned_gcn_forward,
)
from .sharded_model import ShardedModel
from .halo import (
    HaloPartition,
    build_halo_partition,
    halo_gather_sum,
    halo_gcn_forward,
    halo_masked_outputs,
    halo_masked_query_outputs,
    pad_nodes,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "explain_training_step",
    "shard_batch",
    "shard_params_model_axis",
    "sharded_query_outputs",
    "partition_edges",
    "partitioned_gather_sum",
    "partitioned_gcn_forward",
    "HaloPartition",
    "build_halo_partition",
    "halo_gather_sum",
    "halo_gcn_forward",
    "halo_masked_outputs",
    "halo_masked_query_outputs",
    "pad_nodes",
    "ShardedModel",
]

"""Device-mesh construction — single-host, multi-host (DCN), and virtual.

The reference is strictly single-device (SURVEY §2.3); scale-out is a *new*
capability of this framework: the embarrassingly-parallel perturbation batch
shards over a ``data`` axis, model/feature dimensions can shard over a
``model`` axis, and multi-host deployments add an outermost ``host`` axis
whose collectives ride DCN while everything inner stays on ICI.
Collectives are inserted by GSPMD from sharding annotations — no
hand-written communication on the baseline path.

Multi-host launch recipe (one process per host, same program everywhere)::

    from bikg_graph_explainability_public_tpu.parallel import mesh as pxmesh
    pxmesh.initialize_distributed()          # reads env on TPU pods
    m = pxmesh.make_multihost_mesh()         # ("host", "data")
    dfs = px.explain_many(model, g, queries, cfg, mesh=m)

See ``docs/distributed.md`` for the full deployment story.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DISTRIBUTED_INITIALIZED = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize ``jax.distributed`` for a multi-host (DCN) deployment.

    On Cloud TPU pods all three arguments are discovered from the metadata
    server / environment, so a bare ``initialize_distributed()`` is the whole
    launch step.  Elsewhere pass them explicitly (torchrun-style env vars
    ``COORDINATOR_ADDRESS`` / ``NUM_PROCESSES`` / ``PROCESS_ID`` are also
    honoured).  Idempotent; returns True when a multi-process runtime is
    live after the call.

    The reference has no distributed backend at all (SURVEY §5), so there is
    no behaviour to match — this is the standard JAX multi-controller
    bootstrap: every host runs the same program, ``jax.devices()`` becomes
    the *global* device list, and GSPMD partitions each jitted computation
    over whatever mesh those devices form.
    """
    global _DISTRIBUTED_INITIALIZED
    import os

    if _DISTRIBUTED_INITIALIZED:
        return jax.process_count() > 1

    # CRITICAL: jax.distributed.initialize() must run before *any* call that
    # initializes the XLA backend (jax.process_count(), jax.default_backend(),
    # jax.devices(), ...) — jax >= 0.9 raises a RuntimeError otherwise.  So the
    # pod/coordinator decision is made from environment variables ALONE.
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    # Cloud TPU pods expose their topology via these env vars (set by the TPU
    # runtime / GKE).  A *multi-worker* topology means auto-discovery will
    # succeed with no explicit coordinator; a single hostname (every TPU VM
    # sets TPU_WORKER_HOSTNAMES, even 1-host boxes) must NOT trigger
    # initialization — single-process runs would fail the backends-initialized
    # check for nothing.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_tpu_pod = (
        "," in hostnames
        or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
        or (num_processes or 0) > 1
    )
    if coordinator_address is None and not on_tpu_pod:
        return False  # single-process run; nothing to initialize

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # idempotency: someone initialized before us
        if "already initialized" not in str(e).lower():
            raise
    _DISTRIBUTED_INITIALIZED = True
    return jax.process_count() > 1


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Default: 1-D ``data`` mesh (perturbation-batch parallelism).  Pass
    ``axis_names=("data", "model")`` with a ``shape`` for 2-D sharding.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names)


def make_multihost_mesh(
    axis_names: Tuple[str, ...] = ("host", "data"),
    hosts: Optional[int] = None,
    inner_shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Global mesh with an outermost ``host`` axis spanning processes.

    In a real multi-process run (after :func:`initialize_distributed`) the
    host axis follows ``jax.process_count()`` and each row holds one
    process's local devices in order — so collectives over the host axis
    ride DCN and collectives over every inner axis ride ICI, the layout the
    scaling-book recipe calls for (shard the embarrassingly-parallel query/
    perturbation axis over ``host``, keep anything communication-heavy
    inner).

    In a single-process run pass ``hosts`` to *emulate* the topology by
    folding the local device list into (hosts, devices/host) — this is how
    the driver dry-runs the multi-host path on a virtual CPU mesh without N
    real hosts.  ``inner_shape`` further factors the per-host devices for
    >2-D meshes, e.g. ``axis_names=("host", "data", "model")``,
    ``inner_shape=(2, 2)``.
    """
    devs = jax.devices()
    n_proc = jax.process_count()
    if hosts is None:
        hosts = n_proc if n_proc > 1 else 1
    if len(devs) % hosts:
        raise ValueError(f"{len(devs)} devices do not fold into {hosts} hosts")
    per_host = len(devs) // hosts
    if n_proc > 1:
        # order globally by (process, local position) so each mesh row is one
        # physical host — host-axis collectives cross DCN exactly once
        devs = sorted(devs, key=lambda d: (d.process_index, d.id))
    if inner_shape is None:
        inner_shape = (per_host,) + (1,) * (len(axis_names) - 2)
    arr = np.asarray(devs).reshape((hosts,) + tuple(inner_shape))
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a [B, ...] perturbation batch: rows split over ``axis``."""
    return NamedSharding(mesh, P(axis))


def hierarchical_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Rows split over every batch-like mesh axis (``host`` and ``data``
    jointly) — the multi-host placement of a perturbation/query batch."""
    axes = tuple(a for a in mesh.axis_names if a in ("host", "data"))
    return NamedSharding(mesh, P(axes if len(axes) > 1 else axes[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    """NamedSharding that replicates an array on every device."""
    return NamedSharding(mesh, P())

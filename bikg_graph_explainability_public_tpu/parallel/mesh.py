"""Device-mesh construction.

The reference is strictly single-device (SURVEY §2.3); scale-out is a *new*
capability of this framework: the embarrassingly-parallel perturbation batch
shards over a ``data`` axis, and model/feature dimensions can shard over a
``model`` axis.  Collectives are inserted by GSPMD from sharding annotations —
no hand-written communication on the baseline path.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a [B, ...] perturbation batch: rows split over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

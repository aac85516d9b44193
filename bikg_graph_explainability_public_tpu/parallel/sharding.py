"""GSPMD sharding of the explanation pipeline.

Design (SURVEY §7.1 "Scale-out" row): the perturbation batch is pure data
parallelism — mask rows shard over the ``data`` axis, the graph and model
replicate, and the surrogate's batch-loss gradient is an automatic
``psum``.  Layer output dimensions optionally shard over a ``model`` axis
(tensor parallelism for wide hidden dims).  XLA inserts all collectives; the
numerics are identical to single-device execution, which the sharding tests
assert exactly.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import Graph
from ..models.adapter import Model
from .mesh import batch_sharding, replicated


def shard_batch(masks: jax.Array, mesh: Mesh, axis: str = "data") -> jax.Array:
    """Place a [B, S] mask batch row-sharded over the mesh.  B must divide by
    the axis size (pad rows with all-False masks + zero kernel weight if
    not)."""
    return jax.device_put(masks, batch_sharding(mesh, axis))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree fully replicated on the mesh."""
    return jax.device_put(tree, replicated(mesh))


def shard_params_model_axis(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Tensor-parallel placement: shard every 2-D weight's output dimension
    (torch layout [out, in] → rows) over ``axis``; biases follow; everything
    else replicates.  Falls back to replication when the dim doesn't divide."""
    axis_size = mesh.shape[axis]

    def place(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 2 and leaf.shape[0] % axis_size == 0:
            return jax.device_put(leaf, NamedSharding(mesh, P(axis, None)))
        if hasattr(leaf, "ndim") and leaf.ndim == 1 and leaf.shape[0] % axis_size == 0:
            return jax.device_put(leaf, NamedSharding(mesh, P(axis)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, params)


def sharded_query_outputs(
    model: Model,
    graph: Graph,
    masks: jax.Array,
    problem: str,
    query: Optional[int],
    mesh: Mesh,
) -> jax.Array:
    """Perturbed query outputs with the batch sharded over ``data``.

    Same contract as :meth:`..models.adapter.Model.perturbed_query_outputs`;
    the vmap partitions trivially along the sharded batch axis, so each chip
    runs B/n_chips forwards with zero communication until the final gather.
    """
    masks = shard_batch(masks, mesh)
    graph = replicate(graph, mesh)

    @jax.jit
    def run(masks):
        return model.perturbed_query_outputs(
            graph, masks, problem, query, chunk_size=masks.shape[0]
        )

    return run(masks)


def explain_training_step(
    model: Model,
    graph: Graph,
    problem: str,
    query: Optional[int],
    num_valid: int,
    lr: float = 0.01,
    l1_lambda: float = 1e-4,
    weight_decay: float = 1e-2,
):
    """One full, jittable surrogate-training step: vmapped masked black-box
    forwards over the (sharded) mask batch → KernelSHAP weights → weighted
    loss → Adam update.  Gradients over the sharded batch reduce with an
    automatic psum.

    Returns ``step(w, m, v, t, mask_batch) -> (w, m, v, t, loss)``.  This is
    the function the multi-chip dry-run jits over a real mesh.
    """
    from ..explain.kernels import shap_kernel

    def step(w, m, v, t, mask_batch):
        outputs = model.perturbed_query_outputs(
            graph, mask_batch, problem, query, chunk_size=mask_batch.shape[0]
        )
        kern = shap_kernel(mask_batch, num_valid_columns=num_valid)
        width = w.shape[0]
        col_valid = (jnp.arange(width) < num_valid).astype(jnp.float32)

        def loss_fn(w):
            pred = mask_batch.astype(jnp.float32) @ w
            diff = (pred - outputs) ** 2
            wmse = jnp.mean(kern * diff) / jnp.maximum(kern.sum(), 1e-30)
            l1 = l1_lambda * jnp.sum(jnp.abs(w) * col_valid) / num_valid
            return wmse + l1

        loss, g = jax.value_and_grad(loss_fn)(w)
        g = (g + weight_decay * w) * col_valid
        t = t + 1
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mhat = m / (1.0 - 0.9**t)
        vhat = v / (1.0 - 0.999**t)
        w = w - lr * mhat / (jnp.sqrt(vhat) + 1e-8)
        return w, m, v, t, loss

    return step

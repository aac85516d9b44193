"""Drop-in :class:`..models.adapter.Model` that shards the graph over a mesh.

``Explainer`` talks to the black box exclusively through
``Model.perturbed_query_outputs``; overriding that one method with the
halo-exchange engine makes the *entire* explanation pipeline (mask sampling,
kernel weighting, surrogate training, DataFrames) work unchanged on graphs
whose features/edges/activations are sharded across devices:

    model = ShardedModel(mdef, params, make_mesh(8))
    Explainer(feat, edge_index, model, cfg, names).run("q")   # distributed

Node problems on :class:`..models.gnn.GCNNodeModel` run fully sharded; edge
and graph problems currently fall back to the replicated-feature base path
(still data-parallel over the mask batch if the inputs are sharded).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..graph import Graph
from ..models.adapter import Model
from ..models.gnn import GCNNodeModel
from .halo import build_halo_partition, halo_masked_query_outputs, pad_nodes


class ShardedModel(Model):
    """Model adapter whose batched masked forward runs halo-partitioned."""

    def __init__(
        self,
        model_def,
        params,
        mesh: Mesh,
        axis: str = "data",
        fast: bool = True,
    ):
        super().__init__(model_def, params, fast=fast)
        self.mesh = mesh
        self.axis = axis
        self._halo_cache: tuple = (None, None)

    @property
    def n_devices(self) -> int:
        return self.mesh.shape[self.axis]

    def _halo(self, graph: Graph):
        if self._halo_cache[0] is graph:
            return self._halo_cache[1]
        snd = np.asarray(graph.senders)[: graph.num_edges]
        rcv = np.asarray(graph.receivers)[: graph.num_edges]
        part = build_halo_partition(snd, rcv, graph.n_pad, self.n_devices)
        x = pad_nodes(np.asarray(graph.x), part)
        entry = (part, x)
        self._halo_cache = (graph, entry)
        return entry

    def perturbed_query_outputs(
        self,
        graph: Graph,
        masks: jax.Array,
        problem: str,
        query: Optional[int],
        chunk_size: int = 128,
    ) -> jax.Array:
        if "node" not in problem or not isinstance(self.model_def, GCNNodeModel):
            return super().perturbed_query_outputs(
                graph, masks, problem, query, chunk_size
            )
        part, x = self._halo(graph)
        m = masks.shape[0]
        pad_cols = part.n_total - masks.shape[1]
        if pad_cols:
            masks = jnp.pad(masks, ((0, 0), (0, pad_cols)))

        outs = []
        for start in range(0, m, chunk_size):
            chunk = masks[start : start + chunk_size]
            if chunk.shape[0] < chunk_size and start > 0:
                # keep one compiled shape: pad the tail chunk
                pad_rows = chunk_size - chunk.shape[0]
                chunk_run = jnp.pad(chunk, ((0, pad_rows), (0, 0)))
                o = halo_masked_query_outputs(
                    self.model_def, self.params, x, chunk_run, part,
                    self.mesh, int(query), self.axis,
                )[: chunk.shape[0]]
            else:
                o = halo_masked_query_outputs(
                    self.model_def, self.params, x, chunk, part,
                    self.mesh, int(query), self.axis,
                )
            outs.append(o)
        return jnp.concatenate(outs) if len(outs) > 1 else outs[0]

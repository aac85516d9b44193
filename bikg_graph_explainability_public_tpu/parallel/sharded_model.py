"""Drop-in :class:`..models.adapter.Model` that shards the graph over a mesh.

``Explainer`` talks to the black box exclusively through
``Model.perturbed_query_outputs``; overriding that one method with the
halo-exchange engine makes the *entire* explanation pipeline (mask sampling,
kernel weighting, surrogate training, DataFrames) work unchanged on graphs
whose features/edges/activations are sharded across devices:

    model = ShardedModel(mdef, params, make_mesh(8))
    Explainer(feat, edge_index, model, cfg, names).run("q")   # distributed

Node, edge and graph problems on :class:`..models.gnn.GCNNodeModel` all run
fully sharded (``halo_masked_outputs``).  Other model families raise — a
silent fall-back to the replicated path would OOM on exactly the graphs this
class exists for; pass ``allow_replicated_fallback=True`` to opt into it
explicitly.
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..graph import Graph
from ..models.adapter import Model
from ..models.gnn import GCNNodeModel, HeteroGNN
from .halo import (
    build_halo_partition,
    halo_masked_outputs,
    halo_masked_outputs_hetero,
    pad_nodes,
)


def _is_gcn_hetero(model_def) -> bool:
    from ..models.layers import GCNConv

    return isinstance(model_def, HeteroGNN) and all(
        isinstance(c, GCNConv)
        for layer in model_def.conv_layers
        for c in layer.values()
    )


class ShardedModel(Model):
    """Model adapter whose batched masked forward runs halo-partitioned."""

    def __init__(
        self,
        model_def,
        params,
        mesh: Mesh,
        axis: str = "data",
        fast: bool = True,
        allow_replicated_fallback: bool = False,
    ):
        super().__init__(model_def, params, fast=fast)
        self.mesh = mesh
        self.axis = axis
        self.allow_replicated_fallback = allow_replicated_fallback
        self._halo_cache: tuple = (None, None)

    @property
    def n_devices(self) -> int:
        """Mesh size this model is partitioned over."""
        return self.mesh.shape[self.axis]

    def _halo(self, graph: Graph):
        if self._halo_cache[0] is graph:
            return self._halo_cache[1]
        snd = np.asarray(graph.senders)[: graph.num_edges]
        rcv = np.asarray(graph.receivers)[: graph.num_edges]
        part = build_halo_partition(snd, rcv, graph.n_pad, self.n_devices)
        x = pad_nodes(np.asarray(graph.x), part)
        hetero = None
        if _is_gcn_hetero(self.model_def):
            d = part.n_devices
            # edge type per local edge slot (padding slots gather edge 0 but
            # every use is multiplied by edge_valid)
            et = np.asarray(graph.edge_type)
            etype_loc = et[np.asarray(part.edge_id)].astype(np.int32)
            nt = np.zeros((part.n_total,), np.int32)
            nt[: graph.n_pad] = np.asarray(graph.node_type)
            nmask = np.zeros((part.n_total,), bool)
            nmask[: graph.n_pad] = np.asarray(graph.node_mask)
            rels = self.model_def.relations
            scope = np.zeros((d, len(rels), part.n_local), np.float32)
            for ri, rel in enumerate(rels):
                dt = self.model_def.node_type_names.index(rel[-1])
                scope[:, ri, :] = ((nt == dt) & nmask).reshape(d, part.n_local)
            hetero = (jnp.asarray(etype_loc), jnp.asarray(scope))
        entry = (part, x, hetero)
        self._halo_cache = (graph, entry)
        return entry

    def perturbed_query_outputs(
        self,
        graph: Graph,
        masks: jax.Array,
        problem: str,
        query: Optional[int],
        chunk_size: int = 128,
        auto_chunk: bool = True,
    ) -> jax.Array:
        """Distributed masked forwards: one output per mask row, computed
        over the halo partition.  ``auto_chunk`` matches the base adapter's
        signature; the halo path always honors ``chunk_size`` verbatim."""
        hetero_ok = _is_gcn_hetero(self.model_def)
        if not isinstance(self.model_def, GCNNodeModel) and not hetero_ok:
            if not self.allow_replicated_fallback:
                raise NotImplementedError(
                    "ShardedModel serves GCNNodeModel and all-GCNConv "
                    "HeteroGNN; the replicated path would hold the full "
                    "graph per device and OOM at sharded scale. Pass "
                    "allow_replicated_fallback=True to opt in explicitly."
                )
            warnings.warn(
                "ShardedModel: replicated fall-back (full graph per device) "
                f"for {type(self.model_def).__name__}",
                stacklevel=2,
            )
            return super().perturbed_query_outputs(
                graph, masks, problem, query, chunk_size
            )
        part, x, hetero = self._halo(graph)
        m = masks.shape[0]
        if "edge" not in problem:
            pad_cols = part.n_total - masks.shape[1]
            if pad_cols:
                masks = jnp.pad(masks, ((0, 0), (0, pad_cols)))

        if hetero_ok:
            etype_loc, scope_loc = hetero

            def run(chunk):
                return halo_masked_outputs_hetero(
                    self.model_def, self.params, x, chunk, part, self.mesh,
                    etype_loc, scope_loc, problem=problem,
                    query=None if "graph" in problem else int(query),
                    axis=self.axis, num_nodes=graph.num_nodes,
                )
        else:
            def run(chunk):
                return halo_masked_outputs(
                    self.model_def, self.params, x, chunk, part, self.mesh,
                    problem=problem,
                    query=None if "graph" in problem else int(query),
                    axis=self.axis, num_nodes=graph.num_nodes,
                )

        outs = []
        for start in range(0, m, chunk_size):
            chunk = masks[start : start + chunk_size]
            if chunk.shape[0] < chunk_size and start > 0:
                # keep one compiled shape: pad the tail chunk
                pad_rows = chunk_size - chunk.shape[0]
                chunk_run = jnp.pad(chunk, ((0, pad_rows), (0, 0)))
                o = run(chunk_run)[: chunk.shape[0]]
            else:
                o = run(chunk)
            outs.append(o)
        return jnp.concatenate(outs) if len(outs) > 1 else outs[0]

"""Black-box model adapter (reference L1, ``src/pathway_explanations/model.py``).

Wraps any (model_def, params) pair behind a uniform calling convention and
provides the **batched masked forward** — the framework's replacement for the
reference's mega-graph inference (``model.py:62-116``) and its per-perturbation
hetero loop (``model.py:196-249``): a batch of B perturbations is one vmapped,
chunked forward with per-edge weight multipliers.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..graph import Graph
from .gnn import GCNNodeModel, HeteroGNN


class Model:
    """Adapter around a model definition + trained params.

    Unlike the reference — which sniffs the forward arity with
    ``inspect.getargspec`` (``model.py:104``, removed in py>=3.11) — the
    calling convention is declared by the model class itself.
    """

    def __init__(self, model_def: Any, params: Any, fast: bool = True):
        self.model_def = model_def
        self.params = params
        #: use the fused ELL fast path for GCNNodeModel batched forwards
        self.fast = fast
        self._fast_cache: tuple = (None, None)  # (graph id, engine)

    def get_hops(self, num_relations: int = 0) -> int:
        """Receptive-field depth.  The reference infers this by counting
        MessagePassing modules and dividing by the relation count
        (``model.py:28-60``); here the model declares it exactly."""
        return self.model_def.num_hops

    @property
    def _typed(self) -> bool:
        """Models whose forward takes (…, node_type, edge_type): HeteroGNN
        and anything declaring ``typed = True`` (e.g. RGCNNodeModel) — the
        framework's replacement for the reference's arity sniffing
        (``model.py:104-112``)."""
        return isinstance(self.model_def, HeteroGNN) or getattr(
            self.model_def, "typed", False
        )

    def forward_fn(self, graph: Graph) -> Callable[[jax.Array], jax.Array]:
        """Pure fn ``edge_weight -> per-node output`` with graph captured."""
        if self._typed:
            def fwd(ew):
                return self.model_def.apply(
                    self.params,
                    graph.x,
                    graph.senders,
                    graph.receivers,
                    ew,
                    graph.node_type,
                    graph.edge_type,
                )
        else:
            def fwd(ew):
                return self.model_def.apply(
                    self.params, graph.x, graph.senders, graph.receivers, ew
                )
        return fwd

    def infer(self, graph: Graph, edge_weight: Optional[jax.Array] = None) -> jax.Array:
        """Single unperturbed forward (reference ``Model.infer``,
        ``model.py:62-116``)."""
        ew = graph.edge_mask.astype(graph.x.dtype)
        if edge_weight is not None:
            ew = ew * edge_weight
        return self.forward_fn(graph)(ew)

    def perturbed_query_outputs(
        self,
        graph: Graph,
        masks: jax.Array,
        problem: str,
        query: Optional[int],
        chunk_size: int = 128,
        auto_chunk: bool = True,
    ) -> jax.Array:
        """Outputs of the black box for every perturbation row.

        masks: [M, S] bool — S = padded node count (node/graph problems) or
        padded edge count (edge problems).  Returns [M] float32: the query
        element's prediction per perturbation (node/edge problems) or the
        pooled graph prediction (graph problems).

        Replaces: mega-graph tiling + edge-index shifting + strided output
        gather (``data.py:556-648``, ``model.py:294-328``) with a vmap.
        """
        if self.fast and isinstance(self.model_def, GCNNodeModel):
            engine = self._fast_engine(graph)
            return engine.query_outputs(
                masks, query, problem, chunk_size, auto_chunk=auto_chunk
            )
        if self.fast and isinstance(self.model_def, HeteroGNN):
            engine = self._fast_hetero_engine(graph)
            if engine is not None:
                out = engine.query_outputs(masks, query, problem, chunk_size)
                # engines decline what they can't serve fast (GAT: edge and
                # graph problems; GCN: unrestricted beyond DENSE_CAP padded
                # nodes, unrestricted edge problems)
                if out is not None:
                    return out
        fwd = self.forward_fn(graph)
        base = graph.edge_mask.astype(graph.x.dtype)
        snd, rcv = graph.senders, graph.receivers
        is_edge = "edge" in problem
        is_graph = "graph" in problem
        nvalid = graph.node_mask.astype(graph.x.dtype)
        # homogeneous models exposing backbone/head run the FC head on the
        # query row only (the reference runs its head on every node of every
        # perturbation and discards all but one value, model.py:294-328)
        split_head = (
            not is_graph
            and not isinstance(self.model_def, HeteroGNN)
            and hasattr(self.model_def, "backbone")
            and hasattr(self.model_def, "head")
        )
        typed = self._typed

        def one(m):
            mf = m.astype(graph.x.dtype)
            ew = base * (mf if is_edge else mf[snd] * mf[rcv])
            if split_head:
                if typed:
                    h = self.model_def.backbone(
                        self.params, graph.x, snd, rcv, ew,
                        graph.node_type, graph.edge_type,
                    )
                else:
                    h = self.model_def.backbone(
                        self.params, graph.x, snd, rcv, ew
                    )
                return self.model_def.head(self.params, h[query][None, :])[0, 0]
            out = fwd(ew)
            if is_graph:
                # global mean pool over valid nodes
                s = (out[:, 0] * nvalid).sum() / jnp.maximum(nvalid.sum(), 1.0)
                return s
            return out[query, 0]

        m_total = masks.shape[0]
        if m_total % chunk_size == 0 and m_total > chunk_size:
            chunks = masks.reshape(m_total // chunk_size, chunk_size, masks.shape[1])
            outs = jax.lax.map(jax.vmap(one), chunks)
            return outs.reshape(m_total)
        return jax.vmap(one)(masks)

    def _fast_engine(self, graph: Graph):
        from .fast_gcn import FastBatchedGCN

        if self._fast_cache[0] is graph:
            return self._fast_cache[1]
        engine = FastBatchedGCN(self.model_def, self.params, graph)
        # Only memoise outside jit traces — device constants created while
        # tracing must not escape into later traces.
        try:
            from jax._src.core import trace_state_clean

            clean = trace_state_clean()
        except Exception:
            clean = False
        if clean:
            self._fast_cache = (graph, engine)
        return engine

    def _fast_hetero_engine(self, graph: Graph):
        from .fast_hetero import FastBatchedHeteroGAT, FastBatchedHeteroGCN

        if self._fast_cache[0] is graph:
            return self._fast_cache[1]
        try:
            engine = FastBatchedHeteroGCN(self.model_def, self.params, graph)
        except TypeError:
            try:
                engine = FastBatchedHeteroGAT(self.model_def, self.params, graph)
            except TypeError:
                return None  # mixed conv types: generic path
        try:
            from jax._src.core import trace_state_clean

            clean = trace_state_clean()
        except Exception:
            clean = False
        if clean:
            self._fast_cache = (graph, engine)
        return engine

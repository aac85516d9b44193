"""Fused fast path for batched masked GCN forwards (the explainer hot loop).

Takes a :class:`.gnn.GCNNodeModel` + params + one padded graph, precomputes
everything batch-invariant (neighbour tables, first-layer transformed-feature
gather), and evaluates B perturbations as MXU contractions:

  layer 1:  out_b = einsum(coeff_b, XW[nbr]) — the gather is shared across
            the whole batch (the decisive measurement behind this design:
            scatter-add ~16 ms/sample vs shared-gather ELL ~4 ms/sample at
            B=8 on 1M edges, amortising further with B)
  layer l>1: per-sample gather + contraction
  head:     FC layers on the query row only (node problems) — the reference
            runs its head on every node of every perturbation and discards
            all but one value (model.py:294-328)

Numerics match the COO segment-sum path (same math, different reduction
order) — asserted in tests.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.ell import (
    NeighborTable,
    build_neighbor_table,
    ell_aggregate_per_sample,
    ell_aggregate_shared,
    gcn_coeffs_from_edge_mask,
    gcn_coeffs_from_node_mask,
)
from .gnn import GCNNodeModel
from .layers import relu


def _dense_adjacency(graph, dtype) -> jax.Array:
    """Dense [N_pad, N_pad] adjacency (receiver-major, data self-loops
    excluded, duplicate edges counted) built host-side."""
    import numpy as np

    n = graph.n_pad
    snd = np.asarray(graph.senders)[: graph.num_edges]
    rcv = np.asarray(graph.receivers)[: graph.num_edges]
    keep = snd != rcv
    a = np.zeros((n, n), np.float32)
    np.add.at(a, (rcv[keep], snd[keep]), 1.0)
    return jnp.asarray(a, dtype=dtype)


#: below this padded node count, use the dense-adjacency MXU formulation
DENSE_THRESHOLD = 4096


class FastBatchedGCN:
    """Batched masked forward engine for one (model, params, graph) triple.

    Two data layouts, picked by subgraph size:

    * **dense** (N_pad <= DENSE_THRESHOLD — the usual computational-subgraph
      case): adjacency as a dense [N, N] matrix.  A node-masked GCN layer is
      ``h_b = diag(s_b) A diag(s_b) XW + deg_b^-1 XW`` with
      ``s_b = m_b * rsqrt(deg_b)`` — a batch of dense MXU matmuls with rank-1
      mask scaling.  No gathers, no scatters; irregular sparsity becomes
      dense systolic-array work.
    * **ELL** (larger graphs): padded neighbour tables; layer-1 gather shared
      across the batch (see module docstring).
    """

    def __init__(
        self,
        model_def: GCNNodeModel,
        params,
        graph,
        dtype=jnp.float32,
        mode: Optional[str] = None,
        backend: str = "xla",
    ):
        import numpy as np

        self.model_def = model_def
        self.params = params
        self.graph = graph
        self.dtype = dtype
        if mode is None:
            mode = "dense" if graph.n_pad <= DENSE_THRESHOLD else "ell"
        self.mode = mode
        self.backend = backend  # "xla" | "pallas" (dense mode only)
        # host-side precompute (numpy — no device compiles at init time)
        w0 = np.asarray(params["conv"][0]["weight"])
        x_np = np.asarray(graph.x)[:, : model_def.convs[0].in_features]
        self.xw0 = jnp.asarray(x_np @ w0.T, dtype=dtype)  # [N, C1]
        self.table = build_neighbor_table(graph)
        self.adj = _dense_adjacency(graph, dtype) if mode == "dense" else None
        # receiver-sorted COO for the per-sample layers (>=2) on the ELL path
        # (also used by edge problems on dense-mode engines): segment-sum over
        # sorted segments beats the unsorted scatter ~1.5x, and the
        # per-sample ELL gather would materialise [B,N,K,F]
        snd = np.asarray(graph.senders)[: graph.num_edges]
        rcv = np.asarray(graph.receivers)[: graph.num_edges]
        from ..runtime import native

        _row_ptr, col, eid = native.build_csr(graph.n_pad, snd, rcv)
        self.snd_sorted = jnp.asarray(col)  # senders grouped by receiver
        self.rcv_sorted = jnp.asarray(rcv[eid])
        self.eid_sorted = jnp.asarray(eid)  # original edge id per slot

    def _coeffs(self, masks, is_edge: bool):
        fn = gcn_coeffs_from_edge_mask if is_edge else gcn_coeffs_from_node_mask
        return jax.vmap(lambda m: fn(self.table, m.astype(jnp.float32)))(masks)

    # ------------------------------------------------------------------
    # dense-adjacency path (MXU)
    # ------------------------------------------------------------------
    def _dense_outputs(self, masks: jax.Array) -> jax.Array:
        a = self.adj  # [N, N], a[v, u] = multiplicity of edge u -> v
        m = masks.astype(jnp.float32)  # [B, N]
        deg = 1.0 + m * jnp.einsum(
            "vu,bu->bv", a, m, preferred_element_type=jnp.float32
        )
        dis = jax.lax.rsqrt(deg)  # [B, N]
        self_w = dis * dis  # [B, N] = 1/deg
        if self.backend == "pallas":
            return self._dense_outputs_pallas(m * dis, self_w)
        s = (m * dis).astype(self.dtype)  # [B, N]

        def layer(feats_w, first: bool):
            # feats_w: [N, C] (first layer, batch-shared) or [B, N, C]
            if first:
                scaled = s[:, :, None] * feats_w[None, :, :].astype(self.dtype)
            else:
                scaled = s[:, :, None] * feats_w.astype(self.dtype)
            agg = jnp.einsum(
                "vu,buc->bvc", a, scaled, preferred_element_type=jnp.float32
            )
            return s.astype(jnp.float32)[:, :, None] * agg

        p0 = self.params["conv"][0]
        h = layer(self.xw0, True) + self_w[:, :, None] * self.xw0.astype(jnp.float32)
        if "bias" in p0:
            h = h + p0["bias"]
        h = relu(h)
        for conv, p in zip(self.model_def.convs[1:], self.params["conv"][1:]):
            hw = h[..., : conv.in_features] @ p["weight"].T
            h = layer(hw, False) + self_w[:, :, None] * hw
            if "bias" in p:
                h = h + p["bias"]
            h = relu(h)
        return h

    def _dense_outputs_pallas(self, s: jax.Array, self_w: jax.Array) -> jax.Array:
        """Fused Pallas path: one kernel launch per conv layer
        (:mod:`..ops.pallas_gcn`)."""
        from ..ops.pallas_gcn import masked_gcn_layer, masked_gcn_layer_batched

        adj16 = self.adj.astype(jnp.bfloat16)
        c1 = self.xw0.shape[1]
        p0 = self.params["conv"][0]
        b0 = p0.get("bias", jnp.zeros((c1,), jnp.float32))
        h = masked_gcn_layer(
            adj16, self.xw0.astype(jnp.float32), s, self_w, b0, apply_relu=True
        )
        for conv, p in zip(self.model_def.convs[1:], self.params["conv"][1:]):
            bias = p.get("bias", jnp.zeros((p["weight"].shape[0],), jnp.float32))
            h = masked_gcn_layer_batched(
                adj16,
                h[..., : conv.in_features],
                p["weight"].T,
                s,
                self_w,
                bias,
                apply_relu=True,
            )
        return h

    def batch_node_outputs(
        self, masks: jax.Array, is_edge: bool = False, g0: Optional[jax.Array] = None
    ) -> jax.Array:
        """Per-node backbone outputs for a chunk of masks: [B, N, C_last].

        ``g0``: the batch-shared first-layer gather ``xw0[nbr]`` — pass it in
        when calling from inside a scan/map body so the (expensive) gather is
        computed once outside the loop rather than per chunk."""
        if self.mode == "dense" and not is_edge:
            return self._dense_outputs(masks)
        coeff, self_w = self._coeffs(masks, is_edge)  # [B,N,K], [B,N]
        coeff = coeff.astype(self.dtype)
        p0 = self.params["conv"][0]
        if g0 is None:
            g0 = self.xw0[self.table.nbr]
        h = ell_aggregate_shared(coeff, g0)
        h = h + self_w[:, :, None] * self.xw0.astype(jnp.float32)
        if "bias" in p0:
            h = h + p0["bias"]
        h = relu(h)
        if len(self.model_def.convs) > 1:
            # per-edge norm coefficients over the receiver-sorted COO
            snd_s, rcv_s = self.snd_sorted, self.rcv_sorted
            dis = jnp.sqrt(self_w)  # [B, N] — deg^-1/2
            mf = masks.astype(jnp.float32)
            if is_edge:
                w_be = mf[:, self.eid_sorted]
            else:
                w_be = mf[:, snd_s] * mf[:, rcv_s]
            w_be = w_be * (snd_s != rcv_s)[None, :]
            norm_eb = (w_be * dis[:, snd_s] * dis[:, rcv_s]).T  # [E, B]
            n = h.shape[1]
            b = masks.shape[0]

            def agg(hw):
                # batch-contiguous SpMM: activations transposed to [N, B, F]
                # so every edge gather touches one contiguous B*F row —
                # measured ~2.2x faster than per-sample vmapped scatter
                # (129 ms -> 59 ms per 8x1M-edge chunk on v5e)
                f_dim = hw.shape[-1]
                hw_t = jnp.transpose(hw, (1, 0, 2)).astype(self.dtype)  # [N,B,F]
                msg = hw_t[snd_s] * norm_eb[:, :, None].astype(self.dtype)
                out_t = jax.ops.segment_sum(
                    msg.reshape(-1, b * f_dim).astype(jnp.float32),
                    rcv_s,
                    num_segments=n,
                    indices_are_sorted=True,
                )
                return jnp.transpose(out_t.reshape(n, b, f_dim), (1, 0, 2))

        for conv, p in zip(self.model_def.convs[1:], self.params["conv"][1:]):
            hw = h[..., : conv.in_features] @ p["weight"].T
            h = agg(hw)
            h = h + self_w[:, :, None] * hw
            if "bias" in p:
                h = h + p["bias"]
            h = relu(h)
        return h

    def query_outputs(
        self,
        masks: jax.Array,
        query: Optional[int],
        problem: str = "node_prediction",
        chunk_size: int = 128,
    ) -> jax.Array:
        """[B] query predictions (or pooled graph predictions)."""
        is_edge = "edge" in problem
        is_graph = "graph" in problem
        nvalid = self.graph.node_mask.astype(jnp.float32)
        # hoist the batch-shared gather OUT of the chunk loop
        g0 = self.xw0[self.table.nbr] if self.mode != "dense" else None

        def run_chunk(mchunk):
            h = self.batch_node_outputs(mchunk, is_edge, g0=g0)
            if is_graph:
                out = self.model_def.head(self.params, h)  # [b, N, out]
                s = (out[..., 0] * nvalid).sum(-1) / jnp.maximum(nvalid.sum(), 1.0)
                return s
            hq = h[:, query, :]  # head on the query row only
            return self.model_def.head(self.params, hq)[:, 0]

        m_total = masks.shape[0]
        if m_total % chunk_size == 0 and m_total > chunk_size:
            chunks = masks.reshape(m_total // chunk_size, chunk_size, masks.shape[1])
            return jax.lax.map(run_chunk, chunks).reshape(m_total)
        return run_chunk(masks)

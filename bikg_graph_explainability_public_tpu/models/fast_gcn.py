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

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ell import (
    build_neighbor_table,
    ell_aggregate_shared,
    gcn_coeffs_from_edge_mask,
    gcn_coeffs_from_node_mask,
)
from .gnn import GCNNodeModel
from .layers import relu
from ..graph import host_view


def _dense_adjacency(graph, dtype) -> jax.Array:
    """Dense [N_pad, N_pad] adjacency (receiver-major, data self-loops
    excluded, duplicate edges counted) built host-side."""
    import numpy as np

    n = graph.n_pad
    hv = host_view(graph)
    snd = hv.senders[: graph.num_edges]
    rcv = hv.receivers[: graph.num_edges]
    keep = snd != rcv
    a = np.zeros((n, n), np.float32)
    np.add.at(a, (rcv[keep], snd[keep]), 1.0)
    return jnp.asarray(a, dtype=dtype)


#: below this padded node count, use the dense-adjacency MXU formulation
DENSE_THRESHOLD = 4096

#: skip the receptive-field plan when the degree-rows matrix would exceed
#: this many entries (Ps x N_pad) — fall back to the unrestricted path
_PLAN_DEG_ENTRY_CAP = 1 << 25


class QueryPlan(NamedTuple):
    """Receptive-field restriction for one query node.

    A GCN output at the query depends only on nodes within L hops (L = conv
    layers): conv layer ``i`` (0-based) needs rows at in-distance <= L-1-i,
    the normalised mask scale ``s`` is read at distance <= L, and degrees at
    distance <= L read raw mask bits of distance <= L+1 — exactly why the
    reference extracts an (L+1)-hop computational graph (``data.py:328``).
    Everything here is ordered by BFS in-distance with the query at row 0, so
    each layer's support is a *prefix* and padding rows (next-nearest real
    nodes) receive zero adjacency coefficients automatically.

    vp:       [Ps] int32 node ids, distance-ordered (query first)
    a_deg:    [Ps, N_pad] adjacency rows at vp (multiplicity, no self-loops)
    a_layers: per conv layer i: [P_0, Ps] (i=0) / [P_i, P_{i-1}] (i>0)
    p_sizes:  (P_0, ..., P_{L-1}) padded prefix lengths
    """

    vp: np.ndarray
    a_deg: np.ndarray
    a_layers: Tuple[np.ndarray, ...]
    p_sizes: Tuple[int, ...]


def _ball_geometry(graph, query: int, num_layers: int):
    """Shared BFS geometry for all plan builders: in-distance from the query,
    distance-ordered padded support ``vp`` (query first), position map, and
    per-layer padded prefix sizes."""
    from ..runtime import native

    n = graph.n_pad
    hv = host_view(graph)
    snd = hv.senders[: graph.num_edges]
    rcv = hv.receivers[: graph.num_edges]
    row_ptr, col, _eid = hv.csr()
    dist = native.bfs_levels_csr(n, row_ptr, col, query, num_layers)
    # pow2 buckets: plan array shapes repeat across queries, so the jitted
    # restricted forward (plan arrays as *arguments*) hits the compile cache
    from ..utils.padding import round_up_pow2

    p_s = min(round_up_pow2(int((dist <= num_layers).sum())), n)
    order = np.argsort(dist, kind="stable").astype(np.int32)
    vp = order[:p_s]
    pos = np.full(n, -1, np.int64)
    pos[vp] = np.arange(p_s)
    p_sizes = []
    prev = p_s
    for i in range(num_layers):
        k = int((dist <= num_layers - 1 - i).sum())
        p = min(round_up_pow2(k), prev, n)
        p_sizes.append(p)
        prev = p
    return snd, rcv, vp, pos, p_s, tuple(p_sizes)


def _build_query_plan(graph, query: int, num_layers: int) -> Optional[QueryPlan]:
    """Host-side BFS + adjacency slicing (numpy/C++; no device compiles)."""
    n = graph.n_pad
    snd, rcv, vp, pos, p_s, p_sizes = _ball_geometry(graph, query, num_layers)
    if p_s * n > _PLAN_DEG_ENTRY_CAP:
        return None
    # adjacency slices (multi-edge multiplicity kept, self-loops dropped —
    # identical conventions to _dense_adjacency / build_neighbor_table)
    keep = snd != rcv
    s_k, r_k = snd[keep], rcv[keep]
    rcv_pos = pos[r_k]  # position of receiver in vp, -1 if outside
    in_vp = rcv_pos >= 0
    a_deg = np.zeros((p_s, n), np.float32)
    np.add.at(a_deg, (rcv_pos[in_vp], s_k[in_vp]), 1.0)
    a_layers = []
    snd_pos = pos[s_k]
    prev = p_s
    for i, p in enumerate(p_sizes):
        sel = (rcv_pos >= 0) & (rcv_pos < p) & (snd_pos >= 0) & (snd_pos < prev)
        a_i = np.zeros((p, prev), np.float32)
        np.add.at(a_i, (rcv_pos[sel], snd_pos[sel]), 1.0)
        a_layers.append(a_i)
        prev = p
    # plans hold NUMPY arrays: they are cached across jit traces, and jnp
    # constants created inside one trace must not leak into another
    return QueryPlan(
        vp=vp,
        a_deg=a_deg,
        a_layers=tuple(a_layers),
        p_sizes=p_sizes,
    )


#: per-chunk intermediate budget for auto-grown restricted chunks
_RESTRICT_CHUNK_BYTES = 256 * 1024 * 1024


class EdgeQueryPlan(NamedTuple):
    """Receptive-field restriction for edge-masked forwards.

    Same BFS geometry as :class:`QueryPlan`, but the per-sample adjacency is
    rebuilt from the edge mask as a one-hot contraction over the (few) edges
    inside the ball: gathered mask bits [B, E_i] @ one-hot placement matrix
    [E_i, P_i * P_{i-1}] -> the layer's per-sample adjacency.  (A batched
    scatter-add formulation faults the TPU runtime inside ``lax.scan``;
    one-hot matmuls are also the more MXU-native shape.)  deg rows likewise.
    """

    vp: np.ndarray
    p_sizes: Tuple[int, ...]
    deg_eid: np.ndarray
    deg_onehot: np.ndarray
    layer_eid: Tuple[np.ndarray, ...]
    layer_onehot: Tuple[np.ndarray, ...]


def _pad16(*arrays):
    n = arrays[0].shape[0]
    p = max(16, -(-n // 16) * 16)
    val = np.zeros(p, np.float32)
    val[:n] = 1.0
    out = []
    for a in arrays:
        b = np.zeros(p, a.dtype)
        b[:n] = a
        out.append(b)
    return out + [val]


def _build_edge_query_plan(
    graph, query: int, num_layers: int
) -> Optional[EdgeQueryPlan]:
    snd, rcv, vp, pos, p_s, p_sizes = _ball_geometry(graph, query, num_layers)
    eids = np.arange(graph.num_edges, dtype=np.int32)
    keep = snd != rcv
    s_k, r_k, e_k = snd[keep], rcv[keep], eids[keep]
    rcv_pos, snd_pos = pos[r_k], pos[s_k]

    def onehot(sel_rows, sel_cols, sel_eid, rows, cols):
        rp, cp, ei, val = _pad16(
            sel_rows.astype(np.int32), sel_cols.astype(np.int32), sel_eid
        )
        oh = np.zeros((rp.shape[0], rows * cols), np.float32)
        oh[np.arange(rp.shape[0]), rp * cols + cp] = val
        return ei.astype(np.int32), oh

    in_deg = rcv_pos >= 0
    deg_eid, deg_onehot = onehot(
        rcv_pos[in_deg], np.zeros(in_deg.sum(), np.int64), e_k[in_deg], p_s, 1
    )
    layer_eid, layer_onehot = [], []
    prev = p_s
    for p in p_sizes:
        sel = (rcv_pos >= 0) & (rcv_pos < p) & (snd_pos >= 0) & (snd_pos < prev)
        ei, oh = onehot(rcv_pos[sel], snd_pos[sel], e_k[sel], p, prev)
        layer_eid.append(ei)
        layer_onehot.append(oh)
        prev = p
    return EdgeQueryPlan(
        vp=vp,
        p_sizes=p_sizes,
        deg_eid=deg_eid,
        deg_onehot=deg_onehot,
        layer_eid=tuple(layer_eid),
        layer_onehot=tuple(layer_onehot),
    )


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
        restrict: bool = True,
        spmm_backend: Optional[str] = None,
    ):
        import numpy as np

        self.restrict = restrict  # receptive-field query plans on/off
        #: aggregation backend for ELL-mode layers >= 2 ("xla" | "pallas" |
        #: "auto"; None = the process-global ops.spmm registry setting)
        self.spmm_backend = spmm_backend
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
        x_np = host_view(graph).x[:, : model_def.convs[0].in_features]
        self.xw0 = jnp.asarray(x_np @ w0.T, dtype=dtype)  # [N, C1]
        self.table = build_neighbor_table(graph)
        self.adj = _dense_adjacency(graph, dtype) if mode == "dense" else None
        # receiver-sorted COO for the per-sample layers (>=2) on the ELL path
        # (also used by edge problems on dense-mode engines): segment-sum over
        # sorted segments beats the unsorted scatter ~1.5x, and the
        # per-sample ELL gather would materialise [B,N,K,F]
        hv = host_view(graph)
        snd = hv.senders[: graph.num_edges]
        rcv = hv.receivers[: graph.num_edges]
        from ..runtime import native

        _row_ptr, col, eid = native.build_csr(graph.n_pad, snd, rcv)
        self.snd_sorted = jnp.asarray(col)  # senders grouped by receiver
        self.rcv_sorted = jnp.asarray(rcv[eid])
        self.eid_sorted = jnp.asarray(eid)  # original edge id per slot
        # neighbour table re-indexed into receiver-sorted edge positions so
        # the Pallas blocked-ELL backend can gather the per-chunk [E, B]
        # norm weights (which live in sorted order) by slot
        inv = np.zeros(graph.e_pad, np.int32)
        inv[eid] = np.arange(len(eid), dtype=np.int32)
        self.table_sorted = self.table._replace(
            eid=jnp.asarray(inv)[self.table.eid]
        )
        self._plans: dict = {}  # query -> Optional[QueryPlan]
        self._edge_plans: dict = {}  # query -> Optional[EdgeQueryPlan]

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
            n = h.shape[1]
            b = masks.shape[0]
            if is_edge:
                # per-edge masks are NOT separable — weighted path.  The
                # slot-layout weights already exist as the coeff tensor
                # (gcn_coeffs_from_edge_mask, computed for layer 1 above);
                # one [B, N*K] -> [N*K, B] transpose (~2 ms at 100k/1M)
                # replaces the [E, B] build + the kernel-side eid re-index
                # gather (20-189 ms measured)
                from ..ops.spmm import _use_pallas

                use_pal = _use_pallas(
                    self.spmm_backend, self.table, b * h.shape[-1]
                )
                norm_eb = None
                w_slot_nkb = None
                if use_pal:
                    kk = self.table.k
                    w_slot_nkb = jnp.transpose(
                        coeff.astype(jnp.float32).reshape(b, n * kk)
                    ).reshape(n, kk, b)
                else:
                    w_be = mf[:, self.eid_sorted]
                    w_be = w_be * (snd_s != rcv_s)[None, :]
                    norm_eb = (w_be * dis[:, snd_s] * dis[:, rcv_s]).T
            else:
                # node masks ARE: w[e] = a[snd]*a[rcv], a = mask * deg^-1/2
                a_bn = mf * dis  # [B, N]

            def agg(hw):
                # batch-contiguous SpMM: activations transposed to [N, B*F]
                # so every edge touches one contiguous row.  Routed through
                # the spmm backend registry: on TPU with wide rows this is
                # the blocked-ELL Pallas DMA-gather kernel; elsewhere the
                # XLA path.  Node problems use the rank-1 separable form
                # (static slot weights — no per-call weight re-index).
                from ..ops.spmm import (
                    gather_sum_batched_separable,
                    weighted_gather_sum_batched,
                )

                f_dim = hw.shape[-1]
                hw_t = (
                    jnp.transpose(hw, (1, 0, 2))
                    .astype(self.dtype)
                    .reshape(n, b * f_dim)
                )
                if is_edge:
                    out_t = weighted_gather_sum_batched(
                        None if norm_eb is None else norm_eb.astype(self.dtype),
                        hw_t,
                        snd_s,
                        rcv_s,
                        n,
                        b,
                        table=self.table_sorted,
                        backend=self.spmm_backend,
                        w_slot=w_slot_nkb,
                    )
                else:
                    out_t = gather_sum_batched_separable(
                        a_bn,
                        hw_t,
                        snd_s,
                        rcv_s,
                        n,
                        b,
                        table=self.table_sorted,
                        backend=self.spmm_backend,
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

    def query_plan(self, query: int) -> Optional[QueryPlan]:
        """Receptive-field plan for ``query`` (cached; None if infeasible)."""
        q = int(query)
        if q not in self._plans:
            self._plans[q] = _build_query_plan(
                self.graph, q, len(self.model_def.convs)
            )
        return self._plans[q]

    def _restricted_outputs(self, masks: jax.Array, plan: QueryPlan) -> jax.Array:
        """Node-masked forward on the query's receptive field only: [B] query
        predictions.  Mathematically identical to the full forward (the
        output cannot depend on nodes outside the field) at a fraction of the
        FLOPs — the dominant [B,N,C] layer work shrinks to [B,P,C] with
        P = padded ball size."""
        m = masks.astype(jnp.float32)  # [B, N_pad]
        mv = m[:, plan.vp]  # [B, Ps]
        deg = 1.0 + mv * jnp.einsum(
            "kn,bn->bk", plan.a_deg, m, preferred_element_type=jnp.float32
        )
        dis = jax.lax.rsqrt(deg)
        self_w = dis * dis
        s = mv * dis  # [B, Ps]
        p0 = self.params["conv"][0]
        xw0_v = self.xw0[plan.vp]  # [Ps, C1]
        n0 = plan.p_sizes[0]
        a0s = plan.a_layers[0][None] * s[:, None, :]  # [B, P0, Ps]
        agg = jnp.einsum(
            "bkv,vc->bkc", a0s, xw0_v, preferred_element_type=jnp.float32
        )
        h = s[:, :n0, None] * agg + self_w[:, :n0, None] * xw0_v[:n0]
        if "bias" in p0:
            h = h + p0["bias"]
        h = relu(h)
        prev = n0
        for i, (conv, p) in enumerate(
            zip(self.model_def.convs[1:], self.params["conv"][1:]), start=1
        ):
            hw = h[..., : conv.in_features] @ p["weight"].T  # [B, prev, C]
            ni = plan.p_sizes[i]
            agg = jnp.einsum(
                "kv,bvc->bkc",
                plan.a_layers[i],
                s[:, :prev, None] * hw,
                preferred_element_type=jnp.float32,
            )
            h = s[:, :ni, None] * agg + self_w[:, :ni, None] * hw[:, :ni]
            if "bias" in p:
                h = h + p["bias"]
            h = relu(h)
            prev = ni
        # query sits at row 0 of every prefix
        return self.model_def.head(self.params, h[:, 0, :])[:, 0]

    def edge_query_plan(self, query: int) -> Optional[EdgeQueryPlan]:
        """Receptive-field plan for edge-masked forwards (cached; None when infeasible)."""
        q = int(query)
        if q not in self._edge_plans:
            self._edge_plans[q] = _build_edge_query_plan(
                self.graph, q, len(self.model_def.convs)
            )
        return self._edge_plans[q]

    def _restricted_edge_outputs(
        self, masks: jax.Array, plan: EdgeQueryPlan
    ) -> jax.Array:
        """Edge-masked forward restricted to the query's receptive field.

        The per-sample adjacency of each layer is rebuilt from the edge mask
        by a one-hot contraction (reference edge-perturbation semantics:
        drop masked edges, unit self-loops always on, ``data.py:500-554``).
        """
        m = masks.astype(jnp.float32)  # [B, E_pad]
        b = m.shape[0]
        deg = 1.0 + jnp.einsum(
            "be,ek->bk",
            m[:, plan.deg_eid],
            plan.deg_onehot,
            preferred_element_type=jnp.float32,
        )
        dis = jax.lax.rsqrt(deg)  # [B, Ps]
        self_w = dis * dis
        xw0_v = self.xw0[plan.vp]
        p0 = self.params["conv"][0]

        def layer_adj(i, prev, ni):
            a = jnp.einsum(
                "be,ep->bp",
                m[:, plan.layer_eid[i]],
                plan.layer_onehot[i],
                preferred_element_type=jnp.float32,
            ).reshape(b, ni, prev)
            return a * dis[:, :ni, None] * dis[:, None, :prev]

        n0 = plan.p_sizes[0]
        a0s = layer_adj(0, plan.vp.shape[0], n0)
        agg = jnp.einsum(
            "bkv,vc->bkc", a0s, xw0_v, preferred_element_type=jnp.float32
        )
        h = agg + self_w[:, :n0, None] * xw0_v[:n0]
        if "bias" in p0:
            h = h + p0["bias"]
        h = relu(h)
        prev = n0
        for i, (conv, p) in enumerate(
            zip(self.model_def.convs[1:], self.params["conv"][1:]), start=1
        ):
            hw = h[..., : conv.in_features] @ p["weight"].T
            ni = plan.p_sizes[i]
            agg = jnp.einsum(
                "bkv,bvc->bkc",
                layer_adj(i, prev, ni),
                hw,
                preferred_element_type=jnp.float32,
            )
            h = agg + self_w[:, :ni, None] * hw[:, :ni]
            if "bias" in p:
                h = h + p["bias"]
            h = relu(h)
            prev = ni
        return self.model_def.head(self.params, h[:, 0, :])[:, 0]

    def _plan_row_bytes(self, plan, n_cols: int, is_edge: bool) -> int:
        """Estimated f32 bytes of restricted-forward intermediates PER mask
        row — sizes the auto-grown chunk (see ``query_outputs``)."""
        c1 = max(
            self.xw0.shape[1],
            max(w["weight"].shape[0] for w in self.params["conv"]),
        )
        sizes = list(plan.p_sizes)
        ps = int(plan.vp.shape[0])
        prevs = [ps] + sizes[:-1]
        if is_edge:
            width = (
                sum(p * pv for p, pv in zip(sizes, prevs))
                + 2 * sum(p * c1 for p in sizes)
                + int(plan.deg_onehot.shape[0])
            )
        else:
            width = ps * c1 + 3 * sum(p * c1 for p in sizes)
        return 4 * (n_cols + width)

    def query_outputs(
        self,
        masks: jax.Array,
        query: Optional[int],
        problem: str = "node_prediction",
        chunk_size: int = 128,
        auto_chunk: bool = True,
    ) -> jax.Array:
        """[B] query predictions (or pooled graph predictions).

        ``auto_chunk=False`` pins the restricted path to exactly
        ``chunk_size`` rows per compiled step — callers that set an explicit
        ``forward_chunk`` keep their memory bound even if the byte estimate
        would permit growth."""
        is_edge = "edge" in problem
        is_graph = "graph" in problem
        if self.restrict and not is_graph and isinstance(query, (int, np.integer)):
            plan = (
                self.edge_query_plan(int(query))
                if is_edge
                else self.query_plan(int(query))
            )
            if plan is not None:
                step = (
                    self._restricted_edge_outputs
                    if is_edge
                    else self._restricted_outputs
                )
                m_total = masks.shape[0]
                # restricted intermediates scale with the (small) ball, not
                # N — at the default chunk every einsum is dispatch-bound
                # (~1.3 us/op floor; 12% MFU measured at chunk=250 on the
                # 2048-node bench).  Grow the chunk by doubling while the
                # estimated per-chunk footprint stays under budget, keeping
                # the equal-chunks contract (m_total % chunk == 0).
                chunk_r = chunk_size
                if auto_chunk:
                    cap = max(
                        1, _RESTRICT_CHUNK_BYTES // self._plan_row_bytes(
                            plan, masks.shape[1], is_edge
                        )
                    )
                    if m_total <= cap:
                        chunk_r = m_total
                    else:
                        while (
                            chunk_r * 2 <= cap
                            and m_total % (chunk_r * 2) == 0
                        ):
                            chunk_r *= 2
                if m_total % chunk_r == 0 and m_total > chunk_r:
                    chunks = masks.reshape(
                        m_total // chunk_r, chunk_r, masks.shape[1]
                    )
                    return jax.lax.map(
                        lambda c: step(c, plan), chunks
                    ).reshape(m_total)
                return step(masks, plan)
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

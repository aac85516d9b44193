"""Blocked-ELL Pallas SpMM: the TPU-native sparse aggregation kernel.

``out[v] = sum_k w[v,k] * feats[nbr[v,k]]`` over a padded neighbour table
(:class:`.ell.NeighborTable`) — the role torch-scatter/torch-sparse play for
the reference (``/root/reference/dev_setup.sh:6-8``).

Design (measured on v5e, see ``benchmarks/exp_spmm_kernels.py`` +
``docs/spmm_kernel.md``):

* XLA's batched gather+segment-sum runs at ~82 GB/s effective on 1M random
  4 KB rows; a Pallas kernel issuing one HBM->VMEM DMA per row sustains
  ~18 ns/DMA (~55 M rows/s), i.e. ~220 GB/s at 4 KB rows and approaching
  HBM speed-of-light as rows widen.  The crossover is the row payload: at
  W >= ~512 floats the DMA gather wins; below that XLA's gather does.
  The framework's batched hot shape — layer>=2 aggregation over
  batch-contiguous ``[N, B*F]`` rows (``models/fast_gcn.py``) — sits well
  above the crossover.
* Grid over row blocks of TR rows, sequential on core.  Per block the
  **compact DMA plan** lists the block's real slots contiguously
  (``src`` node id + ``dst`` slot position, built host-side once per
  table): full chunks of G DMAs issue with *zero* per-slot branching and
  only the tail chunk predicates per slot.  A per-slot ``@pl.when`` over
  the padded table costs ~30 ns of scalar work per slot and was measured
  to *double* total time — ELL padding must cost VMEM, never issue rate.
* The weighted reduction over K is one vectorized VPU pass in the padded
  positional layout (no scatter — receivers are implicit).  Slots that were
  never DMA'd hold stale bits; a ``where(w != 0)`` select (not a multiply)
  zeroes them even if the stale bits are non-finite.
* Feature rows are viewed as ``[N, W/128, 128]`` so single-row HBM slices
  are whole (sublane, lane) tiles for any W multiple of 128.

``spmm_ell_pallas`` is the raw kernel; ``batched_gather_sum`` is the
backend entry used by :func:`.spmm.weighted_gather_sum_batched` when the
``pallas`` backend is selected (see ``config.spmm_backend``).
"""

from __future__ import annotations

import functools
import weakref
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: measured crossover (v5e): below this row width XLA's gather wins
MIN_PALLAS_WIDTH = 512

#: VMEM budget for the gather scratch (bytes)
_GBUF_BYTES = 8 * 1024 * 1024

#: DMA chunk size (outstanding copies per double-buffer slot)
_G = 32


class CompactPlan(NamedTuple):
    """Host-built compact DMA plan for one (NeighborTable, TR) pair.

    src:  [NB * TR*K] int32 — source node id per issued DMA, block-compact
          (block i's real slots occupy the front of its [i*TRK, (i+1)*TRK)
          range; the rest is unused padding)
    dst:  [NB * TR*K] int32 — destination slot position within the block's
          [TR*K] gather buffer
    cnt:  [NB] int32 — real slots per block
    tr:   rows per block (static)

    Arrays are NUMPY on purpose: plans are cached across jit traces, and
    jnp constants created inside one trace must not leak into another.
    """

    src: np.ndarray
    dst: np.ndarray
    cnt: np.ndarray
    tr: int


def _pick_tr(k: int, w_width: int) -> int:
    tr = _GBUF_BYTES // max(k * w_width * 4, 1)
    tr = (tr // 8) * 8
    return max(min(tr, 64), 0)


def build_compact_plan(
    nbr: np.ndarray, valid: np.ndarray, tr: int
) -> CompactPlan:
    """Build the compact DMA plan host-side (numpy) from ELL table arrays."""
    n, k = nbr.shape
    n_pad = -(-n // tr) * tr
    nb = n_pad // tr
    trk = tr * k
    v = np.zeros((n_pad, k), bool)
    v[:n] = valid > 0
    nb_full = np.zeros((n_pad, k), np.int32)
    nb_full[:n] = nbr
    src = np.zeros((nb, trk), np.int32)
    dst = np.zeros((nb, trk), np.int32)
    cnt = np.zeros((nb,), np.int32)
    vb = v.reshape(nb, trk)
    nbb = nb_full.reshape(nb, trk)
    for i in range(nb):
        slots = np.nonzero(vb[i])[0].astype(np.int32)
        c = len(slots)
        src[i, :c] = nbb[i][slots]
        dst[i, :c] = slots
        cnt[i] = c
    return CompactPlan(
        src=src.reshape(-1), dst=dst.reshape(-1), cnt=cnt, tr=tr
    )


def _kernel(cnt_ref, src_hbm, dst_hbm, w_ref, x_hbm, out_ref,
            src_smem, dst_smem, gbuf, idx_sems, sems,
            *, tr, k, b, f, g, wb):
    ib = pl.program_id(0)
    rows = tr * k
    src_dma = pltpu.make_async_copy(
        src_hbm.at[pl.ds(ib * rows, rows)], src_smem, idx_sems.at[0]
    )
    dst_dma = pltpu.make_async_copy(
        dst_hbm.at[pl.ds(ib * rows, rows)], dst_smem, idx_sems.at[1]
    )
    src_dma.start()
    dst_dma.start()
    src_dma.wait()
    dst_dma.wait()

    cnt = cnt_ref[ib]
    nch = cnt // g  # full chunks; tail handled separately

    def row_dma(rr, j, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(src_smem[rr], 1)],
            gbuf.at[pl.ds(dst_smem[rr], 1)],
            sems.at[slot, j],
        )

    def start_chunk(ci):
        base = ci * g
        slot = ci % 2
        for j in range(g):
            row_dma(base + j, j, slot).start()

    def wait_chunk(ci):
        base = ci * g
        slot = ci % 2
        for j in range(g):
            row_dma(base + j, j, slot).wait()

    @pl.when(nch > 0)
    def _():
        start_chunk(0)

    def body(ci, _):
        @pl.when(ci + 1 < nch)
        def _():
            start_chunk(ci + 1)

        wait_chunk(ci)
        return 0

    jax.lax.fori_loop(0, nch, body, 0, unroll=False)

    # tail: per-slot predication is confined to < G slots per block
    tail_base = nch * g
    for j in range(g):
        @pl.when(tail_base + j < cnt)
        def _():
            row_dma(tail_base + j, j, 0).start()

    for j in range(g):
        @pl.when(tail_base + j < cnt)
        def _():
            row_dma(tail_base + j, j, 0).wait()

    # one vectorized weighted reduce over the K axis.  Never-DMA'd slots
    # hold stale (possibly non-finite) bits; the select — not a multiply —
    # guarantees they contribute exact zeros.  ``wb == 1`` is the static-
    # weight (separable) mode: one weight per slot broadcast over samples.
    g4 = gbuf[:].reshape(tr, k, b, f)
    wk = w_ref[:].reshape(tr, k, wb)[:, :, :, None]
    msg = jnp.where(wk != 0.0, wk * g4, 0.0)
    out_ref[:] = msg.sum(axis=1).reshape(tr, b * f)


@functools.partial(
    jax.jit, static_argnames=("k", "tr", "b", "interpret")
)
def spmm_ell_pallas(
    plan_src: jax.Array,   # CompactPlan.src
    plan_dst: jax.Array,   # CompactPlan.dst
    plan_cnt: jax.Array,   # CompactPlan.cnt
    w_slot: jax.Array,     # [N, K, B] float32 per-slot per-sample weights
    feats: jax.Array,      # [N_src, W] float32, W = B*F, W % 128 == 0
    k: int,
    tr: int,
    b: int = 1,
    interpret: bool = False,
) -> jax.Array:            # [N, W]
    """Blocked-ELL SpMM kernel: out[v] = sum_k w[v,k] * feats[nbr[v,k]]."""
    n = w_slot.shape[0]
    w_width = feats.shape[1]
    f = w_width // b
    wb = w_slot.shape[2]  # b, or 1 in static/separable mode
    n_pad = -(-n // tr) * tr
    if n_pad != n:
        w_slot = jnp.pad(w_slot, ((0, n_pad - n), (0, 0), (0, 0)))
    g = _G
    while (tr * k) % g:
        g //= 2
    kern = functools.partial(_kernel, tr=tr, k=k, b=b, f=f, g=g, wb=wb)
    x3 = feats.reshape(feats.shape[0], w_width // 128, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // tr,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # src (flat, HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # dst (flat, HBM)
            pl.BlockSpec((tr * k, wb), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),  # w_slot
            pl.BlockSpec(memory_space=pl.ANY),  # feats (HBM)
        ],
        out_specs=pl.BlockSpec((tr, w_width), lambda i, c: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((tr * k,), jnp.int32),
            pltpu.SMEM((tr * k,), jnp.int32),
            pltpu.VMEM((tr * k, w_width // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, g)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, w_width), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_GBUF_BYTES * 1.8) + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(plan_cnt, plan_src, plan_dst, w_slot.reshape(n_pad * k, wb), x3)
    return out[:n]


_PLAN_CACHE: dict = {}


def _cache_by_identity(cache: dict, anchor, key_extra: tuple, build):
    """id()-keyed cache with finalizer eviction.

    A bare ``id()`` key is unsafe: CPython reuses addresses after GC, so a
    new array allocated where an old table's array lived would silently hit
    the stale entry (and the cache would grow without bound).  Registering a
    ``weakref.finalize`` on the anchor object evicts the entry the moment the
    anchor dies, so a live key always refers to the object it was built for.
    """
    key = (id(anchor),) + key_extra
    val = cache.get(key)
    if val is None:
        val = build()
        cache[key] = val
        weakref.finalize(anchor, cache.pop, key, None)
    return val


def plan_for_table(table, w_width: int) -> Optional[CompactPlan]:
    """CompactPlan for a NeighborTable at the given row payload (cached by
    table identity; returns None when K blows the VMEM budget)."""
    tr = _pick_tr(table.k, w_width)
    if tr == 0:
        return None
    return _cache_by_identity(
        _PLAN_CACHE,
        table.nbr,
        (tr,),
        lambda: build_compact_plan(
            np.asarray(table.nbr), np.asarray(table.valid), tr
        ),
    )


def batched_gather_sum(
    table,               # NeighborTable (.nbr [N,K], .eid [N,K], .valid [N,K])
    edge_weight: jax.Array,  # [E, B] per-edge per-sample weights
    feats: jax.Array,    # [N, B*F] batch-contiguous features
    b: int,
    interpret: Optional[bool] = None,
    plan: Optional[CompactPlan] = None,
) -> jax.Array:
    """out[v] = sum over in-edges e of w[e, :] * feats[src_e] (broadcast over
    F within each sample's block) — the batched layer>=2 aggregation."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if plan is None:
        plan = plan_for_table(table, feats.shape[1])
    if plan is None:
        raise ValueError(
            f"K={table.k} too large for the VMEM gather scratch"
        )
    w_slot = edge_weight[table.eid] * table.valid[:, :, None]
    return spmm_ell_pallas(
        plan.src, plan.dst, plan.cnt, w_slot, feats,
        k=table.k, tr=plan.tr, b=b, interpret=interpret,
    )


_STATIC_WSLOT_CACHE: dict = {}


def gather_sum_static(
    table,
    feats: jax.Array,    # [N, B*F] batch-contiguous features
    b: int,
    interpret: Optional[bool] = None,
    plan: Optional[CompactPlan] = None,
) -> jax.Array:
    """out[v] = sum of feats[src] over valid slots — STATIC validity weights.

    The separable fast path: when per-edge weights factor as
    ``a[src] * a[dst]`` (GCN node masks: ``a = mask * deg^-1/2``), scale the
    feature rows by ``a`` before and the outputs after, and aggregate with
    the table's static validity only.  This removes the per-call
    ``edge_weight[table.eid]`` re-index — a 3.2M-tiny-row gather measured at
    ~20 ms on the 100k/1M workload, ~35%% of the weighted path's total.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if plan is None:
        plan = plan_for_table(table, feats.shape[1])
    if plan is None:
        raise ValueError(f"K={table.k} too large for the VMEM gather scratch")
    # NUMPY on purpose: built once per table, passed as a jit argument;
    # a traced slice cached here would leak across traces
    w1 = _cache_by_identity(
        _STATIC_WSLOT_CACHE,
        table.valid,
        (),
        lambda: np.asarray(table.valid)[:, :, None].astype(np.float32),
    )
    return spmm_ell_pallas(
        plan.src, plan.dst, plan.cnt, w1, feats,
        k=table.k, tr=plan.tr, b=b, interpret=interpret,
    )

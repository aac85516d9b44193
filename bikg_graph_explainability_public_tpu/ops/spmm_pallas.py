"""Blocked-ELL Pallas SpMM: the TPU-native sparse aggregation kernel.

``out[v] = sum_k w[v,k] * feats[nbr[v,k]]`` over a padded neighbour table
(:class:`.ell.NeighborTable`) — the role torch-scatter/torch-sparse play for
the reference (``/root/reference/dev_setup.sh:6-8``).

Design (measured on v5e, see ``benchmarks/`` + ``docs/spmm_kernel.md``):

* Random single-row gathers are bounded by DMA *issue rate* (~18 ns of
  scalar work per copy), not HBM bandwidth; a per-slot ``@pl.when`` over
  the padded table doubles that, so a **compact DMA plan** (host-built,
  real slots listed contiguously per row block) issues full chunks of G
  copies with zero per-slot branching and only predicates the tail.
* The kernel is **double-buffered across row blocks**: at grid step i the
  scalar core first drains block i's row DMAs, then issues block i+1's
  into the other gather-buffer slot, and only then reduces block i — so
  HBM transfers overlap both the reduce and the next issue loop.  Above
  ~16 KB rows the transfer time exceeds the issue time and the kernel
  crosses from issue-bound to bandwidth-bound.
* Two reduction modes over the K axis:
  - **static** (separable weights, one weight per slot): a block-diagonal
    MXU matmul — ``W[TR, TR*K] @ gbuf[TR*K, W]`` where W holds the slot
    weights on its block diagonal (built in-register from two iotas).
    ~10x the VPU pass it replaces; the gather buffer is zeroed once at
    step 0 so never-DMA'd slots contribute exact zeros (0 * stale-NaN
    through the MXU would poison the sum).
  - **weighted** (per-slot per-sample weights): the vectorized VPU
    select-reduce in the padded positional layout (receivers implicit,
    ``where(w != 0)`` zeroes stale slots even if non-finite).
* Feature rows are dtype-generic (f32 or bf16) and viewed as
  ``[N, W/128, 128]`` so single-row HBM slices are whole (sublane, lane)
  planes; bf16 rows halve bytes per issued copy.

``spmm_ell_pallas`` is the raw kernel; ``batched_gather_sum`` (weighted)
and ``gather_sum_static`` (separable) are the backend entries used by
:mod:`.spmm` when the ``pallas`` backend is selected.
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

#: VMEM budget for EACH of the two gather-scratch slots (bytes)
_GBUF_BYTES = 8 * 1024 * 1024

#: DMA chunk size (copies per unrolled issue group / semaphore lane)
_G = 32


#: DMA run-length classes, longest first (a maximal run of consecutive
#: source rows landing in consecutive gather slots is greedily decomposed
#: into these sizes; class 1 is the random-graph floor)
_RUN_CLASSES = (16, 8, 4, 2, 1)

#: counters per row block in the FLAT cnt layout: one per run class + the
#: total transferred-rows column.  cnt is 1-D [NB * _NCNT] on purpose — a
#: 2-D scalar-prefetch array is lane-padded to 128 ints per row in SMEM
#: (1.6 MB at NB=3125), which overflows the scalar core's memory.
_NCNT = len(_RUN_CLASSES) + 1


class CompactPlan(NamedTuple):
    """Host-built compact, run-coalesced DMA plan for one
    (NeighborTable, TR) pair.

    Neighbour tables sort each row's slots by source id, so consecutive
    source rows often land in consecutive gather-buffer slots (always, on
    graphs with locality in their node numbering); each maximal such run
    becomes ONE multi-row DMA.  Entries are grouped by run-length class:
    block i's entries occupy the front of row i, classes in _RUN_CLASSES
    order.

    src:  [NB, TR*K] int32 — source START node id per DMA entry
    dst:  [NB, TR*K] int32 — destination START slot within the block's
          [TR*K] gather buffer
    cnt:  [NB * _NCNT] int32, FLAT — per block: entries per run-length
          class (_RUN_CLASSES order) then total ROWS transferred (flat
          because 2-D scalar prefetch is lane-padded to 128 in SMEM)
    tr:   rows per block (static)

    Arrays are NUMPY on purpose: plans are cached across jit traces, and
    jnp constants created inside one trace must not leak into another.
    """

    src: np.ndarray
    dst: np.ndarray
    cnt: np.ndarray
    tr: int


def _pick_tr(k: int, row_bytes: int) -> int:
    """Rows per block: fills one gather slot, subject to (a) TR*K being a
    128-multiple (the [1, TR*K] static-weight block's lane dim and the MXU
    contraction) and (b) TR % 8 == 0 (output block sublanes).  K is padded
    to a multiple of 8, so the step is lcm(8, 128 / gcd(K, 128))."""
    import math

    step = max(8, 128 // math.gcd(k, 128))
    tr = _GBUF_BYTES // max(k * row_bytes, 1)
    tr = (tr // step) * step
    return max(min(tr, 64), 0)


def build_compact_plan(
    nbr: np.ndarray, valid: np.ndarray, tr: int
) -> CompactPlan:
    """Build the run-coalesced compact DMA plan host-side.

    Fully vectorized numpy (a per-block Python loop measured 117 s at 1M
    edges — this runs in well under a second): maximal runs are found on the
    flattened valid-slot stream (a run breaks on block change, non-unit slot
    step, or non-unit source step), every run is greedily decomposed into
    ``_RUN_CLASSES`` entries, and entries land block-compact, class-major via
    one stable lexsort."""
    n, k = nbr.shape
    n_pad = -(-n // tr) * tr
    nb = n_pad // tr
    trk = tr * k
    v = np.zeros((n_pad, k), bool)
    v[:n] = valid > 0
    nb_full = np.zeros((n_pad, k), np.int64)
    nb_full[:n] = nbr
    vb = v.reshape(nb, trk)
    nbb = nb_full.reshape(nb, trk)
    src = np.zeros((nb, trk), np.int32)
    dst = np.zeros((nb, trk), np.int32)
    cnt = np.zeros((nb, _NCNT), np.int32)
    cnt[:, -1] = vb.sum(1)
    flat = np.nonzero(vb.ravel())[0]
    if flat.size == 0:
        return CompactPlan(src=src, dst=dst, cnt=cnt.reshape(-1), tr=tr)
    blk = (flat // trk).astype(np.int64)
    slot = (flat % trk).astype(np.int64)
    srcs = nbb.ravel()[flat]
    brk = np.ones(flat.size, bool)
    brk[1:] = (
        (np.diff(blk) != 0) | (np.diff(slot) != 1) | (np.diff(srcs) != 1)
    )
    run_first = np.nonzero(brk)[0]
    run_len = np.diff(np.append(run_first, flat.size))
    ent_pos, ent_cls = [], []
    rem = run_len
    base = np.zeros(run_len.size, np.int64)  # consumed offset within run
    for ci, cl in enumerate(_RUN_CLASSES):
        c_cl = rem // cl
        rem = rem - c_cl * cl
        tot = int(c_cl.sum())
        if tot:
            cum = np.zeros(run_len.size + 1, np.int64)
            np.cumsum(c_cl, out=cum[1:])
            local = np.arange(tot) - np.repeat(cum[:-1], c_cl)
            ent_pos.append(np.repeat(run_first + base, c_cl) + local * cl)
            ent_cls.append(np.full(tot, ci, np.int64))
        base = base + c_cl * cl
    pos = np.concatenate(ent_pos)
    cls = np.concatenate(ent_cls)
    eb = blk[pos]
    np.add.at(cnt, (eb, cls), 1)
    # block-compact, class-major layout: stable sort by (block, class);
    # within equal keys the run order (ascending position) is preserved
    order = np.lexsort((cls, eb))
    bc = cnt[:, :-1].sum(1, dtype=np.int64)  # entries per block
    first = np.zeros(nb + 1, np.int64)
    np.cumsum(bc, out=first[1:])
    within = np.arange(pos.size) - np.repeat(first[:-1], bc)
    eb_s = eb[order]
    src[eb_s, within] = srcs[pos][order].astype(np.int32)
    dst[eb_s, within] = slot[pos][order].astype(np.int32)
    return CompactPlan(src=src, dst=dst, cnt=cnt.reshape(-1), tr=tr)


def _kernel(cnt_ref, src_ref, dst_ref, w_ref, x_hbm, out_ref,
            gbuf, sems, *, tr, k, b, f, g, wb, mxu, ablate=""):
    """One grid step ``s`` of NB+2 in the v3 triple-buffered schedule:

    1. ISSUE block s's row DMAs into slot s%3 (plan indices are this step's
       SMEM block);
    2. REDUCE block s-2 from slot (s-2)%3 — its rows were *waited* at step
       s-1, so the reduce is enqueued to the vector units BEFORE this step's
       semaphore waits: the MXU/VPU crunch block s-2 while the scalar core
       blocks on block s-1's DMAs (measured: in the v2 two-slot schedule the
       reduce and the waits serialised — full = noreduce + onlyreduce almost
       exactly, benchmarks/exp_spmm_attrib.py);
    3. WAIT block s-1's transferred rows (slot (s-1)%3).

    Slot s%3's previous reader is block s-3's reduce at step s-1, so the
    issue never overwrites rows still being read one step back.

    ``ablate`` (benchmarks/exp_spmm_attrib.py only — "" in production)
    disables pieces to attribute where the wall-clock goes: "noreduce"
    (out=0; times issue+wait+transfer), "nomatmul" (copy instead of the
    K-reduce; times everything but the reduce FLOPs), "onlyreduce" (no
    DMAs; times reduce+grid overhead on stale data), "none" (empty body;
    grid/pipeline overhead).  Ablated kernels return garbage outputs.
    """
    s = pl.program_id(0)
    nb = pl.num_programs(0) - 2
    rows = tr * k

    def start_dma(slot, rr, ln):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(src_ref[0, 0, rr], ln)],
            gbuf.at[slot, pl.ds(dst_ref[0, 0, rr], ln)],
            sems.at[slot],
        )

    # 1. issue block s's DMAs into gather slot s%3, ALL on the slot's one
    #    semaphore (DMA semaphores count bytes, so the drain below consumes
    #    whole chunks with aggregated waits).  Entries are grouped by run
    #    length: multi-row classes first (one scalar issue covers up to 16
    #    rows), then the single-row tail chunk-unrolled.
    issue_on = ablate not in ("onlyreduce", "none")
    wait_on = issue_on
    if issue_on:
        @pl.when(s < nb)
        def _():
            if mxu:
                # never-DMA'd slots flow through the matmul: 0 *
                # uninitialised-NaN would poison it, so zero the slots once
                # (afterwards stale slots hold an earlier block's finite
                # rows)
                @pl.when(s == 0)
                def _():
                    gbuf[0] = jnp.zeros_like(gbuf[0])
                    gbuf[1] = jnp.zeros_like(gbuf[1])
                    gbuf[2] = jnp.zeros_like(gbuf[2])

            slot = jax.lax.rem(s, 3)
            base = 0
            for ci, cl in enumerate(_RUN_CLASSES[:-1]):
                c_cl = cnt_ref[s * _NCNT + ci]

                def body(i, _, b0=base, ln=cl):
                    start_dma(slot, b0 + i, ln).start()
                    return 0

                jax.lax.fori_loop(0, c_cl, body, 0, unroll=False)
                base = base + c_cl
            c1 = cnt_ref[s * _NCNT + len(_RUN_CLASSES) - 1]
            nch = c1 // g

            def body1(ci, _, b0=base):
                off = b0 + ci * g
                for j in range(g):
                    start_dma(slot, off + j, 1).start()
                return 0

            jax.lax.fori_loop(0, nch, body1, 0, unroll=False)
            tail = base + nch * g
            for j in range(g):
                @pl.when(nch * g + j < c1)
                def _():
                    start_dma(slot, tail + j, 1).start()

    if ablate == "none":
        return

    # 2. reduce block s-2 (waited last step) — enqueued to the vector units
    #    before the scalar core blocks on block s-1's semaphore below
    @pl.when(s >= 2)
    def _():
        slot = jax.lax.rem(s - 2, 3)
        if ablate == "noreduce":
            out_ref[:] = jnp.zeros_like(out_ref)
        elif ablate == "nomatmul":
            out_ref[:] = gbuf[slot, :tr].reshape(tr, b * f).astype(jnp.float32)
        elif ablate == "sumreduce":
            out_ref[:] = (
                gbuf[slot].astype(jnp.float32).reshape(tr, k, b * f).sum(1)
            )
        elif mxu:
            # block-diagonal MXU reduce: W[t, j] = w[j] where j // K == t
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (tr, rows), 0)
            seg_ids = jax.lax.broadcasted_iota(jnp.int32, (tr, rows), 1) // k
            wrow = jnp.broadcast_to(w_ref[0], (tr, rows))
            g2 = gbuf[slot].reshape(rows, b * f)
            wmat = jnp.where(seg_ids == row_ids, wrow, 0.0).astype(g2.dtype)
            # DEFAULT precision: on TPU an f32 dot runs as single-pass bf16
            # with f32 accumulation (~2e-3 rel err, same class as the bf16
            # production forwards).  HIGHEST would 6x the MXU passes and the
            # block-diagonal form already carries a TR-fold FLOP redundancy —
            # measured MXU-bound at 53 ms vs 20 ms for the whole kernel.
            out_ref[:] = jnp.dot(wmat, g2, preferred_element_type=jnp.float32)
        else:
            # vectorized VPU select-reduce; the select (not a multiply)
            # zeroes never-DMA'd slots even when stale bits are non-finite
            g4 = gbuf[slot].reshape(tr, k, b, f)
            wk = w_ref[:].reshape(tr, k, wb)[:, :, :, None]
            msg = jnp.where(wk != 0.0, wk * g4.astype(jnp.float32), 0.0)
            out_ref[:] = msg.sum(axis=1).reshape(tr, b * f)

    # 3. drain block s-1's rows.  A wait consumes (semaphore, descriptor
    #    size) only — offsets are irrelevant — so the drain uses g-row
    #    descriptors against the total transferred ROW count: one scalar
    #    wait per g rows.  The scalar core idles here while the vector units
    #    run the reduce enqueued above.
    if wait_on:
        @pl.when((s >= 1) & (s <= nb))
        def _():
            slot = jax.lax.rem(s - 1, 3)
            rows_total = cnt_ref[(s - 1) * _NCNT + len(_RUN_CLASSES)]
            nch = rows_total // g

            def wait_rows(r):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(0, r)],
                    gbuf.at[slot, pl.ds(0, r)],
                    sems.at[slot],
                )

            jax.lax.fori_loop(
                0, nch, lambda ci, _: (wait_rows(g).wait(), 0)[1],
                0, unroll=False)
            for j in range(g):
                @pl.when(nch * g + j < rows_total)
                def _():
                    wait_rows(1).wait()


@functools.partial(
    jax.jit, static_argnames=("k", "tr", "b", "n", "interpret", "ablate")
)
def spmm_ell_pallas(
    plan_src: jax.Array,   # CompactPlan.src
    plan_dst: jax.Array,   # CompactPlan.dst
    plan_cnt: jax.Array,   # CompactPlan.cnt
    w_slot: jax.Array,     # [N, K, B] per-slot per-sample weights, or
                           # [NB, TR*K] static per-slot weights (MXU mode)
    feats: jax.Array,      # [N_src, W] f32 or bf16, W = B*F, W % 128 == 0
    k: int,
    tr: int,
    b: int = 1,
    n: Optional[int] = None,
    interpret: bool = False,
    ablate: str = "",
) -> jax.Array:            # [N, W] f32
    """Blocked-ELL SpMM kernel: out[v] = sum_k w[v,k] * feats[nbr[v,k]]."""
    mxu = w_slot.ndim == 2
    w_width = feats.shape[1]
    f = w_width // b
    rows = tr * k
    if mxu:
        if n is None:
            raise ValueError("static (2D-weight) mode requires n")
        nb_blocks, rows_w = w_slot.shape
        assert rows_w == rows
        n_pad = nb_blocks * tr
        wb = 1
        w_block = (1, 1, rows)
        w_arg = w_slot.reshape(nb_blocks, 1, rows)
    else:
        n = w_slot.shape[0]
        wb = w_slot.shape[2]  # b, or 1 in broadcast mode
        n_pad = -(-n // tr) * tr
        if n_pad != n:
            w_slot = jnp.pad(w_slot, ((0, n_pad - n), (0, 0), (0, 0)))
        nb_blocks = n_pad // tr
        w_block = (rows, wb)
        w_arg = w_slot.reshape(n_pad * k, wb)
    g = _G
    while rows % g:
        g //= 2
    kern = functools.partial(
        _kernel, tr=tr, k=k, b=b, f=f, g=g, wb=wb, mxu=mxu, ablate=ablate
    )
    x3 = feats.reshape(feats.shape[0], w_width // 128, 128)
    gbuf_bytes = 3 * rows * w_width * feats.dtype.itemsize
    last = nb_blocks - 1
    # the grid runs NB+2 steps (v3 triple buffer): step s issues block s's
    # DMAs (plan indices pipelined into SMEM this step), reduces block s-2,
    # and waits on block s-1.  Index maps are therefore shifted: plan blocks
    # lead by 0, weight/output blocks trail by 2 (clamped at the edges;
    # Pallas keeps revisited blocks resident).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_blocks + 2,),
        in_specs=[
            # plan blocks are [NB, 1, TR*K] so the (1, 1, TR*K) block's last
            # two dims equal the array's (the Pallas block-shape rule)
            pl.BlockSpec((1, 1, rows),
                         lambda s, c: (jnp.minimum(s, last), 0, 0),
                         memory_space=pltpu.SMEM),  # plan src
            pl.BlockSpec((1, 1, rows),
                         lambda s, c: (jnp.minimum(s, last), 0, 0),
                         memory_space=pltpu.SMEM),  # plan dst
            pl.BlockSpec(
                w_block,
                (lambda s, c: (jnp.maximum(s - 2, 0), 0, 0))
                if mxu
                else (lambda s, c: (jnp.maximum(s - 2, 0), 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # feats (HBM)
        ],
        out_specs=pl.BlockSpec((tr, w_width),
                               lambda s, c: (jnp.maximum(s - 2, 0), 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, rows, w_width // 128, 128), feats.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, w_width), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=gbuf_bytes + 32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        plan_cnt,
        plan_src.reshape(nb_blocks, 1, rows),
        plan_dst.reshape(nb_blocks, 1, rows),
        w_arg,
        x3,
    )
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


def plan_for_table(table, w_width: int, itemsize: int = 4) -> Optional[CompactPlan]:
    """CompactPlan for a NeighborTable at the given row payload (cached by
    table identity; returns None when K blows the VMEM budget)."""
    tr = _pick_tr(table.k, w_width * itemsize)
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
        plan = plan_for_table(table, feats.shape[1], feats.dtype.itemsize)
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
    ~20 ms on the 100k/1M workload, ~35%% of the weighted path's total —
    and unlocks the block-diagonal MXU reduce (static weights live on the
    block diagonal of one [TR, TR*K] matrix per row block).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if plan is None:
        plan = plan_for_table(table, feats.shape[1], feats.dtype.itemsize)
    if plan is None:
        raise ValueError(f"K={table.k} too large for the VMEM gather scratch")
    n = table.nbr.shape[0]
    # NUMPY on purpose: built once per (table, tr), passed as a jit argument;
    # a traced slice cached here would leak across traces.  Layout: the MXU
    # mode's [NB, TR*K] block-compact static weights.
    w2 = _cache_by_identity(
        _STATIC_WSLOT_CACHE,
        table.valid,
        (plan.tr,),
        lambda: _static_weights(np.asarray(table.valid), plan.tr),
    )
    return spmm_ell_pallas(
        plan.src, plan.dst, plan.cnt, w2, feats,
        k=table.k, tr=plan.tr, b=b, n=n, interpret=interpret,
    )


def _static_weights(valid: np.ndarray, tr: int) -> np.ndarray:
    """[NB, TR*K] f32 slot-validity weights in the MXU block layout."""
    n, k = valid.shape
    n_pad = -(-n // tr) * tr
    v = np.zeros((n_pad, k), np.float32)
    v[:n] = valid
    return v.reshape(n_pad // tr, tr * k)

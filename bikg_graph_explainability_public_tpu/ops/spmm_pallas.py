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

#: zero-store run classes for the v5 plan (invalid-slot suffixes per table
#: row, zeroed in-VMEM so the fused kernel's plain row sum is exact)
_ZERO_CLASSES = (16, 8, 4, 2, 1)

#: v5 cnt layout: DMA run classes, zero-run classes, total transferred rows
_NCNT5 = len(_RUN_CLASSES) + len(_ZERO_CLASSES) + 1

#: v7 cnt layout: DMA run classes, total transferred rows, reduce-group count
_NCNT7 = len(_RUN_CLASSES) + 2

#: v7 reduce-group granularity: K-planes summed per fused iteration.  The
#: group SIZE is static (ppg*TR slots, one contiguous load); only the group
#: COUNT varies per block (ceil(block max degree / ppg), a prefetched
#: scalar), so no lax.switch is needed anywhere.
_PPG = 8


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
    #: plan layout family ("v3" serves the v3/fused/v6 schedules; "v5" and
    #: "v7" plans are schedule-specific — dispatch asserts the match)
    mode: str = "v3"


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


def _decompose_runs(first, length, classes):
    """Greedy class decomposition of runs: returns (start, cls) entry
    arrays — start positions in the runs' index space, class indices."""
    ent_pos, ent_cls = [], []
    rem = length
    base = np.zeros(length.size, np.int64)
    for ci, cl in enumerate(classes):
        c_cl = rem // cl
        rem = rem - c_cl * cl
        tot = int(c_cl.sum())
        if tot:
            cum = np.zeros(length.size + 1, np.int64)
            np.cumsum(c_cl, out=cum[1:])
            local = np.arange(tot) - np.repeat(cum[:-1], c_cl)
            ent_pos.append(np.repeat(first + base, c_cl) + local * cl)
            ent_cls.append(np.full(tot, ci, np.int64))
        base = base + c_cl * cl
    if not ent_pos:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(ent_pos), np.concatenate(ent_cls)


def build_compact_plan(
    nbr: np.ndarray, valid: np.ndarray, tr: int, mode: str = "v3"
) -> CompactPlan:
    """Build the run-coalesced compact DMA plan host-side.

    Fully vectorized numpy (a per-block Python loop measured 117 s at 1M
    edges — this runs in well under a second): maximal runs are found on the
    flattened valid-slot stream (a run breaks on block change, non-unit slot
    step, or non-unit source step), every run is greedily decomposed into
    ``_RUN_CLASSES`` entries, and entries land block-compact, class-major via
    one stable lexsort.

    ``mode="v5"``: the fused-sum kernel's plan — DMA runs additionally break
    at table-ROW boundaries (the 5D gather scratch addresses slots as
    (row, k)), and each row's invalid-slot suffix becomes zero-store entries
    (``_ZERO_CLASSES`` decomposition, appended class-major after the block's
    DMA entries; ``src`` is unused for them).  cnt grows to ``_NCNT5``
    columns per block.

    ``mode="v7"``: the degree-clustered kernel's plan — gather slots are
    addressed K-MAJOR (slot (row, kp) lives at flat ``kp*TR + row``), so a
    row's valid slots occupy the leading K-planes of the block and the
    reduce can stop at the block's max degree.  Cross-slot runs cannot form
    in this layout (consecutive slots of one row are TR apart), so every
    entry is a single-row DMA.  cnt grows to ``_NCNT7`` columns: the last
    column is the block's reduce-group count ``max(1, ceil(maxdeg/_PPG))``.
    """
    n, k = nbr.shape
    n_pad = -(-n // tr) * tr
    nb = n_pad // tr
    trk = tr * k
    v5 = mode == "v5"
    v7 = mode == "v7"
    ncnt = _NCNT5 if v5 else (_NCNT7 if v7 else _NCNT)
    v = np.zeros((n_pad, k), bool)
    v[:n] = valid > 0
    nb_full = np.zeros((n_pad, k), np.int64)
    nb_full[:n] = nbr
    vb = v.reshape(nb, trk)
    nbb = nb_full.reshape(nb, trk)
    src = np.zeros((nb, trk), np.int32)
    dst = np.zeros((nb, trk), np.int32)
    cnt = np.zeros((nb, ncnt), np.int32)
    if v7:
        cnt[:, len(_RUN_CLASSES)] = vb.sum(1)
        deg_blocks = v.sum(1).reshape(nb, tr)
        cnt[:, len(_RUN_CLASSES) + 1] = np.maximum(
            1, -(-deg_blocks.max(1) // _PPG)
        )
    else:
        cnt[:, -1] = vb.sum(1)
    flat = np.nonzero(vb.ravel())[0]
    if flat.size == 0 and not v5:
        return CompactPlan(src=src, dst=dst, cnt=cnt.reshape(-1), tr=tr,
                           mode=mode)
    blk = (flat // trk).astype(np.int64)
    slot = (flat % trk).astype(np.int64)
    srcs = nbb.ravel()[flat]
    brk = np.ones(flat.size, bool)
    brk[1:] = (
        (np.diff(blk) != 0) | (np.diff(slot) != 1) | (np.diff(srcs) != 1)
    )
    if v7:
        # K-major slot addressing: remap in-block slot (row, kp) ->
        # kp*TR + row; consecutive remapped slots are TR apart so every
        # run is a single entry
        slot = (slot % k) * tr + slot // k
        brk[:] = True
    if v5:
        brk |= slot % k == 0  # rows are separate scratch dims in 5D
    run_first = np.nonzero(brk)[0]
    run_len = np.diff(np.append(run_first, flat.size))
    pos, cls = _decompose_runs(run_first, run_len, _RUN_CLASSES)
    eb = blk[pos]
    ent_src = srcs[pos].astype(np.int32)
    ent_dst = slot[pos].astype(np.int32)
    if v5:
        # zero-store entries: per-row invalid suffix (valid slots are
        # source-sorted first, so invalidity is a suffix by construction)
        deg = v.sum(1).astype(np.int64)  # [n_pad] incl. all-pad rows
        zrows = np.nonzero(deg < k)[0]
        zfirst = zrows * k + deg[zrows]  # flat GLOBAL start of the suffix
        zpos, zcls = _decompose_runs(zfirst, k - deg[zrows], _ZERO_CLASSES)
        zb = zpos // trk
        eb = np.concatenate([eb, zb])
        cls = np.concatenate([cls, zcls + len(_RUN_CLASSES)])
        ent_src = np.concatenate([ent_src, np.zeros(zpos.size, np.int32)])
        ent_dst = np.concatenate(
            [ent_dst, (zpos % trk).astype(np.int32)]
        )
    np.add.at(cnt, (eb, cls), 1)
    # block-compact, class-major layout: stable sort by (block, class);
    # within equal keys the run order (ascending position) is preserved
    order = np.lexsort((cls, eb))
    ncls = len(_RUN_CLASSES) + (len(_ZERO_CLASSES) if v5 else 0)
    bc = cnt[:, :ncls].sum(1, dtype=np.int64)  # entries per block
    first = np.zeros(nb + 1, np.int64)
    np.cumsum(bc, out=first[1:])
    within = np.arange(eb.size) - np.repeat(first[:-1], bc)
    eb_s = eb[order]
    src[eb_s, within] = ent_src[order]
    dst[eb_s, within] = ent_dst[order]
    return CompactPlan(src=src, dst=dst, cnt=cnt.reshape(-1), tr=tr,
                       mode=mode)


def _row_reduce(gbuf, w_ref, out_ref, slot, r, *, k, b, f, wb, mxu):
    """Reduce ONE output row ``r`` of the block in gather slot ``slot``.

    The unit of the fused issue+reduce schedule: small enough (K*W elements)
    that Mosaic bundles its vector ops into the same VLIW region as the
    scalar DMA-issue work it is interleaved with — the only way scalar issue
    and the K-reduce overlap on the core (separate control-flow regions
    serialise; measured full = noreduce + onlyreduce - none in the v3
    schedule, benchmarks/exp_spmm_attrib.py).
    """
    rows_r = gbuf[slot, pl.ds(r * k, k)]  # [K, W/128, 128]
    if mxu:
        # static per-slot weights: w_ref block is [1, 1, TR*K]
        wk = w_ref[0, 0, pl.ds(r * k, k)].reshape(k, 1, 1)
        red = (rows_r.astype(jnp.float32) * wk).sum(axis=0)
        out_ref[pl.ds(r, 1)] = red.reshape(1, -1)
    else:
        # per-slot per-sample weights: w_ref block is [TR*K, wb]; the
        # select (not a multiply) zeroes never-DMA'd slots even when the
        # stale bits are non-finite
        g4 = rows_r.reshape(k, b, f)
        wk = w_ref[pl.ds(r * k, k)].reshape(k, wb, 1)
        msg = jnp.where(wk != 0.0, wk * g4.astype(jnp.float32), 0.0)
        out_ref[pl.ds(r, 1)] = msg.sum(axis=0).reshape(1, b * f)


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


def _kernel_fused(cnt_ref, src_ref, dst_ref, w_ref, x_hbm, out_ref,
                  gbuf, sems, *, tr, k, b, f, g, wb, mxu, ablate=""):
    """Fused issue+reduce schedule (v4).

    Same triple-buffered dataflow as :func:`_kernel` (issue block s, reduce
    block s-2, wait block s-1) but the K-reduce is interleaved INTO the
    DMA-issue loop at row granularity: iteration ``i`` issues single-row
    chunk ``i`` of block s (scalar work) AND reduces output row ``i`` of
    block s-2 (vector work) in the same loop body, so Mosaic bundles them
    into one VLIW region and the VPU crunches while the scalar core issues.
    In the v3 schedule the issue loop, the reduce and the waits are three
    control-flow regions that the core executes strictly in order —
    measured full = noreduce + onlyreduce - none
    (benchmarks/exp_spmm_attrib.py); fusing is the only way to overlap
    them on a single TensorCore.

    ``ablate`` matches :func:`_kernel` where meaningful ("noreduce",
    "none"); the MXU block-diagonal reduce does not exist here — the
    per-row reduce is VPU-only, which also removes the TR-fold FLOP
    redundancy of the block-diagonal form, so TR can grow to amortise grid
    overhead without multiplying MXU work.
    """
    s = pl.program_id(0)
    nb = pl.num_programs(0) - 2

    def start_dma(slot, rr, ln):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(src_ref[0, 0, rr], ln)],
            gbuf.at[slot, pl.ds(dst_ref[0, 0, rr], ln)],
            sems.at[slot],
        )

    if ablate == "none":
        return

    if mxu:
        # stale slots flow through a multiply: zero once so they are finite
        @pl.when(s == 0)
        def _():
            gbuf[0] = jnp.zeros_like(gbuf[0])
            gbuf[1] = jnp.zeros_like(gbuf[1])
            gbuf[2] = jnp.zeros_like(gbuf[2])

    slot_i = jax.lax.rem(s, 3)
    slot_r = jax.lax.rem(s - 2, 3)
    do_issue = s < nb
    do_reduce = s >= 2
    if ablate == "noreduce":
        @pl.when(do_reduce)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

    # multi-row run classes: scalar-only issues (near-empty on random
    # graphs, where runs barely form)
    base = 0
    for ci, cl in enumerate(_RUN_CLASSES[:-1]):
        c_cl = jnp.where(do_issue, cnt_ref[s * _NCNT + ci], 0)

        def body(i, _, b0=base, ln=cl):
            start_dma(slot_i, b0 + i, ln).start()
            return 0

        jax.lax.fori_loop(0, c_cl, body, 0, unroll=False)
        base = base + c_cl

    c1 = jnp.where(do_issue, cnt_ref[s * _NCNT + len(_RUN_CLASSES) - 1], 0)
    nch = c1 // g
    n_red = jnp.where(do_reduce, tr, 0) if ablate != "noreduce" else 0

    def fused_body(i, _, b0=base):
        @pl.when(i < nch)
        def _():
            off = b0 + i * g
            for j in range(g):
                start_dma(slot_i, off + j, 1).start()

        @pl.when(i < n_red)
        def _():
            _row_reduce(gbuf, w_ref, out_ref, slot_r, i,
                        k=k, b=b, f=f, wb=wb, mxu=mxu)
        return 0

    jax.lax.fori_loop(0, jnp.maximum(nch, n_red), fused_body, 0,
                      unroll=False)
    tail = base + nch * g
    for j in range(g):
        @pl.when(nch * g + j < c1)
        def _():
            start_dma(slot_i, tail + j, 1).start()

    # drain block s-1's rows (see _kernel step 3)
    @pl.when((s >= 1) & (s <= nb))
    def _():
        slot = jax.lax.rem(s - 1, 3)
        rows_total = cnt_ref[(s - 1) * _NCNT + len(_RUN_CLASSES)]
        nch_w = rows_total // g

        def wait_rows(r):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, r)],
                gbuf.at[slot, pl.ds(0, r)],
                sems.at[slot],
            )

        jax.lax.fori_loop(
            0, nch_w, lambda ci, _: (wait_rows(g).wait(), 0)[1],
            0, unroll=False)
        for j in range(g):
            @pl.when(nch_w * g + j < rows_total)
            def _():
                wait_rows(1).wait()


def _kernel_v5(cnt_ref, src_ref, dst_ref, x_hbm, out_ref,
               gbuf, sems, *, tr, k, g, rpi, ablate=""):
    """Fused issue+sum schedule over a 5D gather scratch (static weights).

    The static/separable path needs no in-kernel weights at all: the plan
    lists zero-store entries covering every invalid slot of a block
    (per-row suffixes — rows are source-sorted, so invalidity is a suffix),
    the kernel stores zeros there at issue time, and the K-reduce is a
    plain ``sum`` over the scratch's K dim.  The scratch is
    ``[3, TR, K, Wp, 128]`` — slot row and k-position are UNTILED dims, so
    every dynamic index (single-row DMA targets, zero-store starts,
    ``rpi``-row sum slices) is alignment-free; ``rpi`` rows per fused
    iteration keep the out store's sublane offset a static multiple of 8
    and ``rpi*k`` a lane multiple of 128.

    Schedule per grid step s (same triple-buffered dataflow as v3): zero +
    issue block s into slot s%3 with output-row sums of block s-2
    interleaved INTO the same loop (one VLIW region — the only way scalar
    DMA issue and the VPU sum share bundles; in v3 they are separate
    control-flow regions and serialise, full = noreduce + onlyreduce -
    none, benchmarks/exp_spmm_attrib.py), then wait block s-1.
    """
    s = pl.program_id(0)
    nb = pl.num_programs(0) - 2
    if ablate == "none":
        return

    slot_i = jax.lax.rem(s, 3)
    slot_r = jax.lax.rem(s - 2, 3)
    do_issue = s < nb
    nzc = len(_RUN_CLASSES) + len(_ZERO_CLASSES)

    def start_dma(rr, ln):
        d = dst_ref[0, 0, rr]
        row = d // k
        kp = d - row * k
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(src_ref[0, 0, rr], ln)],
            gbuf.at[slot_i, row, pl.ds(kp, ln)],
            sems.at[slot_i],
        )

    # zero-store classes: invalid-slot suffixes of block s (disjoint from
    # the block's DMA targets, so ordering vs the issues is free)
    base = 0
    for ci, _cl in enumerate(_RUN_CLASSES):
        base = base + jnp.where(
            do_issue, cnt_ref[s * _NCNT5 + ci], 0
        )
    zbase = base
    for zi, zl in enumerate(_ZERO_CLASSES):
        c_z = jnp.where(
            do_issue, cnt_ref[s * _NCNT5 + len(_RUN_CLASSES) + zi], 0
        )

        def zbody(i, _, b0=zbase, zl=zl):
            d = dst_ref[0, 0, b0 + i]
            row = d // k
            kp = d - row * k
            gbuf[slot_i, row, pl.ds(kp, zl)] = jnp.zeros(
                (zl,) + gbuf.shape[3:], gbuf.dtype
            )
            return 0

        jax.lax.fori_loop(0, c_z, zbody, 0, unroll=False)
        zbase = zbase + c_z

    # multi-row DMA run classes (scalar only; near-empty on random graphs)
    base = 0
    for ci, cl in enumerate(_RUN_CLASSES[:-1]):
        c_cl = jnp.where(do_issue, cnt_ref[s * _NCNT5 + ci], 0)

        def body(i, _, b0=base, ln=cl):
            start_dma(b0 + i, ln).start()
            return 0

        jax.lax.fori_loop(0, c_cl, body, 0, unroll=False)
        base = base + c_cl

    # fused loop: single-row DMA chunks of block s interleaved with
    # rpi-row sums of block s-2 in ONE loop body
    c1 = jnp.where(
        do_issue, cnt_ref[s * _NCNT5 + len(_RUN_CLASSES) - 1], 0
    )
    nch = c1 // g
    n_red = jnp.where(s >= 2, tr // rpi, 0)
    if ablate == "noreduce":
        n_red = 0

        @pl.when(s >= 2)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

    def fused_body(i, _, b0=base):
        @pl.when(i < nch)
        def _():
            off = b0 + i * g
            for j in range(g):
                start_dma(off + j, 1).start()

        @pl.when(i < n_red)
        def _():
            rows = gbuf[slot_r, pl.ds(i * rpi, rpi)]  # [rpi, K, Wp, 128]
            red = rows.astype(jnp.float32).sum(axis=1)
            out_ref[pl.ds(i * rpi, rpi)] = red.reshape(rpi, -1)
        return 0

    jax.lax.fori_loop(0, jnp.maximum(nch, n_red), fused_body, 0,
                      unroll=False)
    tail = base + nch * g
    for j in range(g):
        @pl.when(nch * g + j < c1)
        def _():
            start_dma(tail + j, 1).start()

    # drain block s-1's rows: wait descriptors in K-row chunks (the 5D
    # scratch has no contiguous >K-row view; waits consume (sem, size)
    # only, so any same-sized descriptor pair works)
    @pl.when((s >= 1) & (s <= nb))
    def _():
        slot = jax.lax.rem(s - 1, 3)
        rows_total = cnt_ref[(s - 1) * _NCNT5 + nzc]
        nch_w = rows_total // k

        def wait_rows(r):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, r)],
                gbuf.at[slot, 0, pl.ds(0, r)],
                sems.at[slot],
            )

        jax.lax.fori_loop(
            0, nch_w, lambda ci, _: (wait_rows(k).wait(), 0)[1],
            0, unroll=False)
        for j in range(k):
            @pl.when(nch_w * k + j < rows_total)
            def _():
                wait_rows(1).wait()


@functools.partial(
    jax.jit, static_argnames=("k", "tr", "b", "n", "interpret", "ablate",
                              "sched")
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
    sched: str = "v3",
    post_scale: Optional[jax.Array] = None,  # [N, B] fused output scale (v7)
) -> jax.Array:            # [N, W] f32
    """Blocked-ELL SpMM kernel: out[v] = sum_k w[v,k] * feats[nbr[v,k]].

    ``sched``:
    - "v5" (static mode only): fused issue+sum over a 5D gather scratch —
      the plan must be built with ``build_compact_plan(..., mode="v5")``
      (row-broken runs + zero-store entries); ``w_slot`` is ignored beyond
      shape dispatch.
    - "fused": v4 — K-reduce interleaved into the DMA-issue loop.
    - "v3": three-region schedule (block-diagonal MXU static reduce).
    """
    mxu = w_slot.ndim == 2
    w_width = feats.shape[1]
    f = w_width // b
    rows = tr * k
    if sched == "v5":
        if not mxu:
            raise ValueError("sched='v5' serves the static mode only")
        if n is None:
            raise ValueError("static mode requires n")
        return _spmm_v5(
            plan_src, plan_dst, plan_cnt, feats, k=k, tr=tr, n=n,
            interpret=interpret, ablate=ablate,
        )[:n]
    if sched == "v6":
        # static mode with 0/1 prefix-validity weights (the table builder's
        # source sort guarantees the prefix form): the reduce mask is the
        # per-row valid count, lane-replicated
        if not mxu:
            raise ValueError("sched='v6' serves the static mode only")
        if n is None:
            raise ValueError("static mode requires n")
        nb_blocks = w_slot.shape[0]
        deg = w_slot.reshape(nb_blocks, tr, k).sum(-1)
        deg_lane = jnp.broadcast_to(
            deg[:, :, None, None], (nb_blocks, tr, 1, 128)
        )
        return _spmm_v6(
            plan_src, plan_dst, plan_cnt, deg_lane, feats, k=k, tr=tr,
            n=n, interpret=interpret, ablate=ablate,
        )[:n]
    if sched == "v7" and not mxu:
        # fused weighted reduce: per-slot per-sample weights stream as
        # row-major [TR*K, 128] blocks (b real lanes, lane-padded host-side
        # — contiguous pipeline DMAs; the kernel K-majors each block into a
        # VMEM scratch).  The lane pad costs (128-b)/b extra weight bytes,
        # ~1.6 GB/s-scale at the production shapes — noise next to the
        # feature gather.
        n0 = w_slot.shape[0]
        wb7 = w_slot.shape[2]
        if wb7 != b:
            raise ValueError("sched='v7' weighted mode needs per-sample "
                             f"weights (wb={wb7} != b={b})")
        n_pad7 = -(-n0 // tr) * tr
        ws = w_slot.reshape(n0 * k, wb7)
        ws = jnp.pad(
            ws, ((0, (n_pad7 - n0) * k), (0, 128 - wb7))
        )
        return _spmm_v7(
            plan_src, plan_dst, plan_cnt, None, feats, k=k, tr=tr,
            n=n0, interpret=interpret, ablate=ablate, b=b,
            weights_km=ws, post_scale=post_scale,
        )[:n0]
    if sched == "v7":
        # degree-clustered masked sum: same static-validity weight input as
        # v6 (prefix form — deg per row), but the plan must be K-major
        # (build_compact_plan mode="v7")
        if n is None:
            raise ValueError("static mode requires n")
        nb_blocks = w_slot.shape[0]
        deg = w_slot.reshape(nb_blocks, tr, k).sum(-1)
        deg_lane = jnp.broadcast_to(
            deg[:, :, None, None], (nb_blocks, tr, 1, 128)
        )
        return _spmm_v7(
            plan_src, plan_dst, plan_cnt, deg_lane, feats, k=k, tr=tr,
            n=n, interpret=interpret, ablate=ablate,
            post_scale=post_scale, b=b,
        )[:n]
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
        _kernel_fused if sched == "fused" else _kernel,
        tr=tr, k=k, b=b, f=f, g=g, wb=wb, mxu=mxu, ablate=ablate,
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


def _kernel_v6(cnt_ref, src_ref, dst_ref, deg_ref, x_hbm, out_ref,
               gbuf, sems, *, tr, k, g, rpi, ablate=""):
    """Fused issue+masked-sum schedule — the production v6.

    Keeps v3's cheap flat issue path (3D gather scratch, flat slot
    addressing, cross-row run coalescing, ordinary v3 plans) and fuses the
    K-reduce into the single-row DMA-issue loop (one VLIW region — the only
    schedule in which scalar DMA issue and the VPU reduce overlap; measured
    in v5: full - noreduce = 1.2 ms where v3's reduce region costs 17 ms).
    Invalid / stale slots need no weights and no zero-stores: the reduce
    masks slot j of row r by ``j < deg[r]`` — a select against a constant
    k-iota and ``deg_ref``, the lane-replicated per-row degree block
    ``[1, TR, 1, 128]`` riding the weight input slot (~N*512 bytes of HBM
    per call).  The select (not a multiply) also kills non-finite stale
    bits.  Exact: out rows are plain f32 sums of valid slots.
    """
    s = pl.program_id(0)
    nb = pl.num_programs(0) - 2
    if ablate == "none":
        return

    slot_i = jax.lax.rem(s, 3)
    slot_r = jax.lax.rem(s - 2, 3)
    do_issue = s < nb

    # the reduce multiplies by the degree mask (mul+acc fuses to one VPU
    # FMA per element; a select would be a second pass) — stale slots must
    # be finite, so zero the scratch once (afterwards they hold earlier
    # blocks' finite rows)
    @pl.when(s == 0)
    def _():
        gbuf[0] = jnp.zeros_like(gbuf[0])
        gbuf[1] = jnp.zeros_like(gbuf[1])
        gbuf[2] = jnp.zeros_like(gbuf[2])

    def start_dma(rr, ln):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(src_ref[0, 0, rr], ln)],
            gbuf.at[slot_i, pl.ds(dst_ref[0, 0, rr], ln)],
            sems.at[slot_i],
        )

    # multi-row DMA run classes (scalar only)
    base = 0
    for ci, cl in enumerate(_RUN_CLASSES[:-1]):
        c_cl = jnp.where(do_issue, cnt_ref[s * _NCNT + ci], 0)

        def body(i, _, b0=base, ln=cl):
            start_dma(b0 + i, ln).start()
            return 0

        jax.lax.fori_loop(0, c_cl, body, 0, unroll=False)
        base = base + c_cl

    c1 = jnp.where(do_issue, cnt_ref[s * _NCNT + len(_RUN_CLASSES) - 1], 0)
    nch = c1 // g
    n_red = jnp.where(s >= 2, tr // rpi, 0)
    if ablate == "noreduce":
        n_red = 0

        @pl.when(s >= 2)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

    # tpu.iota is integer-only; the degree block converts instead
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1, 128), 1)

    def issue_chunk(i, b0=base):
        off = b0 + i * g
        for j in range(g):
            start_dma(off + j, 1).start()

    def reduce_group(i):
        rows = gbuf[slot_r, pl.ds(i * rpi * k, rpi * k)]
        r4 = rows.reshape(rpi, k, rows.shape[1], 128)
        dg = deg_ref[0, pl.ds(i * rpi, rpi)]  # [rpi, 1, 128]
        okf = (j_iota < dg[:, None].astype(jnp.int32)).astype(
            r4.dtype
        )  # [rpi, k, 1, 128]
        red = (r4 * okf).astype(jnp.float32).sum(axis=1)
        out_ref[pl.ds(i * rpi, rpi)] = red.reshape(rpi, -1)

    # the scalar DMA issues and the VPU reduce only share VLIW bundles
    # inside ONE region — a pl.when is an scf.if region boundary, so the
    # both-active case carries them together; the excess of the longer
    # stream runs in its single-purpose branch
    def fused_body(i, _):
        @pl.when((i < nch) & (i < n_red))
        def _():
            issue_chunk(i)
            reduce_group(i)

        @pl.when((i < nch) & (i >= n_red))
        def _():
            issue_chunk(i)

        @pl.when((i >= nch) & (i < n_red))
        def _():
            reduce_group(i)
        return 0

    jax.lax.fori_loop(0, jnp.maximum(nch, n_red), fused_body, 0,
                      unroll=False)
    tail = base + nch * g
    for j in range(g):
        @pl.when(nch * g + j < c1)
        def _():
            start_dma(tail + j, 1).start()

    # drain block s-1's rows (identical to _kernel step 3)
    @pl.when((s >= 1) & (s <= nb))
    def _():
        slot = jax.lax.rem(s - 1, 3)
        rows_total = cnt_ref[(s - 1) * _NCNT + len(_RUN_CLASSES)]
        nch_w = rows_total // g

        def wait_rows(r):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, r)],
                gbuf.at[slot, pl.ds(0, r)],
                sems.at[slot],
            )

        jax.lax.fori_loop(
            0, nch_w, lambda ci, _: (wait_rows(g).wait(), 0)[1],
            0, unroll=False)
        for j in range(g):
            @pl.when(nch_w * g + j < rows_total)
            def _():
                wait_rows(1).wait()


def _deg_lane(valid: np.ndarray, tr: int) -> np.ndarray:
    """[NB, TR, 1, 128] f32 lane-replicated per-row valid-slot counts —
    the v6 kernel's reduce mask input (valid slots are a per-row prefix
    after the table's source sort)."""
    n, _k = valid.shape
    n_pad = -(-n // tr) * tr
    deg = np.zeros(n_pad, np.float32)
    deg[:n] = (valid > 0).sum(1)
    return np.broadcast_to(
        deg.reshape(n_pad // tr, tr, 1, 1), (n_pad // tr, tr, 1, 128)
    ).copy()


def _spmm_v6(
    plan_src, plan_dst, plan_cnt, deg_lane, feats, *, k, tr, n, interpret,
    ablate="",
):
    """pallas_call wrapper for the v6 fused masked-sum schedule."""
    w_width = feats.shape[1]
    wp = w_width // 128
    rows = tr * k
    rpi = 8 if (8 * k) % 128 == 0 else 16
    if tr % rpi:
        raise ValueError(f"tr={tr} must be a multiple of {rpi}")
    n_pad = -(-n // tr) * tr
    nb_blocks = n_pad // tr
    g = _G
    while rows % g:
        g //= 2
    kern = functools.partial(
        _kernel_v6, tr=tr, k=k, g=g, rpi=rpi, ablate=ablate
    )
    x3 = feats.reshape(feats.shape[0], wp, 128)
    gbuf_bytes = 3 * rows * w_width * feats.dtype.itemsize
    last = nb_blocks - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_blocks + 2,),
        in_specs=[
            pl.BlockSpec((1, 1, rows),
                         lambda s, c: (jnp.minimum(s, last), 0, 0),
                         memory_space=pltpu.SMEM),  # plan src
            pl.BlockSpec((1, 1, rows),
                         lambda s, c: (jnp.minimum(s, last), 0, 0),
                         memory_space=pltpu.SMEM),  # plan dst
            pl.BlockSpec((1, tr, 1, 128),
                         lambda s, c: (jnp.maximum(s - 2, 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),  # per-row degrees
            pl.BlockSpec(memory_space=pl.ANY),  # feats (HBM)
        ],
        out_specs=pl.BlockSpec((tr, w_width),
                               lambda s, c: (jnp.maximum(s - 2, 0), 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, rows, wp, 128), feats.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
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
        deg_lane,
        x3,
    )


def _kernel_v7(cnt_ref, src_ref, dst_ref, deg_ref, *rest, tr, k, g, ppg,
               ablate="", b=1, has_scale=False, weighted=False):
    """Degree-clustered fused issue+masked-sum schedule — v7.

    v6's reduce reads every one of the block's TR*K slots even though the
    production tables are ~69% ELL padding (K = max degree, mean degree
    ~K/3).  v7 stores gather slots K-MAJOR (slot (row, kp) at flat
    ``kp*TR + row``, remapped in the plan — flat single-slot DMA targets,
    zero extra scalar work per issue), so the block's real data occupies
    its leading K-planes and the reduce reads only
    ``ng = max(1, ceil(block max degree / ppg))`` groups of ``ppg*TR``
    contiguous slots.  With rows degree-sorted by the caller
    (:func:`..ell.degree_clustered_table`), most blocks have small ng and
    the masked-sum work drops ~K/meandeg-fold; without sorting the kernel
    is still correct, just reduce-heavier.  ``ng`` rides the plan's cnt
    column (_NCNT7 layout) — the group SIZE is static so no lax.switch
    exists anywhere.  Groups accumulate into the out block (VMEM
    read-modify-write, ~MB per block — negligible next to the gather).
    The per-row degree mask (j < deg) zeroes padded and stale slots as in
    v6; group 0 of an all-pad block writes exact zeros through the mask.
    ``has_scale``: an extra ``[1, TR, B]`` per-(row, sample) output-scale
    block precedes the feats ref in ``rest``.
    ``weighted``: ``deg_ref`` instead carries the block's per-slot
    per-sample weights as ``[1, TR*K, 128]`` — ROW-major slots (row r,
    slot kp at ``r*K + kp``), the real ``b`` samples in the leading lanes.
    Row-major 128-lane rows stream contiguously through the block
    pipeline (a ``[*, b]``-lane block spec measured 2-4x slower — the
    pipeline DMAs degenerate to b-lane strided segments), and the kernel
    transposes each block to K-major once into a VMEM scratch (leading-dim
    transpose, ~0.2 MB) so reduce groups slice it like the gather scratch.
    Invalid and never-read slots carry weight 0, so the sum is exact
    without a degree mask.  The v3 weighted path ran the serial
    three-region schedule; this fused form is the one in which scalar DMA
    issue and the VPU weighted reduce share VLIW bundles.
    """
    if weighted:
        if has_scale:
            scale_ref, x_hbm, out_ref, gbuf, sems, wscr = rest
        else:
            scale_ref = None
            x_hbm, out_ref, gbuf, sems, wscr = rest
    elif has_scale:
        scale_ref, x_hbm, out_ref, gbuf, sems = rest
    else:
        scale_ref = None
        x_hbm, out_ref, gbuf, sems = rest
    s = pl.program_id(0)
    nb = pl.num_programs(0) - 2
    if ablate == "none":
        return

    slot_i = jax.lax.rem(s, 3)
    slot_r = jax.lax.rem(s - 2, 3)
    do_issue = s < nb

    # stale slots flow through the mask multiply: zero once so finite
    @pl.when(s == 0)
    def _():
        gbuf[0] = jnp.zeros_like(gbuf[0])
        gbuf[1] = jnp.zeros_like(gbuf[1])
        gbuf[2] = jnp.zeros_like(gbuf[2])

    def start_dma(rr, ln):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(src_ref[0, 0, rr], ln)],
            gbuf.at[slot_i, pl.ds(dst_ref[0, 0, rr], ln)],
            sems.at[slot_i],
        )

    # multi-row DMA run classes (always empty in the K-major layout, kept
    # for plan-layout symmetry; the loops fold to nothing at trip count 0)
    base = 0
    for ci, cl in enumerate(_RUN_CLASSES[:-1]):
        c_cl = jnp.where(do_issue, cnt_ref[s * _NCNT7 + ci], 0)

        def body(i, _, b0=base, ln=cl):
            start_dma(b0 + i, ln).start()
            return 0

        jax.lax.fori_loop(0, c_cl, body, 0, unroll=False)
        base = base + c_cl

    c1 = jnp.where(do_issue, cnt_ref[s * _NCNT7 + len(_RUN_CLASSES) - 1], 0)
    nch = c1 // g
    n_red = jnp.where(
        s >= 2,
        cnt_ref[jnp.maximum(s - 2, 0) * _NCNT7 + len(_RUN_CLASSES) + 1],
        0,
    )
    if ablate == "noreduce":
        n_red = 0

        @pl.when(s >= 2)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

    # tpu.iota is integer-only; the degree block converts instead
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (ppg, 1, 1, 128), 0)

    def issue_chunk(i, b0=base):
        off = b0 + i * g
        for j in range(g):
            start_dma(off + j, 1).start()

    if weighted:
        # once per block: row-major [TR*K, 128] weights -> K-major scratch
        # (a leading-dim transpose; lane-crossing casts are not legal)
        @pl.when(s >= 2)
        def _():
            wv = deg_ref[0].reshape(tr, k, 128)
            wscr[:] = jnp.transpose(wv, (1, 0, 2)).reshape(tr * k, 128)

    def reduce_group(i):
        planes = gbuf[slot_r, pl.ds(i * ppg * tr, ppg * tr)]
        if weighted:
            # same reshape family the v3 weighted kernel uses (leading-dim
            # splits + lane-dim kept minor + trailing broadcast axis)
            wg = wscr[pl.ds(i * ppg * tr, ppg * tr)]  # [ppg*TR, 128]
            f_dim = planes.shape[1] * 128 // b
            g5 = planes.reshape(ppg, tr, b, f_dim)
            w4 = wg[:, :b].reshape(ppg, tr, b)[:, :, :, None]
            part = (
                (g5.astype(jnp.float32) * w4).sum(axis=0)
            )  # [TR, b, f]
        else:
            g4 = planes.reshape(ppg, tr, planes.shape[1], 128)
            dg = deg_ref[0]  # [TR, 1, 128]
            okf = (
                (j_iota + i * ppg) < dg[None].astype(jnp.int32)
            ).astype(g4.dtype)  # [ppg, TR, 1, 128]
            part = (g4 * okf).astype(jnp.float32).sum(axis=0)  # [TR, wp, 128]

        @pl.when(i == 0)
        def _():
            out_ref[:] = part.reshape(tr, -1)

        @pl.when(i > 0)
        def _():
            out_ref[:] = out_ref[:] + part.reshape(tr, -1)

    def fused_body(i, _):
        @pl.when((i < nch) & (i < n_red))
        def _():
            issue_chunk(i)
            reduce_group(i)

        @pl.when((i < nch) & (i >= n_red))
        def _():
            issue_chunk(i)

        @pl.when((i >= nch) & (i < n_red))
        def _():
            reduce_group(i)
        return 0

    jax.lax.fori_loop(0, jnp.maximum(nch, n_red), fused_body, 0,
                      unroll=False)

    # optional fused output scale: out[r, b, :] *= scale[r, b] — replaces a
    # full [N, W] HBM read+write pass in the separable op (the post-scale)
    # with a VMEM-local pass per block (~1 MB, negligible)
    if scale_ref is not None:
        @pl.when((s >= 2) & (n_red > 0))
        def _():
            o = out_ref[:]
            sc = scale_ref[0]  # [tr, b]
            out_ref[:] = (
                o.reshape(tr, b, -1) * sc[:, :, None]
            ).reshape(o.shape)

    tail = base + nch * g
    for j in range(g):
        @pl.when(nch * g + j < c1)
        def _():
            start_dma(tail + j, 1).start()

    # drain block s-1's rows (identical to _kernel step 3)
    @pl.when((s >= 1) & (s <= nb))
    def _():
        slot = jax.lax.rem(s - 1, 3)
        rows_total = cnt_ref[(s - 1) * _NCNT7 + len(_RUN_CLASSES)]
        nch_w = rows_total // g

        def wait_rows(r):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, r)],
                gbuf.at[slot, pl.ds(0, r)],
                sems.at[slot],
            )

        jax.lax.fori_loop(
            0, nch_w, lambda ci, _: (wait_rows(g).wait(), 0)[1],
            0, unroll=False)
        for j in range(g):
            @pl.when(nch_w * g + j < rows_total)
            def _():
                wait_rows(1).wait()


def _spmm_v7(
    plan_src, plan_dst, plan_cnt, deg_lane, feats, *, k, tr, n, interpret,
    ablate="", post_scale=None, b=1, weights_km=None,
):
    """pallas_call wrapper for the v7 degree-clustered schedule.

    ``weights_km``: [N_pad*K, 128] f32 per-slot per-sample weights, slots
    ROW-major, the b real samples in the leading lanes — selects the
    weighted reduce; ``deg_lane`` is ignored then.
    """
    w_width = feats.shape[1]
    wp = w_width // 128
    rows = tr * k
    if k % _PPG:
        raise ValueError(f"k={k} must be a multiple of {_PPG}")
    n_pad = -(-n // tr) * tr
    nb_blocks = n_pad // tr
    g = _G
    while rows % g:
        g //= 2
    has_scale = post_scale is not None
    weighted = weights_km is not None
    kern = functools.partial(
        _kernel_v7, tr=tr, k=k, g=g, ppg=_PPG, ablate=ablate, b=b,
        has_scale=has_scale, weighted=weighted,
    )
    x3 = feats.reshape(feats.shape[0], wp, 128)
    gbuf_bytes = 3 * rows * w_width * feats.dtype.itemsize
    last = nb_blocks - 1
    if weighted:
        w_in_spec = pl.BlockSpec(
            (1, rows, 128),
            lambda s, c: (jnp.maximum(s - 2, 0), 0, 0),
            memory_space=pltpu.VMEM,
        )
        w_operand = weights_km.reshape(nb_blocks, rows, 128)
    else:
        w_in_spec = pl.BlockSpec(
            (1, tr, 1, 128),
            lambda s, c: (jnp.maximum(s - 2, 0), 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        w_operand = deg_lane
    in_specs = [
        pl.BlockSpec((1, 1, rows),
                     lambda s, c: (jnp.minimum(s, last), 0, 0),
                     memory_space=pltpu.SMEM),  # plan src
        pl.BlockSpec((1, 1, rows),
                     lambda s, c: (jnp.minimum(s, last), 0, 0),
                     memory_space=pltpu.SMEM),  # plan dst
        w_in_spec,  # per-row degrees, or K-major slot weights
    ]
    operands = [
        plan_src.reshape(nb_blocks, 1, rows),
        plan_dst.reshape(nb_blocks, 1, rows),
        w_operand,
    ]
    if has_scale:
        in_specs.append(
            pl.BlockSpec((1, tr, b),
                         lambda s, c: (jnp.maximum(s - 2, 0), 0, 0),
                         memory_space=pltpu.VMEM)  # per-(row, sample) scale
        )
        ps = post_scale
        if ps.shape[0] != n_pad:
            ps = jnp.pad(ps, ((0, n_pad - ps.shape[0]), (0, 0)))
        operands.append(ps.reshape(nb_blocks, tr, b))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # feats (HBM)
    operands.append(x3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_blocks + 2,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tr, w_width),
                               lambda s, c: (jnp.maximum(s - 2, 0), 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, rows, wp, 128), feats.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ] + ([pltpu.VMEM((rows, 128), jnp.float32)] if weighted else []),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, w_width), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=gbuf_bytes + 32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(plan_cnt, *operands)


def _spmm_v5(
    plan_src, plan_dst, plan_cnt, feats, *, k, tr, n, interpret, ablate=""
):
    """pallas_call wrapper for the v5 fused-sum schedule (static weights).

    5D gather scratch [3, TR, K, Wp, 128]; no weight input (the plan's
    zero-stores make the plain row sum exact).  Returns [n_pad, W] f32.
    """
    w_width = feats.shape[1]
    wp = w_width // 128
    rows = tr * k
    rpi = 8 if (8 * k) % 128 == 0 else 16
    if tr % rpi:
        raise ValueError(f"tr={tr} must be a multiple of {rpi}")
    n_pad = -(-n // tr) * tr
    nb_blocks = n_pad // tr
    g = _G
    while rows % g:
        g //= 2
    kern = functools.partial(
        _kernel_v5, tr=tr, k=k, g=g, rpi=rpi, ablate=ablate
    )
    x3 = feats.reshape(feats.shape[0], wp, 128)
    gbuf_bytes = 3 * rows * w_width * feats.dtype.itemsize
    last = nb_blocks - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_blocks + 2,),
        in_specs=[
            pl.BlockSpec((1, 1, rows),
                         lambda s, c: (jnp.minimum(s, last), 0, 0),
                         memory_space=pltpu.SMEM),  # plan src
            pl.BlockSpec((1, 1, rows),
                         lambda s, c: (jnp.minimum(s, last), 0, 0),
                         memory_space=pltpu.SMEM),  # plan dst
            pl.BlockSpec(memory_space=pl.ANY),  # feats (HBM)
        ],
        out_specs=pl.BlockSpec((tr, w_width),
                               lambda s, c: (jnp.maximum(s - 2, 0), 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, tr, k, wp, 128), feats.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
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
        x3,
    )


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


def plan_for_table(
    table, w_width: int, itemsize: int = 4, mode: str = "v3"
) -> Optional[CompactPlan]:
    """CompactPlan for a NeighborTable at the given row payload (cached by
    table identity; returns None when K blows the VMEM budget or, for v7,
    when K is not a reduce-group multiple)."""
    tr = _pick_tr(table.k, w_width * itemsize)
    if tr == 0 or (mode == "v7" and table.k % _PPG):
        return None
    return _cache_by_identity(
        _PLAN_CACHE,
        table.nbr,
        (tr, mode),
        lambda: build_compact_plan(
            np.asarray(table.nbr), np.asarray(table.valid), tr, mode=mode
        ),
    )


_CLUSTER_CACHE: dict = {}


def cluster_for_table(table, w_width: int, itemsize: int = 4):
    """Degree-clustered v7 layout for a NeighborTable, cached by identity.

    Rows are sorted by degree (descending, stable) so each TR-row block's
    max degree — and therefore the v7 kernel's reduce-group count — is
    small for most blocks (the production tables are ~69% ELL padding).
    Returns ``(plan_v7, static_w_sorted, perm, inv_perm)`` or None when K
    blows the VMEM budget or is not a multiple of the reduce-group size.
    Outputs of the v7 kernel are in sorted order; ``inv_perm`` restores the
    caller's row order (a row gather the consumer fuses into its output
    scale — measured free on the separable path).
    """
    tr = _pick_tr(table.k, w_width * itemsize)
    if tr == 0 or table.k % _PPG:
        return None

    def build():
        nbr = np.asarray(table.nbr)
        valid = np.asarray(table.valid)
        deg = (valid > 0).sum(1)
        perm = np.argsort(-deg, kind="stable")
        inv = np.argsort(perm).astype(np.int32)
        nbr_s, valid_s = nbr[perm], valid[perm]
        plan = build_compact_plan(nbr_s, valid_s, tr, mode="v7")
        w2 = _static_weights(valid_s, tr)
        return plan, w2, perm.astype(np.int32), inv

    return _cache_by_identity(_CLUSTER_CACHE, table.nbr, ("v7", tr), build)


def batched_gather_sum(
    table,               # NeighborTable (.nbr [N,K], .eid [N,K], .valid [N,K])
    edge_weight: jax.Array,  # [E, B] per-edge per-sample weights
    feats: jax.Array,    # [N, B*F] batch-contiguous features
    b: int,
    interpret: Optional[bool] = None,
    plan: Optional[CompactPlan] = None,
    w_slot: Optional[jax.Array] = None,
) -> jax.Array:
    """out[v] = sum over in-edges e of w[e, :] * feats[src_e] (broadcast over
    F within each sample's block) — the batched layer>=2 aggregation.

    ``w_slot``: optional pre-built ``[N, K, B]`` slot-layout weights (zero
    on invalid slots).  Engines that derive weights from masks via the
    table (``ops.ell.gcn_coeffs_from_*``) should pass this — the
    ``edge_weight[table.eid]`` slot re-index is an XLA gather of millions
    of B-wide rows, measured 20 ms (B=16) to 189 ms (B=48) at the 100k/1M
    workload, while a coeff-tensor transpose into slot layout costs ~2 ms.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if w_slot is None:
        w_slot = edge_weight[table.eid] * table.valid[:, :, None]
    if (
        plan is not None and plan.mode == "v7" and w_slot.ndim == 3
        and w_slot.shape[2] == b
    ):
        # caller-warmed v7 plan (big-graph jits pass plans as traced
        # arguments): fused weighted reduce on it directly
        return spmm_ell_pallas(
            plan.src, plan.dst, plan.cnt, w_slot, feats,
            k=table.k, tr=plan.tr, b=b, interpret=interpret, sched="v7",
        )
    if plan is None and w_slot.shape[2] == b:
        # v7w: fused weighted reduce (the v3 weighted path ran issue,
        # reduce and waits as three serial regions) — 134 -> 2x+ GB/s at
        # the production width (benchmarks/exp_spmm_v7w.py)
        plan7 = plan_for_table(
            table, feats.shape[1], feats.dtype.itemsize, mode="v7"
        )
        if plan7 is not None:
            return spmm_ell_pallas(
                plan7.src, plan7.dst, plan7.cnt, w_slot, feats,
                k=table.k, tr=plan7.tr, b=b, interpret=interpret,
                sched="v7",
            )
    if plan is None:
        plan = plan_for_table(table, feats.shape[1], feats.dtype.itemsize)
    if plan is None:
        raise ValueError(
            f"K={table.k} too large for the VMEM gather scratch"
        )
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
    static_w: Optional[jax.Array] = None,
    post_scale: Optional[jax.Array] = None,  # [N, B]: out[v,s,:] *= ps[v,s]
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
    n = table.nbr.shape[0]
    if plan is None:
        # v7 schedule (the production default): K-major scratch, per-block
        # reduce-group counts — the reduce reads ceil(blockmax/8) K-plane
        # groups instead of all TR*K slots.  521 -> 561 GB/s unsorted at
        # the 100k/1M B=32 workload vs v6; the sorted variant is faster
        # kernel-side (611) but its output un-permute pass costs more than
        # sorting saves in the full op (benchmarks/exp_spmm_v7.py)
        plan = plan_for_table(
            table, feats.shape[1], feats.dtype.itemsize, mode="v7"
        )
    if plan is None:
        plan = plan_for_table(table, feats.shape[1], feats.dtype.itemsize)
    if plan is None:
        raise ValueError(f"K={table.k} too large for the VMEM gather scratch")
    # NUMPY on purpose: built once per (table, tr), passed as a jit argument;
    # a traced slice cached here would leak across traces.  Layout: the MXU
    # mode's [NB, TR*K] block-compact static weights (plan-mode independent).
    w2 = static_w
    if w2 is None:
        w2 = _cache_by_identity(
            _STATIC_WSLOT_CACHE,
            table.valid,
            (plan.tr,),
            lambda: _static_weights(np.asarray(table.valid), plan.tr),
        )
    if plan.mode == "v7":
        return spmm_ell_pallas(
            plan.src, plan.dst, plan.cnt, w2, feats,
            k=table.k, tr=plan.tr, b=b, n=n, interpret=interpret,
            sched="v7", post_scale=post_scale,
        )
    # v6 fused masked-sum schedule fallback (K not a reduce-group multiple)
    out = spmm_ell_pallas(
        plan.src, plan.dst, plan.cnt, w2, feats,
        k=table.k, tr=plan.tr, b=b, n=n, interpret=interpret, sched="v6",
    )
    if post_scale is not None:
        f = feats.shape[1] // b
        out = (
            out.reshape(-1, b, f) * post_scale[:, :, None]
        ).reshape(out.shape)
    return out


def _static_weights(valid: np.ndarray, tr: int) -> np.ndarray:
    """[NB, TR*K] f32 slot-validity weights in the MXU block layout.

    The v6/v7 schedules derive each row's degree from these weights and
    mask slots by ``j < deg`` — valid slots MUST form a per-row prefix
    (guaranteed by ``build_neighbor_table_edges``'s source sort; asserted
    here so a hand-built table with interior holes fails loudly instead of
    summing silently wrong).
    """
    n, k = valid.shape
    v01 = valid > 0
    if k > 1 and np.any(v01[:, 1:] & ~v01[:, :-1]):
        raise ValueError(
            "NeighborTable validity is not in prefix form (a valid slot "
            "follows an invalid one); the v6/v7 masked-sum schedules "
            "require the builder's source-sorted layout"
        )
    n_pad = -(-n // tr) * tr
    v = np.zeros((n_pad, k), np.float32)
    v[:n] = valid
    return v.reshape(n_pad // tr, tr * k)

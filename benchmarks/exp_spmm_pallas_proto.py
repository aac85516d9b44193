"""Prototype Pallas ELL SpMM: manual double-buffered row-gather DMA.

out[v] = sum_k wk[v,k] * x[nbr[v,k]]   (ELL neighbour table layout)

Grid over row blocks of TR rows. Per block:
  1. DMA the [TR, K] int32 index block HBM -> SMEM (DMA addresses must be
     computed from scalar memory).
  2. Gather TR*K feature rows HBM -> VMEM scratch in chunks of G rows,
     double-buffered (start chunk c+1, wait chunk c).
  3. One vectorized weighted reduction over K -> the [TR, F] output block.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(nbr_hbm, wk_ref, x_hbm, out_ref, idx_smem, gbuf, idx_sem, sems,
            *, tr, k, f, g):
    ib = pl.program_id(0)
    rows = tr * k
    # 1. index block -> SMEM (nbr is flattened to 1D so the slice is a
    #    contiguous lane-aligned run; 2D int32 slices of width K<128 are
    #    rejected by Mosaic's HBM tiling)
    idx_dma = pltpu.make_async_copy(
        nbr_hbm.at[pl.ds(ib * rows, rows)], idx_smem, idx_sem
    )
    idx_dma.start()
    idx_dma.wait()

    num_chunks = rows // g

    def row_dma(rr, j, slot):
        idx = idx_smem[rr]
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(idx, 1)],
            gbuf.at[pl.ds(rr, 1)],
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

    start_chunk(0)

    def body(ci, _):
        @pl.when(ci + 1 < num_chunks)
        def _():
            start_chunk(ci + 1)

        wait_chunk(ci)
        return 0

    jax.lax.fori_loop(0, num_chunks, body, 0)

    g3 = gbuf[:].reshape(tr, k, f)
    out_ref[:] = (wk_ref[:][:, :, None] * g3).sum(axis=1)


def make_pallas_ell(n, k, f, tr=256, g=8):
    n_pad = -(-n // tr) * tr
    assert (tr * k) % g == 0
    kern = functools.partial(_kernel, tr=tr, k=k, f=f, g=g)

    @jax.jit
    def op(nbr, wk, x):
        if n_pad != n:
            nbr = jnp.pad(nbr, ((0, n_pad - n), (0, 0)))
            wk = jnp.pad(wk, ((0, n_pad - n), (0, 0)))
        nbr = nbr.reshape(-1)
        # feature rows viewed as whole (sublane, lane) tiles so single-row
        # HBM slices stay tile-aligned for any F that is a multiple of 128
        x3 = x.reshape(x.shape[0], f // 128, 128)
        out = pl.pallas_call(
            kern,
            grid=(n_pad // tr,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # nbr (HBM)
                pl.BlockSpec((tr, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),  # wk
                pl.BlockSpec(memory_space=pltpu.ANY),  # x (HBM)
            ],
            out_specs=pl.BlockSpec((tr, f), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
            scratch_shapes=[
                pltpu.SMEM((tr * k,), jnp.int32),
                pltpu.VMEM((tr * k, f // 128, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2, g)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(nbr, wk, x3)
        return out[:n]

    return op

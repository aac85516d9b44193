"""Pallas TPU kernel: fused dense masked-batched GCN layer.

The hot op of the explainer (see :mod:`..models.fast_gcn`): for a batch of
perturbation scalings ``s_b = m_b * deg_b^-1/2`` over one dense subgraph
adjacency ``A``,

    H[b] = relu( diag(s_b) . A . (diag(s_b) XW)  +  diag(selfw_b) XW  + bias )

XLA evaluates this as a batched GEMM plus separate elementwise passes,
re-reading ``A`` and materialising the scaled operand per sample.  This kernel
fuses the rank-1 mask scalings, the self-loop term, bias and ReLU into the
matmul pipeline and keeps the scaled operand for a whole sample-tile resident
in VMEM:

  grid = (B/TB, N/TN), sequential on core; at each new sample-tile
  (n-index 0) the scaled operand ``diag(s_b) XW`` for TB samples is computed
  once into scratch; every n-step then runs TB MXU matmuls
  ``A[tile, :] @ scaled[t]`` against that scratch.

Layouts: A in bf16 (halves HBM traffic), scaled operand bf16, accumulation
f32 (``preferred_element_type``).

Used via :func:`masked_gcn_layer` (shared first-layer operand) and
:func:`masked_gcn_layer_batched` (per-sample operand, layers >= 2).
Falls back to interpreter mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(n: int, target: int) -> int:
    """Largest divisor of n that is <= target (bounds VMEM block sizes)."""
    for t in range(min(target, n), 0, -1):
        if n % t == 0:
            return t
    return 1


def _pick_tile_aligned(n: int, target: int) -> int:
    """N-tile choice whose in-kernel slice offsets Mosaic can prove aligned.

    ``s_ref``/``xw_ref`` are sliced at ``i_n * tn`` inside the kernel; lane
    offsets must be 128-multiples, so pick the largest divisor of n that is
    <= target AND a multiple of 128.  Callers pad n to a 128-multiple first
    (``_round_up(n, 128)``) so such a divisor always exists — a tn that is
    merely *equal* to an unaligned n is not enough: Mosaic cannot statically
    prove ``i_n * tn`` is a 128-multiple even when the grid has one n-step
    (the r2 regression: vector.load of 1x120xf32 at n=120).
    """
    for t in range(min(target, n), 0, -1):
        if n % t == 0 and t % 128 == 0:
            return t
    return n


def _pad_batch(b: int, multiple: int = 8) -> int:
    """TPU Pallas block sublanes must divide by 8; the batch pads up."""
    return ((b + multiple - 1) // multiple) * multiple


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _layer_kernel_shared(
    s_ref, selfw_ref, adj_ref, xw_ref, bias_ref, out_ref, scaled, *, tb, tn, c, apply_relu
):
    """scaled scratch layout: [N, TB*C] — the whole sample-tile's scaled
    operands side by side, so each grid step is ONE wide MXU matmul
    [TN, N] @ [N, TB*C] instead of TB narrow ones."""
    i_n = pl.program_id(1)

    @pl.when(i_n == 0)
    def _():
        for t in range(tb):
            scaled[:, t * c : (t + 1) * c] = (
                s_ref[t, :][:, None] * xw_ref[:]
            ).astype(jnp.bfloat16)

    acc = jnp.dot(adj_ref[:], scaled[:], preferred_element_type=jnp.float32)
    base = i_n * tn
    xw_tile = xw_ref[pl.ds(base, tn), :]  # [TN, C]
    for t in range(tb):
        s_tile = s_ref[t, pl.ds(base, tn)]
        res = (
            s_tile[:, None] * acc[:, t * c : (t + 1) * c]
            + selfw_ref[t, pl.ds(base, tn)][:, None] * xw_tile
            + bias_ref[0]
        )
        out_ref[t] = jnp.maximum(res, 0.0) if apply_relu else res


def _layer_kernel_batched(
    s_ref, selfw_ref, adj_ref, h_ref, w_ref, bias_ref, out_ref, scaled,
    *, tb, tn, c, apply_relu
):
    """Per-sample operand variant: at each new sample-tile the per-sample
    transform + mask scaling ``s_t * (h_t W)`` is computed once into the wide
    [N, TB*C] scratch; the self-loop term recomputes the [TN, C] tile of
    ``h_t W`` per step (<=6% extra FLOPs, saves a second scratch buffer)."""
    i_n = pl.program_id(1)

    @pl.when(i_n == 0)
    def _():
        for t in range(tb):
            hw_t = jnp.dot(h_ref[t], w_ref[:], preferred_element_type=jnp.float32)
            scaled[:, t * c : (t + 1) * c] = (
                s_ref[t, :][:, None] * hw_t
            ).astype(jnp.bfloat16)

    acc = jnp.dot(adj_ref[:], scaled[:], preferred_element_type=jnp.float32)
    base = i_n * tn
    for t in range(tb):
        hw_tile = jnp.dot(
            h_ref[t, pl.ds(base, tn), :], w_ref[:],
            preferred_element_type=jnp.float32,
        )
        s_tile = s_ref[t, pl.ds(base, tn)]
        res = (
            s_tile[:, None] * acc[:, t * c : (t + 1) * c]
            + selfw_ref[t, pl.ds(base, tn)][:, None] * hw_tile
            + bias_ref[0]
        )
        out_ref[t] = jnp.maximum(res, 0.0) if apply_relu else res


@functools.partial(jax.jit, static_argnames=("apply_relu",))
def masked_gcn_layer(
    adj_bf16: jax.Array,  # [N, N] bf16
    xw: jax.Array,  # [N, C] f32 (batch-shared operand)
    s: jax.Array,  # [B, N] f32
    self_w: jax.Array,  # [B, N] f32
    bias: jax.Array,  # [C] f32
    apply_relu: bool = True,
) -> jax.Array:  # [B, N, C] f32
    """Fused masked GCN layer (Pallas): normalize + aggregate + transform in one kernel."""
    b0, n = s.shape
    c0 = xw.shape[1]
    b = _pad_batch(b0)
    if b != b0:
        s = jnp.pad(s, ((0, b - b0), (0, 0)))
        self_w = jnp.pad(self_w, ((0, b - b0), (0, 0)))
    # per-sample stride in the wide scratch must be lane-aligned: slicing
    # ``scaled[:, t*c : (t+1)*c]`` at a non-128-multiple offset is a Mosaic
    # compile error ("cannot statically prove index is a multiple of 128"
    # for e.g. C=120 or the lungCancer checkpoint's C=16), so the channel
    # dim pads to 128 and the output slices back down
    c = _round_up(c0, 128)
    if c != c0:
        xw = jnp.pad(xw, ((0, 0), (0, c - c0)))
        bias = jnp.pad(bias, (0, c - c0))
    # the node dim must also be lane-aligned: in-kernel slices along N
    # (``s_ref[t, pl.ds(i_n*tn, tn)]``) need provably-128-multiple offsets
    # AND widths, so N pads to 128 and the padded rows (zero adjacency,
    # zero scalings) are sliced off the output
    n0 = n
    n = _round_up(n0, 128)
    if n != n0:
        dn = n - n0
        s = jnp.pad(s, ((0, 0), (0, dn)))
        self_w = jnp.pad(self_w, ((0, 0), (0, dn)))
        adj_bf16 = jnp.pad(adj_bf16, ((0, dn), (0, dn)))
        xw = jnp.pad(xw, ((0, dn), (0, 0)))
    tb = 8 if b % 8 == 0 else _pick_tile(b, 8)
    tn = _pick_tile_aligned(n, 256)
    grid = (b // tb, n // tn)
    kernel = functools.partial(
        _layer_kernel_shared, tb=tb, tn=tn, c=c, apply_relu=apply_relu
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, n), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tb, tn, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, tb * c), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(s, self_w, adj_bf16, xw, bias.reshape(1, c))
    return out[:b0, :n0, :c0]


@functools.partial(jax.jit, static_argnames=("apply_relu",))
def masked_gcn_layer_batched(
    adj_bf16: jax.Array,  # [N, N] bf16
    h: jax.Array,  # [B, N, C_in] f32 (per-sample features)
    w_t: jax.Array,  # [C_in, C] f32 (weight, already transposed)
    s: jax.Array,  # [B, N] f32
    self_w: jax.Array,  # [B, N] f32
    bias: jax.Array,  # [C] f32
    apply_relu: bool = True,
) -> jax.Array:
    """Batched fused masked GCN layer over a [B, N] mask batch."""
    b0, n = s.shape
    c_in, c0 = w_t.shape
    b = _pad_batch(b0)
    if b != b0:
        s = jnp.pad(s, ((0, b - b0), (0, 0)))
        self_w = jnp.pad(self_w, ((0, b - b0), (0, 0)))
        h = jnp.pad(h, ((0, b - b0), (0, 0), (0, 0)))
    # lane-align the per-sample scratch stride (see masked_gcn_layer)
    c = _round_up(c0, 128)
    if c != c0:
        w_t = jnp.pad(w_t, ((0, 0), (0, c - c0)))
        bias = jnp.pad(bias, (0, c - c0))
    # lane-align the node dim (see masked_gcn_layer)
    n0 = n
    n = _round_up(n0, 128)
    if n != n0:
        dn = n - n0
        s = jnp.pad(s, ((0, 0), (0, dn)))
        self_w = jnp.pad(self_w, ((0, 0), (0, dn)))
        adj_bf16 = jnp.pad(adj_bf16, ((0, dn), (0, dn)))
        h = jnp.pad(h, ((0, 0), (0, dn), (0, 0)))
    tb = 8 if b % 8 == 0 else _pick_tile(b, 8)
    tn = _pick_tile_aligned(n, 256)
    grid = (b // tb, n // tn)
    kernel = functools.partial(
        _layer_kernel_batched, tb=tb, tn=tn, c=c, apply_relu=apply_relu
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, n), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n, c_in), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tb, tn, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, tb * c), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(s, self_w, adj_bf16, h, w_t, bias.reshape(1, c))
    return out[:b0, :n0, :c0]

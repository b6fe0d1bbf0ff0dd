"""Pallas TPU kernel: stride-1 SAME 3x3 convolution as 9 shifted matmuls.

Motivation (v5e traces, NOTES.md round 3): XLA's conv lowering runs the
VAE decoder's large 3x3 convs at 47-55% MXU — the single biggest gap
between the measured decode (272 ms) and its 95 ms roofline floor. A 3x3
conv over NHWC is exactly

    out[y, x] = bias + sum_{dy,dx} in[y+dy-1, x+dx-1] @ W[dy, dx]

i.e. nine [M, C] x [C, Co] matmuls accumulating in fp32, where M = rows x
width of a tile.

Layout (round 4 — the round-3 rank-3 form was rejected by Mosaic: a DMA
slice along a TILED dim must be 8-aligned, and the halo width W+2 never
is): the column shifts are materialized OUTSIDE the kernel as a
[3, N*(H+2), W, C] stack (x-shifts dx=0,1,2 of the zero-padded input; one
fused XLA pad+slice+stack, and the conv stays hugely compute-bound —
arithmetic intensity ~9*Cin flops/byte, so 3x input reads are noise).
Inside the kernel the per-tile DMA then slices ONLY untiled dims (dim0 is
the full 3, dim1 is the flattened batch*rows dim), the last two dims
(W, C) are whole and tile-aligned, and the row (dy) shifts are static
slices on the untiled dim of VMEM scratch — no sublane rotations at all.
Weights stay VMEM-resident across the whole grid; output tiles are
written in the input dtype. The matmul M = th*W is chosen ~1-8k so the
MXU pipeline amortizes the K=C contraction.

Backward falls back to XLA convs (custom VJP): dL/dx is a 3x3 conv with
the spatially-flipped, channel-transposed kernel; dL/dW a correlation —
both shapes XLA already handles well, and training steps are dominated by
other costs.

Dispatch is gated in models/layers.py (TPU only, stride 1, lane-aligned
channels, spatial extent large enough to matter).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xsh_ref, w_ref, b_ref, o_ref, xs, sem, *, th: int, hp: int,
            w: int, cin: int, cout: int):
    """xsh_ref: [3, N*(H+2), W, C] in ANY/HBM (dx-shifted padded inputs;
    the DMA slices dim1 only — an untiled dim, so no alignment constraint);
    w_ref: [9, C, Co] VMEM; b_ref: [1, Co] VMEM f32;
    o_ref: [1, th, W, Co] VMEM block; xs: [3, th+2, W, C] VMEM scratch."""
    n = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xsh_ref.at[:, pl.ds(n * hp + i * th, th + 2)], xs, sem)
    dma.start()
    dma.wait()
    acc = b_ref[:].astype(jnp.float32)  # [1, Co], broadcasts over M
    for dy in range(3):
        for dx in range(3):
            blk = xs[dx, dy:dy + th].reshape(th * w, cin)
            acc = acc + jnp.dot(blk, w_ref[dy * 3 + dx],
                                preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype).reshape(th, w, cout)


def _pick_th(h: int, w: int, cin: int, cout: int, itemsize: int) -> int:
    """Largest divisor of h whose tile fits a ~10 MB VMEM budget."""
    budget = 10 * 1024 * 1024
    best = 0
    for th in range(1, h + 1):
        if h % th:
            continue
        need = (3 * (th + 2) * w * cin * itemsize   # shifted input scratch
                + th * w * cout * 4                  # fp32 accumulator
                + th * w * cout * itemsize)          # output block
        if need <= budget:
            best = th
        else:
            break
    return best


def conv3x3_applicable(shape, cin: int, cout: int, strides=1,
                       itemsize: int = 2) -> bool:
    """Static dispatch test for the Pallas path. ``itemsize`` must match
    the dtype the conv will actually run in (layers.Conv passes
    ``x.dtype.itemsize``) so the gate and ``_conv3x3_impl`` agree on
    whether a VMEM-feasible tile exists."""
    if strides not in (1, (1, 1)):
        return False
    if len(shape) != 4:
        return False
    n, h, w, c = shape
    if c != cin or cin % 128 or cout % 128:
        return False
    if w % 16:  # the [th, w, C] -> [th*w, C] merge needs sublane-tiled w
        return False
    if h * w < 128 * 128:  # below this XLA's fusions win (64^2 measured)
        return False
    return _pick_th(h, w, cin, cout, itemsize) >= 1


def _conv3x3_impl(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                  interpret: bool | None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    th = _pick_th(h, w, cin, cout, x.dtype.itemsize)
    if th < 1:
        # No VMEM-feasible tile at this dtype (the dispatch gate should
        # have caught this; be safe rather than ZeroDivisionError).
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(y.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(n * (h + 2), w + 2, cin)
    xsh = jnp.stack([xp[:, d:d + w, :] for d in range(3)], 0)
    w9 = kernel.reshape(9, cin, cout).astype(x.dtype)
    b2 = bias.reshape(1, cout).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_kernel, th=th, hp=h + 2, w=w, cin=cin,
                          cout=cout),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, cin, cout), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, th + 2, w, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xsh, w9, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_pallas(x, kernel, bias, interpret: bool | None = None):
    """stride-1 SAME 3x3 conv, NHWC x [3,3,Cin,Co] -> NHWC.

    Forward on the Pallas kernel; backward through XLA convs (exact)."""
    return _conv3x3_impl(x, kernel, bias, interpret)


def _fwd(x, kernel, bias, interpret):
    return _conv3x3_impl(x, kernel, bias, interpret), (x, kernel, bias)


def _bwd(interpret, res, g):
    x, kernel, bias = res
    # dL/dx: correlate g with the kernel flipped in (ky, kx) and transposed
    # in (Cin, Co); dL/dW: correlate x with g over the batch.
    k_flip = jnp.flip(kernel, axis=(0, 1)).swapaxes(2, 3)
    dx = jax.lax.conv_general_dilated(
        g, k_flip.astype(g.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dw = jax.lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0), g.transpose(1, 2, 0, 3),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).transpose(1, 2, 0, 3)
    db = jnp.sum(g, axis=(0, 1, 2), dtype=jnp.float32)
    # Cotangents must match the PRIMAL dtypes: the kernel arrives bf16 in a
    # bf16 model but the bias stays an fp32 param (layers.Conv casts kernel
    # with astype(self.dtype), never the bias) — casting db to kernel.dtype
    # made JAX reject the custom VJP mid-training.
    return (dx.astype(x.dtype), dw.astype(kernel.dtype),
            db.astype(bias.dtype))


conv3x3_pallas.defvjp(_fwd, _bwd)

"""Pallas TPU kernel: direct 3x3x3 stride-1 Conv3D (+ fused affine/ReLU).

Why: the DCANet hot path is 3D convs over (B, D, H/4, W/4, 32) cost volumes
(reference models/submodule.py:121-124 `convbn_3d` stacks). XLA's native
Conv3D at C_in=C_out=32 runs at ~16 TFLOPS on a chip whose MXU peaks at
~400 TFLOPS bf16 (measured, tools/bench_matmul.py): a 32x32 channel tile
lights up 32/128 x 32/128 = 6% of the systolic array, and the im2col
alternatives blow up HBM traffic 9-27x.

Design:
  * K-dim = (kd, C_in) = 3*C  -> built by a cheap in-VMEM lane concat of the
    three D-neighbor planes (96 or 192 lanes; dense, MXU-aligned).
  * N-dim = (kh, kw, C_out) = 9*C_out -> the 9 spatial taps are FOLDED INTO
    THE MATMUL WIDTH (9*32 = 288 lanes), then resolved by 9 statically
    shifted adds on the VPU. One matmul per (d-plane, row-tile) at
    K=3C, N=9Co instead of 27 tiny 32x32 matmuls.
  * Halos: the input is zero-padded (D+2, H+2, W+2) and pre-tiled along H
    with a 2-row overlap by one XLA strided copy, so every Pallas block is a
    plain non-overlapping BlockSpec and the standard block pipeline
    double-buffers all HBM traffic. Per-plane traffic is 3 row-tiles
    (the kd neighbors) ~= 3.4x the volume, ~0.4 ms at 384x1248 -- overlapped
    with the matmuls.
  * Epilogue: optional per-channel scale/bias + ReLU fused into the output
    write (inference BatchNorm folds to an affine; unfused it would cost an
    extra full HBM round-trip, which is comparable to the whole conv).

Numerics: the big matmul accumulates in f32 on the MXU; the (TH+2, W+2, 9Co)
partial-product tile is kept in f32 through the shifted adds.

Backward (custom_vjp): dgrad is itself a 3x3x3 stride-1 conv of the padded
output grad with the flipped/transposed kernel, so it reuses this same
kernel; wgrad is a small-output correlation left to XLA.

Equivalence vs lax.conv_general_dilated is tested in
tests/test_kernels.py (CPU interpret mode + TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8  # output rows per program (halo overhead 2/TH; VMEM ~(TH+2) rows)

# Tests flip this to run the kernel in the Pallas interpreter on CPU.
_INTERPRET = False


def _kernel(x0_ref, x1_ref, x2_ref, w_ref, sb_ref, out_ref, *, relu: bool):
    # x*_ref: (1, 1, 1, TH+2, Wp, C) the three kd input planes (zero-padded)
    # w_ref:  (3C, 3, 3Co)  K=(kd,c), middle=kh, N=(kw,co)
    # sb_ref: (2, Co) [scale; bias]
    # out_ref:(1, 1, 1, TH, W, Co)
    th2, wp, c = x0_ref.shape[3:]
    w_out = out_ref.shape[4]
    co = out_ref.shape[5]
    th = th2 - 2

    xcat = jnp.concatenate(
        [x0_ref[0, 0, 0], x1_ref[0, 0, 0], x2_ref[0, 0, 0]], axis=-1
    )  # (TH+2, Wp, 3C)

    # kh via 3 sublane-sliced matmuls accumulating in f32; N=(kw,co)=3Co
    # stays a single f32 buffer of (TH, Wp, 3Co) — fits scoped VMEM (16 MB).
    y = None
    for kh in range(3):
        part = jax.lax.dot_general(
            xcat[kh : kh + th], w_ref[:, kh, :],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = part if y is None else y + part

    # out[h, w, co] = sum_kw y[h, w+kw, kw*Co + co]
    acc = (
        y[:, 0:w_out, 0:co]
        + y[:, 1 : 1 + w_out, co : 2 * co]
        + y[:, 2 : 2 + w_out, 2 * co : 3 * co]
    )

    scale = sb_ref[0, :].astype(jnp.float32)
    bias = sb_ref[1, :].astype(jnp.float32)
    acc = acc * scale[None, None, :] + bias[None, None, :]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0, 0, 0] = acc.astype(out_ref.dtype)


def _row_tiles(xpad, th):
    """(B, D2, H2, Wp, C) -> (B, D2, NT, TH+2, Wp, C) overlapping row tiles.

    Tile nt covers padded rows [nt*th, nt*th + th + 2); requires
    (H2 - 2) % th == 0 (callers pad H first). Built from two contiguous
    reshapes + a concat (plain copies — a row gather here measured 4x
    slower than the copy roofline).
    """
    b, d2, h2, wp, c = xpad.shape
    nt = (h2 - 2) // th
    body = xpad[:, :, : nt * th].reshape(b, d2, nt, th, wp, c)
    halo = jnp.pad(xpad[:, :, th:], ((0, 0),) * 2 + ((0, th - 2),) + ((0, 0),) * 2)
    halo = halo.reshape(b, d2, nt, th, wp, c)[:, :, :, :2]
    return jnp.concatenate([body, halo], axis=3)


def conv3d_pallas(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    relu: bool = False,
) -> jnp.ndarray:
    """3x3x3 stride-1 'SAME'(pad 1) conv: (B,D,H,W,C) x (3,3,3,C,Co)
    -> (B,D,H,W,Co), optionally fused with per-channel affine + ReLU."""
    b, d, h, wd, c = x.shape
    assert w.shape[:3] == (3, 3, 3) and w.shape[3] == c, w.shape
    co = w.shape[4]

    th = TH
    hp = -h % th  # pad H to a multiple of TH
    wp8 = -(wd + 2) % 8  # pad Wp to sublane multiple
    xpad = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1 + hp), (1, 1 + wp8), (0, 0))
    )  # (B, D+2, H+2+hp, Wp, C)
    tiles = _row_tiles(xpad, th)
    nt = tiles.shape[2]
    wp = tiles.shape[4]

    # (3, 3, 3, C, Co) -> (K=(kd, c), kh, N=(kw, co))
    wmat = jnp.transpose(w, (0, 3, 1, 2, 4)).reshape(3 * c, 3, 3 * co)
    wmat = wmat.astype(x.dtype)

    if scale is None:
        scale = jnp.ones((co,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((co,), jnp.float32)
    sb = jnp.stack([scale, bias]).astype(jnp.float32)  # (2, Co)

    in_plane = lambda kd: pl.BlockSpec(
        (1, 1, 1, th + 2, wp, c),
        lambda bi, di, ti, kd=kd: (bi, di + kd, ti, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, relu=relu),
        grid=(b, d, nt),
        in_specs=[
            in_plane(0),
            in_plane(1),
            in_plane(2),
            pl.BlockSpec(
                (3 * c, 3, 3 * co), lambda bi, di, ti: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2, co), lambda bi, di, ti: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, th, wd, co),
            lambda bi, di, ti: (bi, di, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, nt, th, wd, co), x.dtype),
        interpret=_INTERPRET,
    )(tiles, tiles, tiles, wmat, sb)

    out = out.reshape(b, d, nt * th, wd, co)
    return out[:, :, :h]


def conv3d_xla(x, w):
    """Reference formulation (same semantics) for CPU/tests/fallback."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def supports_conv3d_pallas(x_shape, w_shape) -> bool:
    if len(w_shape) != 5 or w_shape[:3] != (3, 3, 3):
        return False
    b, d, h, wd, c = x_shape
    # lane-dim concat wants C a multiple of 8 at least; W wide enough to tile
    return c % 8 == 0 and wd >= 8 and d >= 1


# ---------------------------------------------------------------------------
# kd-fold formulation (the fast path, r2): one batched 2D conv + Pallas
# epilogue.
#
# Measured on v5e at the bench shape (48, 96, 312, 32->32), bf16:
#   native XLA conv3d      4.84 ms (16 TFLOPS)
#   dslice (3x 2D convs)   3.45 ms (23 TFLOPS)   <- r1 fast path
#   direct Pallas kernel   5.5  ms (14 TFLOPS)   <- Mosaic matmul ceiling
#                                                   ~15-18 TFLOPS at these
#                                                   K/N; a dead end
#   conv2d k3 32->96 alone 0.92 ms (86 TFLOPS!)  <- D in batch, (kd,co) in
#                                                   output channels
# The 3x3x3 conv == conv2d(D-in-batch, C_out=3*co, kd-major) followed by
# out[d] = sum_kd y[d+kd-1][kd-th channel block]. XLA executes those
# D-shifted lane-sliced adds at only ~195 GB/s (1.9 ms); this Pallas epilogue
# does them in one pass (plus optional fused bias/ReLU for the folded-BN eval
# path). Replaces the hot loop of reference models/submodule.py:121-124.
# ---------------------------------------------------------------------------

EPI_TH = 16  # epilogue rows per program


def _kdfold_epilogue_kernel(y0, y1, y2, b_ref, out, *, co: int, nd: int, relu: bool):
    # y*: (1, 1, TH, W, 3co) = y planes d-1, d, d+1 (index-clamped at edges)
    # out: (1, 1, TH, W, co);  out[d] = y[d-1][blk0] + y[d][blk1] + y[d+1][blk2]
    di = pl.program_id(1)
    acc = y1[0, 0][..., co : 2 * co].astype(jnp.float32)
    acc += jnp.where(di > 0, y0[0, 0][..., 0:co].astype(jnp.float32), 0.0)
    acc += jnp.where(di < nd - 1, y2[0, 0][..., 2 * co : 3 * co].astype(jnp.float32), 0.0)
    acc += b_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out[0, 0] = acc.astype(out.dtype)


def _kdfold_epilogue_pallas(y, bias, relu: bool):
    b, d, h, wd, c3 = y.shape
    co = c3 // 3
    th = next((t for t in (16, 8, 4) if h % t == 0), None)
    assert th is not None, h

    plane = lambda kd: pl.BlockSpec(
        (1, 1, th, wd, c3),
        lambda bi, di, ti, kd=kd: (bi, jnp.clip(di + kd - 1, 0, d - 1), ti, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_kdfold_epilogue_kernel, co=co, nd=d, relu=relu),
        grid=(b, d, h // th),
        in_specs=[
            plane(0),
            plane(1),
            plane(2),
            pl.BlockSpec((1, co), lambda bi, di, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, th, wd, co),
            lambda bi, di, ti: (bi, di, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, h, wd, co), y.dtype),
        interpret=_INTERPRET,
    )(y, y, y, bias.reshape(1, co))


def _kdfold_epilogue_xla(y, bias, relu: bool):
    """Reference/fallback formulation of the epilogue (same math)."""
    co = y.shape[-1] // 3
    z = jnp.zeros_like(y[:, :1, :, :, 0:co])
    out = (
        jnp.concatenate([z, y[:, :-1, :, :, 0:co]], axis=1)
        + y[:, :, :, :, co : 2 * co]
        + jnp.concatenate([y[:, 1:, :, :, 2 * co : 3 * co], z], axis=1)
    )
    out = out + bias.astype(out.dtype)
    return jnp.maximum(out, 0.0) if relu else out


@jax.custom_vjp
def kdfold_epilogue(y):
    """out[b,d,h,w,o] = sum_kd y[b, d+kd-1, h, w, kd*co + o] (zero at D edges).

    Differentiable (training path): the backward is the mirrored D-shift
    writing the three channel blocks, done in XLA.
    """
    return _kdfold_epilogue_pallas(y, jnp.zeros((y.shape[-1] // 3,), jnp.float32), False)


def _epi_fwd(y):
    return kdfold_epilogue(y), None


def _epi_bwd(_, g):
    # y[p, blk0] feeds out[p+1]; y[p, blk1] -> out[p]; y[p, blk2] -> out[p-1]
    z = jnp.zeros_like(g[:, :1])
    dy = jnp.concatenate(
        [
            jnp.concatenate([g[:, 1:], z], axis=1),
            g,
            jnp.concatenate([z, g[:, :-1]], axis=1),
        ],
        axis=-1,
    )
    return (dy,)


kdfold_epilogue.defvjp(_epi_fwd, _epi_bwd)


def _kdfold_conv2d(x, w, scale=None):
    """The matmul part: (B,D,H,W,C) x (3,3,3,C,Co) -> (B,D,H,W,3Co) via one
    2D conv with D folded into batch and kd into output channels (kd-major).
    `scale` (per-out-channel, e.g. folded eval-BN) multiplies the weights."""
    b, d, h, wd, c = x.shape
    co = w.shape[4]
    w2 = jnp.concatenate([w[0], w[1], w[2]], axis=-1)  # (3, 3, C, 3co)
    if scale is not None:
        w2 = w2 * jnp.tile(scale.astype(w2.dtype), 3)
    y = jax.lax.conv_general_dilated(
        x.reshape(b * d, h, wd, c), w2, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(b, d, h, wd, 3 * co)


def supports_kdfold(x_shape, w_shape) -> bool:
    if len(w_shape) != 5 or w_shape[:3] != (3, 3, 3):
        return False
    b, d, h, wd, c = x_shape
    co = w_shape[4]
    return co % 8 == 0 and any(h % t == 0 for t in (16, 8, 4)) and d >= 2


def conv3d_kdfold(x, w):
    """Differentiable fast 3x3x3 stride-1 SAME conv (training + eval).
    ~1.8x over the r1 dslice path at the bench shape."""
    return kdfold_epilogue(_kdfold_conv2d(x, w))


def conv3d_kdfold_fused(x, w, scale, bias, relu: bool = False):
    """Eval-only fused variant: folded-BN scale into the conv weights, bias +
    ReLU fused into the epilogue write. NOT differentiable (inference path)."""
    y = _kdfold_conv2d(x, w, scale=scale)
    return _kdfold_epilogue_pallas(y, bias.astype(jnp.float32), relu)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_fast(x, w, relu: bool = False):
    """Pallas conv3d with XLA-formulated backward. No affine fusion here —
    training uses unfused BN (batch stats depend on the conv output)."""
    return conv3d_pallas(x, w, relu=relu)


def _fwd(x, w, relu):
    y = conv3d_pallas(x, w, relu=relu)
    return y, (x, w, y if relu else None)


def _bwd(relu, res, g):
    x, w, y = res
    if relu and y is not None:
        g = jnp.where(y > 0, g, 0.0).astype(g.dtype)
    # dgrad: conv of g with spatially flipped, in/out-transposed kernel —
    # reuse the Pallas forward.
    w_flip = jnp.flip(w, axis=(0, 1, 2))
    w_t = jnp.transpose(w_flip, (0, 1, 2, 4, 3))  # (3,3,3,Co,C)
    dx = conv3d_pallas(g, w_t)
    # wgrad: correlation x * g — small output (3,3,3,C,Co), XLA reduce.
    dw = jax.lax.conv_general_dilated(
        jnp.transpose(x, (4, 1, 2, 3, 0)),  # C as batch -> feature grads
        jnp.transpose(g, (1, 2, 3, 0, 4)),  # spatial x batch -> kernel
        window_strides=(1, 1, 1),
        padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    dw = jnp.transpose(dw, (1, 2, 3, 0, 4))
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3d_fast.defvjp(_fwd, _bwd)

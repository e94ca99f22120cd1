"""Flat-dialect subpixel transposed Conv3D (kernel 3, stride 2, padding 1,
output_padding 1 -> exact 2x upsampling) with fused residual epilogues.

Why: the MultiAggregation tail `relu(BN(deconv(y)) + redir(x))` (reference
models/augment/cva.py:20-31) measured 2.5+ ms of pure seam overhead on v5e:
XLA's lhs-dilated conv emitter picks a W-split batch layout for the deconv
output, and the residual-add consumer forces TWO full-volume relayout copies
(seen in optimized HLO: `copy.9` + `copy.11` around `convolution_select_fusion`
at the 48x96x312x32 bench shape). The pure add is 0.34 ms; the composition
costs 2.4-2.7 ms however the deconv is formulated — the fix is to never hand
XLA a "conv output + elementwise add in conv-hostile layout" seam at all.

Subpixel decomposition (per dim, derived from the lhs-dilated correlation
y[o] = sum_t w[t] * x[(o+t-1)/2] over taps with (o+t-1) even):
  even o = 2i:   y[o] = w[1] @ x[i]                  (window offset 0)
  odd  o = 2i+1: y[o] = w[0] @ x[i] + w[2] @ x[i+1]  (window offsets 0, 1)
so the 2x transposed conv == a dense 2x2x2 window conv producing 8 parity
outputs per input cell, interleaved back (depth-to-space). In the repo's flat
kd-fold dialect (kernels/conv3d.py) that becomes:
  step 1: one 2D conv, D folded into batch, the D-window offset sd folded
          into output channels: (B*D8, H8, W8, Ci) x (2, 2, Ci, 2*8*Co),
          N = 2*8*Co = 512 lanes at Co=32 — MXU-wide.
  step 2: a fixed 0/1 selection conv over (D, H8*W8) with kernel (2,1),
          resolving out8[i] = y1[i][sd=0 block] + y1[i+1][sd=1 block].
  step 3: relu + packed adds while still in the (pd,ph,pw,co) packed domain,
          then ONE interleave into the standard layout as the final write.
Residuals ride the step-1 sd=0 channel block (each output cell reads that
block exactly once), the same injection slot as the kd-fold eval-BN bias.

`pack2x_pointwise` puts a pointwise(-conv)ed full-res volume INTO the packed
domain on the conv path (two 0/1-select convs): the naive space_to_depth
transpose of a 92 MB volume measured 2.2 ms; this form rides XLA's conv
layouts instead. It carries the `redir` 1x1x1 ConvBN (and any plain residual,
w=None) into the packed add for free.

Measured (tools/profile_deconv_subpixel.py, deconv input (1,24,48,156,64)):
  lhs-dilated deconv alone          0.78 ms
  ... + residual add + relu         2.21-2.73 ms  (any formulation)
  THIS, incl. packed add + interleave  1.18 ms

All ops are plain XLA convs/reshapes: differentiable, SPMD-shardable.
Parity vs the lhs-dilated reference: tests/test_fold_eval.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# per-dim subpixel tap map: output parity p -> [(window offset s, kernel tap t)]
_TAPS = {0: [(0, 1)], 1: [(0, 0), (1, 2)]}


@functools.lru_cache(maxsize=None)
def _subpixel_select_np():
    """(2,2,2,8,3,3,3) 0/1 tensor M[sd,sh,sw,p,td,th,tw]: which original
    kernel tap lands at window offset (sd,sh,sw) for parity class p."""
    m = np.zeros((2, 2, 2, 8, 3, 3, 3), np.float32)
    for pd in (0, 1):
        for ph in (0, 1):
            for pw in (0, 1):
                p = pd * 4 + ph * 2 + pw
                for sd, td in _TAPS[pd]:
                    for sh, th in _TAPS[ph]:
                        for sw, tw in _TAPS[pw]:
                            m[sd, sh, sw, p, td, th, tw] = 1.0
    return m


def _subpixel_weights(w):
    """(3,3,3,Ci,Co) lhs-dilated-correlation kernel -> (2,2,Ci,2*8*Co) flat
    step-1 weight, channel blocks sd-major then (pd,ph,pw,co). Traceable
    (w may carry a folded eval-BN scale)."""
    ci, co = w.shape[3], w.shape[4]
    m = jnp.asarray(_subpixel_select_np(), w.dtype)
    # w8[sd,sh,sw,ci,p,co]
    w8 = jnp.einsum("abcpdef,defio->abcipo", m, w)
    w8 = w8.reshape(2, 2, 2, ci, 8 * co)
    return jnp.concatenate([w8[0], w8[1]], axis=-1)  # (2,2,ci,16co)


@functools.lru_cache(maxsize=None)
def _sd_select_np(co8: int):
    """(2,1,2*co8,co8): S[sd,0,sd*co8+j,j] = 1 — step-2 selection kernel."""
    s = np.zeros((2, 1, 2 * co8, co8), np.float32)
    idx = np.arange(co8)
    for sd in range(2):
        s[sd, 0, sd * co8 + idx, idx] = 1.0
    return s


@functools.lru_cache(maxsize=None)
def _hw_parity_np(q: int = 4):
    """(2,2,4) P[sh,sw,(ph*2+pw)] = delta — pack step-1 parity selector."""
    p = np.zeros((2, 2, 4), np.float32)
    for ph in (0, 1):
        for pw in (0, 1):
            p[ph, pw, ph * 2 + pw] = 1.0
    return p


@functools.lru_cache(maxsize=None)
def _d_parity_np(co4: int):
    """(2,1,co4,2*co4): S[sd,0,j, sd*co4+j] = 1 — pack step-2: D parity into
    the (pd) channel block."""
    s = np.zeros((2, 1, co4, 2 * co4), np.float32)
    idx = np.arange(co4)
    for sd in range(2):
        s[sd, 0, idx, sd * co4 + idx] = 1.0
    return s


def _conv2d(x, w, strides, padding):
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _sd_shift_enabled(site: str) -> bool:
    """Per-site A/B knob for the packed-dialect step-2 selects.

    DCANET_SD_SELECT = "conv" (default) | "shift" | comma list of sites
    ("s2", "avgpool", "deconv", "pack"). Unlike the 3D kd-select (where the
    shifted-add form wins 2.2x — kernels/conv3d.py), the packed selects sit
    between convs in conv-friendly layouts and the conv form FUSES: full
    eval model measured 62.06 ms (conv) vs 64.50 ms (all-shift), so conv
    stays the default. The knob records the measurement and keeps the A/B
    reproducible."""
    import os

    v = os.environ.get("DCANET_SD_SELECT", "conv")
    if v in ("conv", ""):
        return False
    if v == "shift":
        return True
    return site in v.split(",")


def _sd_select(y1, co: int, site: str = "s2"):
    """out[d] = y1[d-1, :co] + y1[d, co:] (zero pad at d=0) — the step-2
    sd-tap resolution. y1: (B, D, X, 2co) -> (B, D, X, co)."""
    if not _sd_shift_enabled(site):
        sel = jnp.asarray(_sd_select_np(co), y1.dtype)
        return jax.lax.conv_general_dilated(
            y1, sel, (1, 1), ((1, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    d = y1.shape[1]
    y0 = jnp.pad(y1[..., :co], ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :d]
    return y0 + y1[..., co:]


def interleave2x(z, co: int):
    """(B, D8, H8, W8, 8*co) packed (pd,ph,pw,co) -> (B, 2D8, 2H8, 2W8, co)."""
    b, d8, h8, w8, _ = z.shape
    z = z.reshape(b, d8, h8, w8, 2, 2, 2, co)
    z = z.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return z.reshape(b, 2 * d8, 2 * h8, 2 * w8, co)


def pack2x_pointwise(x, w=None, bias=None, shift_d=None):
    """Packed space-to-depth of `pointwise_conv(x, w) + bias` on the conv
    path. x: (B, D, H, W, Ci), D/H/W even; w: (Ci, Co) or None (identity
    pack, Co=Ci); bias: (Co,) or None. Returns (B, D/2, H/2, W/2, 8*Co)
    with channel order (pd, ph, pw, co).

    `shift_d` overrides the step-2 dialect per call site: True = lane concat
    of even/odd D planes (free; no stored select activation — the TRAIN
    path's choice), False = the 0/1 selection conv (fuses into the packed
    EVAL dialect), None = the DCANET_SD_SELECT knob default."""
    b, d, h, wd, ci = x.shape
    if w is None:
        w = jnp.eye(ci, dtype=x.dtype)
    co = w.shape[1]
    p = jnp.asarray(_hw_parity_np(), x.dtype)  # (2,2,4)
    wp = jnp.einsum("abq,io->abiqo", p, w.astype(x.dtype))
    wp = wp.reshape(2, 2, ci, 4 * co)
    z = _conv2d(x.reshape(b * d, h, wd, ci), wp, (2, 2), ((0, 0), (0, 0)))
    z = z.reshape(b, d, (h // 2) * (wd // 2), 4 * co)
    if _sd_shift_enabled("pack") if shift_d is None else shift_d:
        # D-parity into the pd channel block == lane concat of the even and
        # odd D planes (the 0/1 selection conv burns 23 GF of dense matmul)
        z = jnp.concatenate([z[:, 0::2], z[:, 1::2]], axis=-1)
    else:
        s2 = jnp.asarray(_d_parity_np(4 * co), x.dtype)  # (2,1,4co,8co)
        z = jax.lax.conv_general_dilated(
            z, s2, (2, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, D/2, H8*W8, 8co)
    if bias is not None:
        z = z + jnp.tile(bias.astype(jnp.float32), 8).astype(z.dtype)
    return z.reshape(b, d // 2, h // 2, wd // 2, 8 * co)


def packed_pointwise(z, w, bias=None):
    """Pointwise conv INSIDE the packed domain: z (B, D8, H8, W8, 8*Ci),
    w (Ci, Co) -> (B, D8, H8, W8, 8*Co). A pointwise conv commutes with the
    space-to-depth rearrangement. Computed as ONE flat matmul against the
    block-diagonal (8Ci, 8Co) kernel: 8x the FLOPs of the per-block einsum
    but a single 256-lane GEMM with no minor-dim split — the einsum's
    (..., 8, Ci) reshape measured +0.6 ms of relayout in composition."""
    b, d8, h8, w8, c8 = z.shape
    ci = c8 // 8
    co = w.shape[1]
    kbd = jax.scipy.linalg.block_diag(*([w.astype(z.dtype)] * 8))  # (8ci, 8co)
    y = jax.lax.dot_general(
        z.reshape(-1, c8), kbd, (((1,), (0,)), ((), ()))
    )
    if bias is not None:
        y = y + jnp.tile(bias.astype(jnp.float32), 8).astype(y.dtype)
    return y.reshape(b, d8, h8, w8, 8 * co)


@functools.lru_cache(maxsize=None)
def _s2_tap_np():
    """T[s, p, t]: stride-2 kernel-3 conv reading a 2x-packed axis — window
    cell offset s (0 = cell i-1, 1 = cell i), input parity p, original
    kernel tap t. Derivation: out[i] = sum_t w[t] x[2i+t-1]; x[2i-1] =
    (cell i-1, parity 1), x[2i] = (i, 0), x[2i+1] = (i, 1)."""
    t = np.zeros((2, 2, 3), np.float32)
    t[0, 1, 0] = 1.0
    t[1, 0, 1] = 1.0
    t[1, 1, 2] = 1.0
    return t


def _from_packed_weights(w):
    """(3,3,3,Ci,Co) -> (2, 2, 8*Ci, 2*Co) flat step-1 weight for a stride-2
    conv consuming a packed volume: channel blocks (pd,ph,pw,ci) in,
    (sd, co) out."""
    ci, co = w.shape[3], w.shape[4]
    t = jnp.asarray(_s2_tap_np(), w.dtype)
    # [sh,sw,pd,ph,pw,ci,sd,co]
    w1 = jnp.einsum("apt,bqu,crv,tuvio->bcpqriao", t, t, t, w)
    return w1.reshape(2, 2, 8 * ci, 2 * co)


def conv3d_s2_from_packed(z, w, bias=None, relu: bool = False):
    """3x3x3 stride-2 SAME conv consuming a PACKED volume: z
    (B, D8, H8, W8, 8*Ci) [packed 2x of a (B, D, H, W, Ci) volume] with
    kernel w (3,3,3,Ci,Co) -> (B, D8, H8, W8, Co), the half-res output the
    plain stride-2 conv would produce. K = 4 window cells x 8*Ci channels
    (256-lane dense), N = 2*Co — the packed volume never unpacks.

    `bias` is injected once per output cell via the sd=1 step-2 block
    (every output reads that block exactly once); `relu` applies after."""
    b, d8, h8, w8, c8 = z.shape
    ci = c8 // 8
    co = w.shape[4]
    w1 = _from_packed_weights(w).astype(z.dtype)
    y1 = _conv2d(z.reshape(b * d8, h8, w8, c8), w1, (1, 1), ((1, 0), (1, 0)))
    y1 = y1.reshape(b, d8, h8 * w8, 2 * co)
    if bias is not None:
        bvec = jnp.concatenate(
            [jnp.zeros((co,), jnp.float32), bias.astype(jnp.float32)]
        )
        y1 = y1 + bvec.astype(y1.dtype)
    out = _sd_select(y1, co, site="s2").reshape(b, d8, h8, w8, co)
    return jax.nn.relu(out) if relu else out


def avgpool2x_from_packed(z):
    """AvgPool3d(3, stride 2, padding 1, count_include_pad) of the UNPACKED
    volume, computed directly from its packed form: z (B, D8, H8, W8, 8*C)
    -> (B, D8, H8, W8, C). The pool is linear, so it is the depthwise
    special case of conv3d_s2_from_packed with identity/27 taps."""
    c = z.shape[-1] // 8
    ones = jnp.full((3, 3, 3), 1.0 / 27.0, z.dtype)
    t = jnp.asarray(_s2_tap_np(), z.dtype)
    eye = jnp.eye(c, dtype=z.dtype)
    # [sh,sw,pd,ph,pw,ci,sd,co] with ci==co diagonal
    w1 = jnp.einsum("apt,bqu,crv,tuv,io->bcpqriao", t, t, t, ones, eye)
    b, d8, h8, w8, c8 = z.shape
    y1 = _conv2d(
        z.reshape(b * d8, h8, w8, c8),
        w1.reshape(2, 2, 8 * c, 2 * c),
        (1, 1), ((1, 0), (1, 0)),
    )
    y1 = y1.reshape(b, d8, h8 * w8, 2 * c)
    return _sd_select(y1, c, site="avgpool").reshape(b, d8, h8, w8, c)


def deconv2x_flat(
    y,
    w,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    packed_residual: Optional[jnp.ndarray] = None,
    post_packed_add: Optional[jnp.ndarray] = None,
    relu: bool = False,
    interleave: bool = True,
):
    """2x transposed conv (k3 s2 p1 op1, TorchConvTranspose geometry) of
    y: (B, D8, H8, W8, Ci) with kernel w: (3,3,3,Ci,Co), returning
    (B, 2*D8, 2*H8, 2*W8, Co) — or, with `interleave=False`, the PACKED
    (B, D8, H8, W8, 8*Co) form for consumers that stay in the packed
    dialect.

    scale/bias: folded eval-BN affine (f32, per Co) — scale into the kernel
    before the dtype cast, bias injected once via the step-1 sd=0 block.
    packed_residual: (B, D8, H8, W8, 8*Co) added INSIDE (pre-relu), i.e.
    relu(deconv + residual) — the MultiAggregation redir path.
    post_packed_add: same shape, added AFTER the relu (the model-level
    `cost0 + agg` residual).
    """
    b, d8, h8, w8, ci = y.shape
    co = w.shape[4]
    # shape-check the packed operands BEFORE reshaping: an accidentally
    # unpacked (B, 2D, 2H, 2W, Co) tensor has the same element count, so the
    # reshape would succeed and silently corrupt the output.
    packed_shape = (b, d8, h8, w8, 8 * co)
    if packed_residual is not None and packed_residual.shape != packed_shape:
        raise ValueError(
            f"packed_residual must be packed {packed_shape}, got {packed_residual.shape}"
        )
    if post_packed_add is not None and post_packed_add.shape != packed_shape:
        raise ValueError(
            f"post_packed_add must be packed {packed_shape}, got {post_packed_add.shape}"
        )
    if scale is not None:
        w = w * scale.astype(w.dtype)
    wflat = _subpixel_weights(w).astype(y.dtype)  # (2,2,ci,16co)
    y1 = _conv2d(y.reshape(b * d8, h8, w8, ci), wflat, (1, 1), ((0, 1), (0, 1)))
    y1 = y1.reshape(b, d8, h8 * w8, 16 * co)

    inj = None
    if bias is not None:
        inj = jnp.tile(bias.astype(jnp.float32), 8)  # (8co,) once per cell
    if packed_residual is not None:
        pr = packed_residual.reshape(b, d8, h8 * w8, 8 * co)
        inj = pr if inj is None else pr + inj.astype(pr.dtype)
    if inj is not None:
        if inj.ndim == 1:
            inj = jnp.concatenate([inj, jnp.zeros_like(inj)]).astype(y1.dtype)
            y1 = y1 + inj
        else:
            y1 = y1 + jnp.pad(
                inj.astype(y1.dtype),
                ((0, 0), (0, 0), (0, 0), (0, 8 * co)),
            )

    # out[d] = y1[d, :8co] + y1[d+1, 8co:] (bottom zero pad): the widest
    # select in the repo (16co=512 -> 8co=256 lanes, 94 GF as a dense-matmul
    # selection conv) — shifted lane-slice add unless DCANET_SD_SELECT=conv.
    if _sd_shift_enabled("deconv"):
        co8 = 8 * co
        znext = jnp.pad(y1[..., co8:], ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:]
        z = y1[..., :co8] + znext  # (B, D8, H8*W8, 8co)
    else:
        sel = jnp.asarray(_sd_select_np(8 * co), y1.dtype)
        z = jax.lax.conv_general_dilated(
            y1, sel, (1, 1), ((0, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, D8, H8*W8, 8co)
    if relu:
        z = jax.nn.relu(z)
    if post_packed_add is not None:
        z = z + post_packed_add.reshape(b, d8, h8 * w8, 8 * co).astype(z.dtype)
    z = z.reshape(b, d8, h8, w8, 8 * co)
    return interleave2x(z, co) if interleave else z


def supports_deconv2x_flat(x_shape) -> bool:
    """x_shape: the deconv INPUT (B, D8, H8, W8, Ci)."""
    return len(x_shape) == 5 and all(s >= 1 for s in x_shape[1:4])

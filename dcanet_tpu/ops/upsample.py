"""Resizing and convex (RAFT-style) upsampling.

Trilinear/bilinear resizes use half-pixel-center sampling, matching
`F.interpolate(..., align_corners=False)` used throughout the reference
(e.g. models/gwcnet_dca_g.py:251-264, models/augment/cva.py:64).

Convex upsampling matches `PropgationNet_4x/8x`
(reference models/submodule.py:357-392): a 3x3 neighborhood of the 4x-scaled
coarse disparity is blended with per-subpixel softmax masks predicted from
guidance features. The reference's `F.unfold` becomes a stack of 9 padded
shifts; the blend is an einsum; no big intermediate is materialized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_trilinear(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Trilinear (half-pixel) upsampling of the (D, H, W) axes by `scale`.

    x: (B, D, H, W) or (B, D, H, W, C).

    Perf note (v5e, measured): jax.image.resize's per-axis gather-matrix
    dot_generals run at 0.25 ms for the CVA 2x (24,48,156,32) case; an
    explicit separable shift/interleave closed form measured 4x SLOWER (the
    W-axis interleave relayout dominates) and regressed the full model
    77 -> 83 ms — keep the gather-matrix form.
    """
    if x.ndim == 4:
        b, d, h, w = x.shape
        shape = (b, d * scale, h * scale, w * scale)
    elif x.ndim == 5:
        b, d, h, w, c = x.shape
        shape = (b, d * scale, h * scale, w * scale, c)
    else:
        raise ValueError(f"expected rank 4/5, got {x.shape}")
    return jax.image.resize(x, shape, method="trilinear")


def resize_bilinear(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bilinear (half-pixel) upsampling of the (H, W) axes by `scale`.

    x: (B, H, W) or (B, H, W, C).
    """
    if x.ndim == 3:
        b, h, w = x.shape
        shape = (b, h * scale, w * scale)
    elif x.ndim == 4:
        b, h, w, c = x.shape
        shape = (b, h * scale, w * scale, c)
    else:
        raise ValueError(f"expected rank 3/4, got {x.shape}")
    return jax.image.resize(x, shape, method="bilinear")


def unfold3x3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 zero-padded neighborhood gather.

    x: (B, H, W) -> (B, H, W, 9) with neighbor index k = (dy+1)*3 + (dx+1),
    matching torch `F.unfold(x, [3, 3], padding=1)` channel ordering
    (reference models/submodule.py:368).
    """
    b, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    shifts = [
        xp[:, dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)
    ]
    return jnp.stack(shifts, axis=-1)


def convex_upsample(disp: jnp.ndarray, mask_logits: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Convex combination upsampling of a coarse disparity map.

    Args:
      disp:        (B, H, W) disparity at 1/scale resolution (in coarse-pixel
                   units; multiplied by `scale` here, as in the reference).
      mask_logits: (B, H, W, 9 * scale**2) guidance-predicted blend logits.
                   Channel layout c = k * scale**2 + i * scale + j with k the
                   3x3 neighbor index and (i, j) the subpixel, matching the
                   reference's `.view(b, 1, 9, s, s, h, w)` split
                   (models/submodule.py:369).

    Returns:
      (B, H*scale, W*scale) full-resolution disparity.
    """
    b, h, w = disp.shape
    s2 = scale * scale
    assert mask_logits.shape == (b, h, w, 9 * s2), mask_logits.shape

    neighbors = unfold3x3(scale * disp)  # (B, H, W, 9)
    mask = mask_logits.reshape(b, h, w, 9, s2)
    mask = jax.nn.softmax(mask, axis=3)
    up = jnp.einsum("bhwks,bhwk->bhws", mask, neighbors)  # (B, H, W, s2)
    up = up.reshape(b, h, w, scale, scale)
    # (B, H, s_i, W, s_j) -> (B, H*s, W*s); output pixel (h*s+i, w*s+j).
    up = up.transpose(0, 1, 3, 2, 4).reshape(b, h * scale, w * scale)
    return up

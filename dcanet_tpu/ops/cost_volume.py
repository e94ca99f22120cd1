"""Cost-volume construction ops.

Capability parity with the reference's `build_gwc_volume` /
`build_concat_volume` (reference: models/submodule.py:134-167), re-designed
for XLA: instead of in-place writes into a preallocated tensor (a Python
loop of strided stores), each disparity plane is produced as a pure slice +
pad and the planes are stacked, which XLA fuses into a single bandwidth-bound
loop nest. A hand-tiled Pallas kernel variant lives in
`dcanet_tpu.kernels.gwc`.

Layouts (channel-last, TPU-friendly):
    features:     (B, H, W, C)
    cost volume:  (B, D, H, W, C_out)   — D is the disparity axis.

Semantics (matching the reference):
    gwc[b, d, h, w, g]     = mean_{c in group g} L[b,h,w,c] * R[b,h,w-d,c]
    concat[b, d, h, w, :C] = L[b,h,w,:],  concat[..., C:] = R[b,h,w-d,:]
    with zeros for the occluded left margin w < d.
"""

from __future__ import annotations

import jax.numpy as jnp


def groupwise_correlation(fea1: jnp.ndarray, fea2: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """Per-group mean of the elementwise product of two feature maps.

    fea1, fea2: (..., C) with C % num_groups == 0. Returns (..., num_groups).
    Parity: reference models/submodule.py:148-154.
    """
    *lead, c = fea1.shape
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    cpg = c // num_groups
    prod = (fea1 * fea2).reshape(*lead, num_groups, cpg)
    return jnp.mean(prod, axis=-1)


def build_gwc_volume(
    left: jnp.ndarray,
    right: jnp.ndarray,
    maxdisp: int,
    num_groups: int,
) -> jnp.ndarray:
    """Grouped-correlation cost volume.

    left, right: (B, H, W, C) -> (B, maxdisp, H, W, num_groups).
    Parity: reference models/submodule.py:157-167 (NCHW in-place-store loop),
    re-expressed as slice/pad/stack so XLA fuses the whole build.
    """
    b, h, w, c = left.shape
    planes = []
    for d in range(maxdisp):
        if d == 0:
            corr = groupwise_correlation(left, right, num_groups)
        elif d >= w:  # fully occluded plane (narrow inputs)
            corr = jnp.zeros((b, h, w, num_groups), left.dtype)
        else:
            corr = groupwise_correlation(left[:, :, d:, :], right[:, :, : w - d, :], num_groups)
            corr = jnp.pad(corr, ((0, 0), (0, 0), (d, 0), (0, 0)))
        planes.append(corr)
    return jnp.stack(planes, axis=1)


def build_concat_volume(
    left: jnp.ndarray,
    right: jnp.ndarray,
    maxdisp: int,
) -> jnp.ndarray:
    """Concatenation cost volume.

    left, right: (B, H, W, C) -> (B, maxdisp, H, W, 2C); channel block [:C]
    holds the (zero-margined) left feature, [C:] the d-shifted right feature.
    Parity: reference models/submodule.py:134-145.
    """
    b, h, w, c = left.shape
    # Vectorized (single gather + broadcast) instead of a D-stage slice/pad
    # loop: keeps the HLO tiny and lets XLA fuse the masking. Fine for the
    # 12-channel concat features (the (B,D,H,W,C) intermediate is small); the
    # 320-channel gwc path keeps its slice loop / Pallas kernel instead.
    d_idx = jnp.arange(maxdisp)[:, None]  # (D, 1)
    w_idx = jnp.arange(w)[None, :]  # (1, W)
    mask = (w_idx >= d_idx).astype(left.dtype)[None, :, None, :, None]  # (1,D,1,W,1)
    src = jnp.clip(w_idx - d_idx, 0, w - 1).reshape(-1)  # (D*W,)

    right_sh = jnp.take(right, src, axis=2)  # (B, H, D*W, C)
    right_sh = right_sh.reshape(b, h, maxdisp, w, c).transpose(0, 2, 1, 3, 4)
    left_b = jnp.broadcast_to(left[:, None], (b, maxdisp, h, w, c))
    return jnp.concatenate([left_b * mask, right_sh * mask], axis=-1)

"""kh-fold 3x3 2D conv: the kd-fold trick one dimension down, for the
feature extractor's narrow convs.

The 2D extractor's 32-channel 3x3 convs (stem + layer1, 192x624 at the bench
shape) run at ~14 TFLOPS natively — the N=32 matmul lights up a quarter of
the MXU columns (same failure mode as the 3D convs before kd-fold;
reference hot path models/gwcnet_dca_g.py:19-38). Folding kh into the output
channels (N = 3*Co = 96) and resolving the taps with a fixed 0/1 selection
conv over H measures 0.56 ms vs 1.27 ms native for a 4-conv 32-ch chain
(tools/profile_conv2d_fold.py). At Co>=64 the native conv already tiles well
(0.37 vs 0.48 ms) — callers gate on Co<=32.

Step 1: (B,H,W,C) x (1,3,C,3Co) conv, kh-major output channels.
Step 2: out[h] = sum_kh y[h*stride + kh - 1][kh-block] as a (3,1)-kernel 0/1
conv over H. The folded eval-BN bias rides the kh=1 block of the step-1
output as a constant [0,b,0] vector (the center tap lands exactly once per
output row; the add fuses into the step-1 conv epilogue — in 2D there are no
reshapes between the convs at all). See kernels/conv3d.py for the 3D
measurements of the same construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _kh_select_np(co: int):
    """(3, 1, 3co, co) 0/1 kernel: S[kh, 0, kh*co + o, o] = 1. numpy-cached
    (a jnp constant would leak tracers under jit re-entry)."""
    import numpy as np

    s = np.zeros((3, 1, 3 * co, co), np.float32)
    idx = np.arange(co)
    for kh in range(3):
        s[kh, 0, kh * co + idx, idx] = 1.0
    return s


def supports_khfold(x_shape, w_shape, strides=(1, 1)) -> bool:
    if len(w_shape) != 4 or w_shape[:2] != (3, 3):
        return False
    if strides not in ((1, 1), (2, 2)):
        return False
    ci, co = w_shape[2], w_shape[3]
    # co > 32 measured slower than the native conv (N=128+ tiles fine);
    # ci < 8 (the RGB stem conv) leaves the K dim sub-lane-sized
    return co % 8 == 0 and co <= 32 and ci >= 8 and x_shape[1] >= 2


def conv2d_khfold(x, w, strides=(1, 1), bias=None, residual=None):
    """3x3 SAME (pad 1) conv, stride 1 or 2: (B,H,W,C) x (3,3,C,Co) ->
    (B,H',W',Co), fully XLA-differentiable. Optional fused per-channel
    `bias` (f32) via the kh=1 step-1 block; `residual` (output-shaped,
    stride-1 only) rides the same block as a full tensor — the BasicBlock
    residual add was exactly the seam that made kh-fold LOSE in-model at r2
    (tools/profile_feature.py: 7.7 vs 6.6 ms) despite the 2.3x isolated
    win."""
    co = w.shape[3]
    w1 = jnp.concatenate([w[0], w[1], w[2]], axis=-1)[None]  # (1,3,C,3Co)
    y = jax.lax.conv_general_dilated(
        x, w1, (1, strides[1]), [(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H, W', 3Co)
    if bias is not None:
        zero = jnp.zeros((co,), jnp.float32)
        y = y + jnp.concatenate([zero, bias.astype(jnp.float32), zero]).astype(y.dtype)
    if residual is not None:
        assert strides == (1, 1), "residual injection needs stride 1"
        y = y + jnp.pad(
            residual.astype(y.dtype), ((0, 0), (0, 0), (0, 0), (co, co))
        )
    import os

    if os.environ.get("DCANET_KH_SELECT", "shift") == "shift":
        # kh-tap resolution as shifted lane-slice adds (the 0/1 selection
        # conv is a dense 3co x co matmul of wasted FLOPs — see the 3D
        # kd-select measurements in kernels/conv3d.py): out[h] =
        # y[h·s-1, kh0] + y[h·s, kh1] + y[h·s+1, kh2], zero-padded at edges.
        h = y.shape[1]
        z = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0)))
        s = strides[0]
        return (
            z[:, 0 : h + 0 : s, :, :co]
            + z[:, 1 : h + 1 : s, :, co : 2 * co]
            + z[:, 2 : h + 2 : s, :, 2 * co :]
        )
    sel = jnp.asarray(_kh_select_np(co), y.dtype)
    return jax.lax.conv_general_dilated(
        y, sel, (strides[0], 1), [(1, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

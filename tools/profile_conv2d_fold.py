"""A/B the kh-fold trick for the 2D feature extractor's narrow convs.

The extractor (7.3 ms ~= 10% of eval) is 3x3 2D convs at C=32 (layer1,
192x624) and C=64 (layer2, 16 blocks at 96x312) — the same narrow-N MXU
problem the kd-fold solved for 3D. kh-fold: step 1 = (1,3) conv with kh
folded into output channels (N = 3*Co), step 2 = (3,1) select conv over H
with fixed 0/1 weights. The folded-BN bias rides the step-1 output's kh=1
block (conv epilogue add, no reshapes in 2D at all).

Usage: python tools/profile_conv2d_fold.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@functools.lru_cache(maxsize=None)
def _kh_select_np(co: int):
    s = np.zeros((3, 1, 3 * co, co), np.float32)
    idx = np.arange(co)
    for kh in range(3):
        s[kh, 0, kh * co + idx, idx] = 1.0
    return s


def conv2d_khfold(x, w, strides=(1, 1), bias=None):
    """(B,H,W,C) x (3,3,C,Co), SAME pad 1 -> (B,H',W',Co)."""
    co = w.shape[3]
    w1 = jnp.concatenate([w[0], w[1], w[2]], axis=-1)[None]  # (1,3,C,3Co)
    y = jax.lax.conv_general_dilated(
        x, w1, (1, strides[1]), [(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H, W', 3Co)
    if bias is not None:
        zero = jnp.zeros((co,), jnp.float32)
        y = y + jnp.concatenate([zero, bias, zero]).astype(y.dtype)
    sel = jnp.asarray(_kh_select_np(co), y.dtype)
    return jax.lax.conv_general_dilated(
        y, sel, (strides[0], 1), [(1, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv2d_native(x, w, strides=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, strides, [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    from dcanet_tpu.utils.profiling import device_time

    key = jax.random.PRNGKey(0)

    # correctness
    x = jax.random.normal(key, (1, 16, 24, 8), jnp.float32)
    w = jax.random.normal(key, (3, 3, 8, 8), jnp.float32) * 0.2
    b = jax.random.normal(key, (8,), jnp.float32)
    want = conv2d_native(x, w) + b
    got = conv2d_khfold(x, w, bias=b)
    print("max|diff| =", float(jnp.max(jnp.abs(want - got))), flush=True)
    want2 = conv2d_native(x, w, (2, 2)) + b
    got2 = conv2d_khfold(x, w, (2, 2), bias=b)
    print("s2 max|diff| =", float(jnp.max(jnp.abs(want2 - got2))), flush=True)

    shapes = [
        ("layer1 (2,192,624,32)", (2, 192, 624, 32), 32),
        ("layer2 (2,96,312,64)", (2, 96, 312, 64), 64),
        ("layer3 (2,96,312,128)", (2, 96, 312, 128), 128),
    ]
    for name, xs, co in shapes:
        xb = jax.random.normal(key, xs, jnp.bfloat16)
        wb = jax.random.normal(key, (3, 3, xs[-1], co), jnp.bfloat16) * 0.05
        bb = jax.random.normal(key, (co,), jnp.float32) * 0.1
        sc = jax.random.normal(key, (co,), jnp.float32) * 0.1 + 1

        def chain_native(x):
            y = x
            for _ in range(4):
                y = jnp.maximum(conv2d_native(y, wb) * sc.astype(y.dtype)
                                + bb.astype(y.dtype), 0)
            return y

        def chain_fold(x):
            y = x
            for _ in range(4):
                y = jnp.maximum(
                    conv2d_khfold(y, wb * sc.astype(wb.dtype), bias=bb), 0)
            return y

        tn = device_time(chain_native, xb, iters=10)
        tf = device_time(chain_fold, xb, iters=10)
        print(f"{name:<24s} native {tn*1e3:7.2f} ms   khfold {tf*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()

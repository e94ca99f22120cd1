"""A/B: residual adds / affine+relu between kd-fold convs expressed on the
5D (B,D,H,W,C) form vs the flattened (B,D,H*W,C) form that matches the
kd-fold select-conv's native output shape.

Hypothesis: the observed seam overheads (dres0/1 chain 14.5 ms vs ~10 ms
sum-of-parts; MultiAggregation +2.5 ms on the residual relu-add) are retile
copies XLA inserts when a (d, h*w)-tiled conv output is reshaped to 5D and
then consumed by an elementwise op. Keeping the chain in the flat form should
make the reshape pairs cancel.

Chain (dres0+dres1, eval affine for BN): conv 64->32 +aff+relu, conv 32->32
+aff+relu, conv +aff+relu, conv +aff, residual add, relu? (ref: no relu after
the dres1 add). Shapes: (1, 48, 96, 312, *) bf16.

Usage: python tools/profile_flat_dialect.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dcanet_tpu.kernels.conv3d import _kd_select, _kdfold_conv2d


def conv5d(x, w):
    co = w.shape[4]
    y = _kdfold_conv2d(x, w)
    return _kd_select(y, co)


def conv_flat(xf, w, h, wd):
    """(B, D, HW, C) -> (B, D, HW, Co) via kd-fold; the select conv and all
    downstream elementwise ops stay on the flat (B, D, HW, *) form (step 1 is
    a spatial conv, it inherently needs the (H, W) view)."""
    from dcanet_tpu.kernels.conv3d import _kd_select_kernel

    b, d, hw, c = xf.shape
    co = w.shape[4]
    y = _kdfold_conv2d(xf.reshape(b, d, h, wd, c), w)
    yf = y.reshape(b, d, hw, 3 * co)
    sel = _kd_select_kernel(co, yf.dtype)
    return jax.lax.conv_general_dilated(
        yf, sel, (1, 1), [(1, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    from dcanet_tpu.utils.profiling import device_time

    key = jax.random.PRNGKey(0)
    D, H, W = 48, 96, 312
    x64 = jax.random.normal(key, (1, D, H, W, 64), jnp.bfloat16)
    ws = [
        jax.random.normal(jax.random.PRNGKey(i), (3, 3, 3, cin, 32), jnp.bfloat16) * 0.05
        for i, cin in enumerate([64, 32, 32, 32])
    ]
    sc = [jax.random.normal(jax.random.PRNGKey(10 + i), (32,), jnp.bfloat16) * 0.1 + 1
          for i in range(4)]
    bi = [jax.random.normal(jax.random.PRNGKey(20 + i), (32,), jnp.bfloat16) * 0.1
          for i in range(4)]

    def dres_5d(x):
        c0 = jnp.maximum(conv5d(x, ws[0]) * sc[0] + bi[0], 0)
        c0 = jnp.maximum(conv5d(c0, ws[1]) * sc[1] + bi[1], 0)
        y = jnp.maximum(conv5d(c0, ws[2]) * sc[2] + bi[2], 0)
        y = conv5d(y, ws[3]) * sc[3] + bi[3]
        return y + c0

    def dres_flat(x):
        b, d, h, wd, c = x.shape
        xf = x.reshape(b, d, h * wd, c)
        c0 = jnp.maximum(conv_flat(xf, ws[0], h, wd) * sc[0] + bi[0], 0)
        c0 = jnp.maximum(conv_flat(c0, ws[1], h, wd) * sc[1] + bi[1], 0)
        y = jnp.maximum(conv_flat(c0, ws[2], h, wd) * sc[2] + bi[2], 0)
        y = conv_flat(y, ws[3], h, wd) * sc[3] + bi[3]
        return (y + c0).reshape(b, d, h, wd, 32)

    a = jax.jit(dres_5d)(x64)
    b = jax.jit(dres_flat)(x64)
    print("max|diff| =", float(jnp.max(jnp.abs(a - b))), flush=True)

    for name, fn in [("dres 5d-adds", dres_5d), ("dres flat-adds", dres_flat)]:
        t = device_time(fn, x64, iters=10)
        print(f"{name:<18s}{t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Finer-grained bisect of the kd-fold chain epilogue cost.

profile_epilogue.py showed: pure 11.5 ms, +relu 11.5 (free), +affine+relu
14.2 (+0.67/conv), fused-scale-in-weights 14.2 (same) — so the cost is the
POST-SELECT BIAS-ADD, not the scale. This script isolates which epilogue
element breaks the fusion and tests alternatives that keep the bias out of
the post-select elementwise path.

Usage: python tools/profile_epilogue2.py
"""

from __future__ import annotations

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

from dcanet_tpu.kernels.conv3d import (
    _kd_select,
    _kd_select_np,
    _kdfold_conv2d,
    conv3d_kdfold,
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
    sc = [jax.random.normal(jax.random.PRNGKey(10 + i), (32,), jnp.float32) * 0.1 + 1
          for i in range(4)]
    bi = [jax.random.normal(jax.random.PRNGKey(20 + i), (32,), jnp.float32) * 0.1
          for i in range(4)]

    def chain(epi):
        def f(x):
            y = x
            for w, s, b in zip(ws, sc, bi):
                y = epi(conv3d_kdfold(y, w), s, b)
            return y
        return f

    def sel_scaled(y, co, scale):
        """select conv with the scale folded into the 0/1 selection weights."""
        b, d, h, wd, c3 = y.shape
        sel = jnp.asarray(_kd_select_np(co), y.dtype) * scale.astype(y.dtype)
        out = jax.lax.conv_general_dilated(
            y.reshape(b, d, h * wd, c3), sel, (1, 1), [(1, 1), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out.reshape(b, d, h, wd, co)

    def chain_selscale(bias_mode):
        def f(x):
            y = x
            for w, s, b in zip(ws, sc, bi):
                y1 = _kdfold_conv2d(y, w)
                y = sel_scaled(y1, 32, s)
                if bias_mode == "add":
                    y = jnp.maximum(y + b.astype(y.dtype), 0)
                else:
                    y = jnp.maximum(y, 0)
            return y
        return f

    const_b = [jnp.asarray(np.asarray(b), jnp.bfloat16) for b in bi]

    def chain_kd1bias(scale_in_w: bool):
        """Bias injected into the kd=1 block of the STEP-1 output as a
        constant [0, b, 0] lane vector: the select conv includes the center
        tap (kd=1, from y[d]) exactly once for every output plane d, so the
        select output gets +b exactly once — and the vector add fuses into
        the step-1 conv epilogue (singles fuse fine). Scale optionally folded
        into the step-1 weights (free)."""
        def f(x):
            y = x
            for w, s, b in zip(ws, sc, bi):
                w1 = w * s.astype(w.dtype) if scale_in_w else w
                y1 = _kdfold_conv2d(y, w1)
                bvec = jnp.concatenate(
                    [jnp.zeros((32,), jnp.float32), b, jnp.zeros((32,), jnp.float32)]
                ).astype(y1.dtype)
                y = jnp.maximum(_kd_select(y1 + bvec, 32), 0)
            return y
        return f

    cases = [
        ("kd1-bias (no scale)", chain_kd1bias(False)),
        ("kd1-bias + scale-in-w", chain_kd1bias(True)),
        ("relu only", chain(lambda y, s, b: jnp.maximum(y, 0))),
        ("bias(bf16)+relu", chain(lambda y, s, b: jnp.maximum(y + b.astype(y.dtype), 0))),
        ("bias(f32)+relu", chain(lambda y, s, b: jnp.maximum(y + b, 0).astype(y.dtype))),
        ("scale(bf16)+relu", chain(lambda y, s, b: jnp.maximum(y * s.astype(y.dtype), 0))),
        ("const-bias+relu", chain(lambda y, s, b: jnp.maximum(
            y + const_b[0], 0))),
        ("scale-in-select + bias", chain_selscale("add")),
        ("scale-in-select no bias", chain_selscale("none")),
    ]
    for name, fn in cases:
        t = device_time(fn, x64, iters=10)
        print(f"{name:<26s}{t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Third epilogue bisect: where can the folded-BN bias live without breaking
conv->conv fusion in kd-fold chains?

profile_epilogue2.py established (4-conv chain, (48,96,312), 64->32->32^3):
  relu only                11.5 ms   (epilogue-free baseline)
  bias post-select + relu  14.2 ms   (+0.68/conv — the seam)
  scale-in-select, no bias 11.5 ms   (scale is free in the select weights)
  bias on the 5D step-1 output  26.5 ms  (reshape-add-reshape kills fusion)

This script tests the FLAT dialect: every layer is
  conv2d on (B*D, H, W, Cin) -> [+bias vec on the raw 4D output]
  -> reshape (B, D, H*W, 3Co) -> select conv -> reshape (B*D, H, W, Co)
so the bias add sits directly on a conv output (singles fuse fine) and the
inter-layer reshapes are contiguous-major splits/merges that XLA can cancel.

Usage: python tools/profile_epilogue3.py
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

from dcanet_tpu.kernels.conv3d import _kd_select_kernel, conv3d_kdfold


def main():
    from dcanet_tpu.utils.profiling import device_time

    key = jax.random.PRNGKey(0)
    B, D, H, W = 1, 48, 96, 312
    x64 = jax.random.normal(key, (B, D, H, W, 64), jnp.bfloat16)
    ws = [
        jax.random.normal(jax.random.PRNGKey(i), (3, 3, 3, cin, 32), jnp.bfloat16) * 0.05
        for i, cin in enumerate([64, 32, 32, 32])
    ]
    bi = [jax.random.normal(jax.random.PRNGKey(20 + i), (32,), jnp.float32) * 0.1
          for i in range(4)]

    def w2of(w):  # (3,3,3,C,Co) -> (3,3,C,3Co) kd-major
        return jnp.concatenate([w[0], w[1], w[2]], axis=-1)

    def layer_flat(xf, w, b, bias_where: str):
        """xf: (B*D, H, W, Cin) -> (B*D, H, W, Co)."""
        co = w.shape[4]
        y = jax.lax.conv_general_dilated(
            xf, w2of(w), (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B*D, H, W, 3Co)
        if bias_where == "step1":
            zero = jnp.zeros((co,), jnp.float32)
            bvec = jnp.concatenate([zero, b, zero]).astype(y.dtype)
            y = y + bvec
        yf = y.reshape(B, D, H * W, 3 * co)
        sel = _kd_select_kernel(co, yf.dtype)
        out = jax.lax.conv_general_dilated(
            yf, sel, (1, 1), [(1, 1), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, D, H*W, Co)
        if bias_where == "post":
            out = out + b.astype(out.dtype)
        out = jnp.maximum(out, 0)
        return out.reshape(B * D, H, W, co)

    def chain_flat(bias_where):
        def f(x):
            y = x.reshape(B * D, H, W, x.shape[-1])
            for w, b in zip(ws, bi):
                y = layer_flat(y, w, b, bias_where)
            return y.reshape(B, D, H, W, 32)
        return f

    def chain_5d_post(x):
        y = x
        for w, b in zip(ws, bi):
            y = jnp.maximum(conv3d_kdfold(y, w) + b.astype(y.dtype), 0)
        return y

    def chain_5d_kd1(x):
        y = x
        for w, b in zip(ws, bi):
            y = jnp.maximum(conv3d_kdfold(y, w, bias=b), 0)
        return y

    # correctness cross-check
    a = jax.jit(chain_5d_post)(x64)
    for name, fn in [("flat step1-bias", chain_flat("step1")),
                     ("flat post-bias", chain_flat("post")),
                     ("5d kd1-bias", chain_5d_kd1)]:
        got = jax.jit(fn)(x64)
        diff = float(jnp.max(jnp.abs(a.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"{name}: max|diff| = {diff}", flush=True)

    for name, fn in [
        ("flat no-bias", chain_flat("none")),
        ("flat step1-bias", chain_flat("step1")),
        ("flat post-bias", chain_flat("post")),
        ("5d post-bias", chain_5d_post),
        ("5d kd1-bias", chain_5d_kd1),
    ]:
        t = device_time(fn, x64, iters=10)
        print(f"{name:<18s}{t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()

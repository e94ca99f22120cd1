"""Bisect the kd-fold chain overhead: pure convs vs +relu vs +affine+relu vs
the fused-epilogue form (scale folded into step-1 weights, bias+relu after
the select conv — conv3d_kdfold_fused).

Usage: python tools/profile_epilogue.py
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

from dcanet_tpu.kernels.conv3d import conv3d_kdfold, conv3d_kdfold_fused


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

    def chain_pure(x):
        y = x
        for w in ws:
            y = conv3d_kdfold(y, w)
        return y

    def chain_relu(x):
        y = x
        for w in ws:
            y = jnp.maximum(conv3d_kdfold(y, w), 0)
        return y

    def chain_affine(x):
        y = x
        for w, s, b in zip(ws, sc, bi):
            y = jnp.maximum(conv3d_kdfold(y, w) * s.astype(x.dtype)
                            + b.astype(x.dtype), 0)
        return y

    def chain_fused(x):
        y = x
        for w, s, b in zip(ws, sc, bi):
            y = conv3d_kdfold_fused(y, w, s, b, relu=True)
        return y

    a = jax.jit(chain_affine)(x64)
    b = jax.jit(chain_fused)(x64)
    print("fused max|diff| =",
          float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
          flush=True)

    for name, fn in [("pure convs", chain_pure), ("+relu", chain_relu),
                     ("+affine+relu", chain_affine), ("fused epilogue", chain_fused)]:
        t = device_time(fn, x64, iters=10)
        print(f"{name:<16s}{t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()

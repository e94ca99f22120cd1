"""Micro-probe: which epilogue forms fuse into the kd-fold select conv?

single conv (1,48,96,312,32)->32 bf16; epilogues:
  none          — conv only
  relu          — relu(conv)            (known to fuse, +0.04)
  bias_param    — conv + b (runtime array)
  affine_param  — conv * s + b (runtime arrays)
  affine_const  — conv * s + b (trace-time numpy constants)
  scale_fold    — s folded into weights, + b after (conv3d_kdfold_fused form)

Usage: python tools/profile_affine_micro.py
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

from dcanet_tpu.kernels.conv3d import conv3d_kdfold


def main():
    from dcanet_tpu.utils.profiling import device_time

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 48, 96, 312, 32), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, 32, 32), jnp.bfloat16) * 0.05
    s = jax.random.normal(jax.random.PRNGKey(1), (32,), jnp.bfloat16) * 0.1 + 1
    b = jax.random.normal(jax.random.PRNGKey(2), (32,), jnp.bfloat16) * 0.1
    s_np = np.asarray(s, np.float32)
    b_np = np.asarray(b, np.float32)

    cases = {
        "none": lambda x, s, b: conv3d_kdfold(x, w),
        "relu": lambda x, s, b: jnp.maximum(conv3d_kdfold(x, w), 0),
        "bias_param": lambda x, s, b: jnp.maximum(conv3d_kdfold(x, w) + b, 0),
        "affine_param": lambda x, s, b: jnp.maximum(conv3d_kdfold(x, w) * s + b, 0),
        "affine_const": lambda x, s, b: jnp.maximum(
            conv3d_kdfold(x, w) * jnp.asarray(s_np, jnp.bfloat16)
            + jnp.asarray(b_np, jnp.bfloat16), 0),
        "scale_fold": lambda x, s, b: jnp.maximum(
            conv3d_kdfold(x, w * s.astype(w.dtype)) + b, 0),
    }
    for name, fn in cases.items():
        t = device_time(fn, x, s, b, iters=10)
        print(f"{name:<14s}{t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()

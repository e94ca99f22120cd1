"""Matmul / conv ceiling probes for the v5e MXU at DCANet-like shapes."""

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

from dcanet_tpu.utils.profiling import device_time


def main():
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    key = jax.random.PRNGKey(0)

    def mm(m, k, n):
        a = jax.random.normal(key, (m, k), dtype)
        b = jax.random.normal(key, (k, n), dtype)
        t = device_time(lambda a, b: a @ b, a, b, iters=20)
        fl = 2 * m * k * n
        print(f"mm {m}x{k}x{n}: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TFLOPS", flush=True)

    def conv(h, w, c, o, kk=3):
        x = jax.random.normal(key, (1, h, w, c), dtype)
        wt = jax.random.normal(key, (kk, kk, c, o), dtype) * 0.1
        f = lambda x, wt: jax.lax.conv_general_dilated(
            x, wt, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        t = device_time(f, x, wt, iters=20)
        fl = 2 * kk * kk * c * o * h * w
        print(f"conv2d {h}x{w} {c}->{o} k{kk}: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TFLOPS", flush=True)

    M = 48 * 96 * 312  # cost-volume voxels
    mm(M, 288, 32)
    mm(M, 864, 32)
    mm(M, 288, 128)
    mm(M, 864, 256)
    mm(8192, 1024, 1024)
    conv(48 * 96, 312, 32, 32)
    conv(48 * 96, 312, 32, 128)
    conv(48 * 96, 312, 128, 128)
    conv(48 * 96, 312, 96, 32)


if __name__ == "__main__":
    main()

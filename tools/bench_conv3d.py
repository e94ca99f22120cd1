"""Microbenchmark: 3x3x3 Conv3D formulations on TPU.

The DCANet hot path is dominated by 3D convs over (B, D=48, H/4, W/4, 32)
volumes. XLA's native Conv3D on TPU may not tile onto the MXU as well as an
equivalent 2D formulation. Candidates (all numerically identical up to
accumulation order):

  a) native: lax.conv_general_dilated NDHWC 3x3x3
  b) dslice: out = sum_kd conv2d(shift_d(x, kd), W[kd])  (3 x 2D convs,
     D folded into batch)
  c) dstack: concat the 3 D-shifted volumes on channels -> one 2D conv with
     3*C input channels (single big MXU contraction)

Usage: python tools/bench_conv3d.py [--bf16]
"""

from __future__ import annotations

import functools
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


def conv3d_native(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv3d_dslice(x, w):
    b, d, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for kd in range(3):
        xs = xp[:, kd : kd + d].reshape(b * d, h, wd, c)
        y = jax.lax.conv_general_dilated(
            xs, w[kd], (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = y if out is None else out + y
    return out.reshape(b, d, h, wd, -1)


def conv3d_dstack(x, w):
    b, d, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    xs = jnp.concatenate([xp[:, kd : kd + d] for kd in range(3)], axis=-1)
    xs = xs.reshape(b * d, h, wd, 3 * c)
    # kernel (3,3,3,C,O) -> (3,3,3C,O): stack kd on the input-channel axis
    w2 = jnp.concatenate([w[kd] for kd in range(3)], axis=2)
    y = jax.lax.conv_general_dilated(
        xs, w2, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(b, d, h, wd, -1)


def conv3d_dfold(x, w):
    """One conv2d with 3*O output channels (kd folded into N for MXU width),
    then shifted adds along D."""
    b, d, h, wd, c = x.shape
    o = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    xs = xp.reshape(b * (d + 2), h, wd, c)
    # w: (3, 3, 3, C, O) -> (3, 3, C, 3*O), kd on the output-channel axis
    w2 = jnp.concatenate([w[kd] for kd in range(3)], axis=-1)
    y = jax.lax.conv_general_dilated(
        xs, w2, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, d + 2, h, wd, 3 * o)
    # out[:, d] = sum_kd y[:, d+kd, kd-th O-slice]
    return (
        y[:, 0:d, :, :, 0 * o : 1 * o]
        + y[:, 1 : d + 1, :, :, 1 * o : 2 * o]
        + y[:, 2 : d + 2, :, :, 2 * o : 3 * o]
    )


def main():
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    B, D, H, W, C, O = 1, 48, 96, 312, 32, 32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D, H, W, C), dtype)
    w = jax.random.normal(key, (3, 3, 3, C, O), dtype) * 0.1

    flops = 2 * 27 * C * O * B * D * H * W
    ref = None
    for name, fn in [
        ("native", conv3d_native),
        ("dslice", conv3d_dslice),
        ("dstack", conv3d_dstack),
        ("dfold", conv3d_dfold),
    ]:
        y = jax.jit(fn)(x, w)
        if ref is None:
            ref = y
        else:
            err = jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32)))
            print(f"  {name} max|diff| vs native: {err:.2e}")
        t = device_time(fn, x, w, iters=20)
        print(f"{name:<8s}{t*1e3:8.2f} ms   {flops/t/1e12:6.1f} TFLOPS", flush=True)


if __name__ == "__main__":
    main()


def run_pallas():
    from dcanet_tpu.kernels.conv3d import conv3d_pallas, conv3d_xla
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    B, D, H, W, C, O = 1, 48, 96, 312, 32, 32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D, H, W, C), dtype)
    w = jax.random.normal(key, (3, 3, 3, C, O), dtype) * 0.1
    sc = jnp.ones((O,), jnp.float32)
    bi = jnp.zeros((O,), jnp.float32)
    flops = 2 * 27 * C * O * B * D * H * W
    y1 = jax.jit(conv3d_xla)(x, w)
    y2 = jax.jit(lambda x, w: conv3d_pallas(x, w))(x, w)
    err = jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32)))
    print(f"pallas max|diff| vs native: {err:.2e}")
    t = device_time(lambda x, w: conv3d_pallas(x, w), x, w, iters=30)
    print(f"pallas  {t*1e3:8.2f} ms   {flops/t/1e12:6.1f} TFLOPS", flush=True)
    t = device_time(
        lambda x, w: conv3d_pallas(x, w, sc, bi, relu=True), x, w, iters=30
    )
    print(f"pallas+affine+relu {t*1e3:8.2f} ms   {flops/t/1e12:6.1f} TFLOPS", flush=True)
    # 64->32 (dres0 first conv shape)
    x64 = jax.random.normal(key, (B, D, H, W, 64), dtype)
    w64 = jax.random.normal(key, (3, 3, 3, 64, O), dtype) * 0.1
    t = device_time(lambda x, w: conv3d_pallas(x, w), x64, w64, iters=20)
    print(f"pallas 64->32 {t*1e3:8.2f} ms   {2*flops/t/1e12:6.1f} TFLOPS", flush=True)

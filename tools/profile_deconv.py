"""A/B the 2x transposed-conv formulations at the CVA shape.

The lhs-dilated form costs ~1.1 ms alone but its residual-add consumer
balloons to +2.5 ms (see profile_agg_bisect.py). Candidates:
  lhsdil   — current TorchConvTranspose (lhs_dilation=2)
  barrier  — same + optimization_barrier before the add (fusion probe)
  parity   — one dense 2x2x2 conv with the 8 output parities folded into
             output channels, then a reshape interleave (no input dilation)

Usage: python tools/profile_deconv.py
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


def parity_kernel(w):
    """(3,3,3,C,Co) torch-geometry deconv kernel -> (2,2,2,C,8Co) parity-folded.

    For stride 2, k=3, pad 1, output_padding 1:
      even output parity per axis: 1 tap, input offset 0, weight index 1
      odd parity: offset 0 -> index 2, offset 1 -> index 0
    """
    c, co = w.shape[3], w.shape[4]
    w = np.asarray(w, np.float32)
    out = np.zeros((2, 2, 2, c, 8, co), np.float32)
    for p in range(8):
        a, b, cc = (p >> 2) & 1, (p >> 1) & 1, p & 1
        for dd in range(2):
            for dh in range(2):
                for dw in range(2):
                    ws = []
                    ok = True
                    for par, off in ((a, dd), (b, dh), (cc, dw)):
                        if par == 0:
                            if off != 0:
                                ok = False
                                break
                            ws.append(1)
                        else:
                            ws.append(2 if off == 0 else 0)
                    if ok:
                        out[dd, dh, dw, :, p, :] = w[ws[0], ws[1], ws[2]]
    return out.reshape(2, 2, 2, c, 8 * co)


def deconv_parity(x, wk):
    """(B,D,H,W,C) x (2,2,2,C,8Co) -> (B,2D,2H,2W,Co)."""
    b, d, h, wd, c = x.shape
    co = wk.shape[-1] // 8
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, wk, (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    y = y.reshape(b, d, h, wd, 2, 2, 2, co)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
    return y.reshape(b, 2 * d, 2 * h, 2 * wd, co)


def main():
    from dcanet_tpu.utils.profiling import device_time

    key = jax.random.PRNGKey(0)
    D, H, W, C, Co = 24, 48, 156, 64, 32
    x = jax.random.normal(key, (1, D, H, W, C), jnp.bfloat16)
    res = jax.random.normal(key, (1, 2 * D, 2 * H, 2 * W, Co), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, C, Co), jnp.float32) * 0.05
    wb = w.astype(jnp.bfloat16)
    wp = jnp.asarray(parity_kernel(np.asarray(w)), jnp.bfloat16)

    def lhsdil(x, res):
        y = jax.lax.conv_general_dilated(
            x, wb, (1, 1, 1), [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.maximum(y + res, 0)

    def barrier(x, res):
        y = jax.lax.conv_general_dilated(
            x, wb, (1, 1, 1), [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        y = jax.lax.optimization_barrier(y)
        return jnp.maximum(y + res, 0)

    def parity(x, res):
        return jnp.maximum(deconv_parity(x, wp) + res, 0)

    # correctness first
    a = jax.jit(lhsdil)(x, res)
    b = jax.jit(parity)(x, res)
    err = jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    print(f"parity max|diff| = {err:.4f}", flush=True)

    for name, fn in [("lhsdil+add", lhsdil), ("barrier+add", barrier),
                     ("parity+add", parity)]:
        t = device_time(fn, x, res, iters=10)
        print(f"{name:<14s}{t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()

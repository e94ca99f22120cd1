"""A/B microbenchmark: D-axis attention einsum formulations on TPU.

The CVA's per-pixel DxD attention is tiny in FLOPs (~0.6 GFLOP at the bench
shape) but measured 1.79 ms — layout-shuffle bound. Candidates:

  a) einsum-bdhw:  the current form (q/k/v kept (B,D,H,W,n,e); XLA inserts
     the transposes it wants)
  b) pretranspose: one explicit transpose per tensor to (B,H,W,n,D,e), then
     batch-dims dot_general, transpose the context back
  c) headslice:    per-head lane slices (no (n,e) reshape), einsum per head

Usage: python tools/profile_attention.py [--bf16]
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

from dcanet_tpu.utils.profiling import device_time


def main():
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    B, D, H, W, C = 1, 24, 48, 156, 32  # 1/8-res CVA shape at 384x1248
    HD = 8
    N = C // HD
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, D, H, W, C), dtype)
    k = jax.random.normal(kk, (B, D, H, W, C), dtype)
    v = jax.random.normal(kv, (B, D, H, W, C), dtype)
    scale = HD ** -0.5

    def einsum_bdhw(q, k, v):
        qs = q.reshape(B, D, H, W, N, HD)
        ks = k.reshape(B, D, H, W, N, HD)
        vs = v.reshape(B, D, H, W, N, HD)
        sim = jnp.einsum("bihwne,bjhwne->bhwnij", qs, ks) * scale
        attn = jax.nn.softmax(sim, axis=-1)
        ctx = jnp.einsum("bhwnij,bjhwne->bihwne", attn, vs)
        return ctx.reshape(B, D, H, W, C)

    def pretranspose(q, k, v):
        def t(x):  # (B,D,H,W,C) -> (B,H,W,N,D,HD)
            return jnp.transpose(x.reshape(B, D, H, W, N, HD), (0, 2, 3, 4, 1, 5))

        qs, ks, vs = t(q), t(k), t(v)
        sim = jnp.einsum("bhwnie,bhwnje->bhwnij", qs, ks) * scale
        attn = jax.nn.softmax(sim, axis=-1)
        ctx = jnp.einsum("bhwnij,bhwnje->bhwnie", attn, vs)
        return jnp.transpose(ctx, (0, 4, 1, 2, 3, 5)).reshape(B, D, H, W, C)

    def headslice(q, k, v):
        outs = []
        for n in range(N):
            sl = slice(n * HD, (n + 1) * HD)
            sim = jnp.einsum("bihwe,bjhwe->bhwij", q[..., sl], k[..., sl]) * scale
            attn = jax.nn.softmax(sim, axis=-1)
            outs.append(jnp.einsum("bhwij,bjhwe->bihwe", attn, v[..., sl]))
        return jnp.concatenate(outs, axis=-1)

    import numpy as np

    ref = None
    for name, fn in (
        ("einsum_bdhw", einsum_bdhw),
        ("pretranspose", pretranspose),
        ("headslice", headslice),
    ):
        jf = jax.jit(fn)
        y = np.asarray(jf(q, k, v), np.float32)
        if ref is None:
            ref = y
        else:
            print(f"  maxdiff vs a): {np.abs(y - ref).max():.2e}")
        t = device_time(jf, q, k, v, iters=10)
        print(f"{name:<14s}{t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()

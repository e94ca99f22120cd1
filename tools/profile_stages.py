"""Per-stage timing of the DCANet forward on the real TPU.

Times each pipeline stage separately (feature extractor, cost volumes,
pre-aggregation 3D convs, CVA block, classifier+regression+upsample) with
tunnel-honest synchronization (chained dispatch + one host fetch).

Usage: python tools/profile_stages.py [H W] [--bf16]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_dcanet")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench(fn, *args, n=5):
    out = fn(*args)
    first = jax.tree.leaves(out)[0]
    _ = float(jnp.asarray(first).ravel()[0])  # sync
    s = jnp.asarray(0.0, first.dtype)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*(jax.tree.map(lambda a: a, args)), salt=s)
        first = jax.tree.leaves(out)[0]
        s = first.ravel()[0] * 1e-12
    _ = float(s)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    H, W = (int(args[0]), int(args[1])) if len(args) >= 2 else (384, 1248)
    bf16 = "--bf16" in sys.argv
    dtype = jnp.bfloat16 if bf16 else None
    print(f"shape {H}x{W} dtype={'bf16' if bf16 else 'f32'}")

    from dcanet_tpu.nn.cva import CVA
    from dcanet_tpu.nn.feature import FeatureExtractor
    from dcanet_tpu.nn.guidance import Guidance
    from dcanet_tpu.nn.layers import ConvBN, ConvBNAct
    from dcanet_tpu.nn.propagation import PropagationNet
    from dcanet_tpu.kernels.gwc import build_gwc_volume_pallas
    from dcanet_tpu.ops.cost_volume import build_concat_volume
    from dcanet_tpu.ops.regression import softargmin_disparity
    from flax import linen as nn

    key = jax.random.PRNGKey(0)
    h4, w4 = H // 4, W // 4
    D4 = 48

    # --- features ---
    fe = FeatureExtractor(dtype=dtype)
    img = jax.random.normal(key, (2, H, W, 3), jnp.float32)
    fe_vars = jax.jit(lambda k, x: fe.init(k, x, train=False))(key, img[:, :64, :256])
    f_fe = jax.jit(lambda x, salt=0.0: fe.apply(fe_vars, x + salt, train=False))
    t = bench(f_fe, img)
    print(f"features (2 imgs):      {t:8.1f} ms")

    feats = f_fe(img)
    gwc_f = feats["gwc_feature"]
    cat_f = feats["concat_feature"]

    # --- volumes ---
    f_gwc = jax.jit(
        lambda a, b, salt=0.0: build_gwc_volume_pallas(a + salt, b, D4, 40)
    )
    t = bench(f_gwc, gwc_f[:1], gwc_f[1:])
    print(f"gwc volume (pallas):    {t:8.1f} ms")
    f_cat = jax.jit(lambda a, b, salt=0.0: build_concat_volume(a + salt, b, D4))
    t = bench(f_cat, cat_f[:1], cat_f[1:])
    print(f"concat volume:          {t:8.1f} ms")

    vol = jnp.concatenate([f_gwc(gwc_f[:1], gwc_f[1:]), f_cat(cat_f[:1], cat_f[1:])], -1)

    # --- dres0/dres1 (4x 3D convs at (D4, H/4, W/4) 64->32->32) ---
    class Dres(nn.Module):
        dtype: object = None

        @nn.compact
        def __call__(self, x, train=False):
            x = ConvBNAct(32, 3, 1, 1, dims=3, dtype=self.dtype)(x, train)
            x = ConvBNAct(32, 3, 1, 1, dims=3, dtype=self.dtype)(x, train)
            y = ConvBNAct(32, 3, 1, 1, dims=3, dtype=self.dtype)(x, train)
            y = ConvBN(32, 3, 1, 1, dims=3, dtype=self.dtype)(y, train)
            return y + x

    dres = Dres(dtype=dtype)
    dres_vars = jax.jit(lambda k, x: dres.init(k, x))(key, vol[:, :8, :8, :16])
    f_dres = jax.jit(lambda x, salt=0.0: dres.apply(dres_vars, x + salt))
    t = bench(f_dres, vol)
    print(f"dres0+dres1 (3D convs): {t:8.1f} ms")

    cost0 = f_dres(vol)

    # --- one CVA block ---
    cva = CVA(32, dtype=dtype)
    cva_vars = jax.jit(lambda k, x: cva.init(k, x, False))(key, cost0[:, :8, :8, :16])
    f_cva = jax.jit(lambda x, salt=0.0: cva.apply(cva_vars, x + salt, False))
    t = bench(f_cva, cost0)
    print(f"one CVA block:          {t:8.1f} ms")

    # --- classif + softargmin + guidance + convex upsample ---
    class Head(nn.Module):
        dtype: object = None

        @nn.compact
        def __call__(self, left, cost, train=False):
            g = Guidance(64, dtype=self.dtype)(left, train)["g"]
            y = ConvBNAct(32, 3, 1, 1, dims=3, dtype=self.dtype)(cost, train)
            y = nn.Conv(1, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False,
                        dtype=self.dtype)(y)[..., 0]
            pred = softargmin_disparity(y.astype(jnp.float32), D4)
            return PropagationNet(64, 4, dtype=self.dtype)(g, pred, train)

    head = Head(dtype=dtype)
    head_vars = jax.jit(lambda k, l, x: head.init(k, l, x))(
        key, img[:1, :64, :256], cost0[:, :, :16, :64]
    )
    f_head = jax.jit(lambda l, x, salt=0.0: head.apply(head_vars, l + salt, x))
    t = bench(f_head, img[:1], cost0)
    print(f"classif+reg+upsample:   {t:8.1f} ms")


if __name__ == "__main__":
    main()

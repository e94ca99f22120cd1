"""Per-stage device timing of the DCANet forward on the real TPU.

Times each pipeline stage with the scan-inside-jit harness
(dcanet_tpu.utils.profiling.device_time), which removes both the tunnel's
fake `block_until_ready` and its per-dispatch overhead.

Usage: python tools/profile_stages.py [H W] [--bf16]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    H, W = (int(args[0]), int(args[1])) if len(args) >= 2 else (384, 1248)
    bf16 = "--bf16" in sys.argv
    dtype = jnp.bfloat16 if bf16 else None
    print(f"shape {H}x{W} dtype={'bf16' if bf16 else 'f32'}", flush=True)

    from flax import linen as nn

    from dcanet_tpu.kernels.gwc import build_gwc_volume_pallas
    from dcanet_tpu.nn.cva import CVA
    from dcanet_tpu.nn.feature import FeatureExtractor
    from dcanet_tpu.nn.guidance import Guidance
    from dcanet_tpu.nn.layers import ConvBN, ConvBNAct
    from dcanet_tpu.nn.propagation import PropagationNet
    from dcanet_tpu.ops.cost_volume import build_concat_volume
    from dcanet_tpu.ops.regression import softargmin_disparity
    from dcanet_tpu.utils.profiling import device_time

    key = jax.random.PRNGKey(0)
    D4 = 48

    def report(name, fn, *a):
        t = device_time(fn, *a, iters=8)
        print(f"{name:<26s}{t*1e3:9.1f} ms", flush=True)

    # --- features ---
    fe = FeatureExtractor(dtype=dtype)
    img = jax.random.normal(key, (2, H, W, 3), jnp.float32)
    fe_vars = jax.jit(lambda k, x: fe.init(k, x, train=False))(key, img[:, :64, :256])
    f_fe = lambda x: fe.apply(fe_vars, x, train=False)
    report("features (2 imgs)", f_fe, img)

    feats = jax.jit(f_fe)(img)
    gwc_f = jax.device_put(feats["gwc_feature"])
    cat_f = jax.device_put(feats["concat_feature"])

    report(
        "gwc volume (pallas)",
        lambda a, b: build_gwc_volume_pallas(a, b, D4, 40),
        gwc_f[:1], gwc_f[1:],
    )
    report(
        "concat volume",
        lambda a, b: build_concat_volume(a, b, D4),
        cat_f[:1], cat_f[1:],
    )

    vol = jax.jit(
        lambda a, b, c, d: jnp.concatenate(
            [build_gwc_volume_pallas(a, b, D4, 40), build_concat_volume(c, d, D4)],
            -1,
        )
    )(gwc_f[:1], gwc_f[1:], cat_f[:1], cat_f[1:])

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
    report("dres0+dres1 (3D convs)", lambda x: dres.apply(dres_vars, x), vol)

    cost0 = jax.jit(lambda x: dres.apply(dres_vars, x))(vol)

    cva = CVA(32, dtype=dtype)
    cva_vars = jax.jit(lambda k, x: cva.init(k, x, False))(key, cost0[:, :8, :8, :16])
    report("one CVA block", lambda x: cva.apply(cva_vars, x, False)[1], cost0)

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
    report("classif+reg+upsample", lambda l, x: head.apply(head_vars, l, x), img[:1], cost0)


if __name__ == "__main__":
    main()

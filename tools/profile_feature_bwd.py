"""Per-stage fwd / fwd+bwd / dgrad-only / wgrad-only split of the feature
extractor at the train shape (VERDICT r4 #1: "profile — not guess — where the
feature extractor's 17 ms of backward goes").

Stages mirror nn/feature.py: stem (3 convs, 1/2 res), layer1 (3x BasicBlock
32 @ 1/2), layer2 (16x BasicBlock 64 @ 1/4, first stride 2), layer3
(3x BasicBlock 128), layer4 (3x BasicBlock 128 dil 2), concat head. For each:
  fwd        — apply only
  fwd+bwd    — grad wrt params AND input (the in-network cost)
  fwd+dgrad  — grad wrt input only (params constant)
  fwd+wgrad  — grad wrt params only (input constant)
plus a BN-free conv-chain twin of the hottest stage to separate the BN
boundary cost from the conv wgrad itself.

Usage: python tools/profile_feature_bwd.py [--f32]
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


def main():
    from flax import linen as nn

    from dcanet_tpu.nn.layers import BasicBlock, ConvBNAct
    from dcanet_tpu.utils.profiling import device_time

    dtype = None if "--f32" in sys.argv else jnp.bfloat16
    key = jax.random.PRNGKey(0)
    B = 4  # stacked left+right at train batch 2

    class Stem(nn.Module):
        dtype: object = None

        @nn.compact
        def __call__(self, x, train=True):
            x = ConvBNAct(32, 3, 2, 1, dims=2, dtype=self.dtype)(x, train)
            x = ConvBNAct(32, 3, 1, 1, dims=2, dtype=self.dtype)(x, train)
            return ConvBNAct(32, 3, 1, 1, dims=2, dtype=self.dtype)(x, train)

    class Blocks(nn.Module):
        spec: tuple  # ((planes, strides, dilation), ...)
        dtype: object = None

        @nn.compact
        def __call__(self, x, train=True):
            for p, s, d in self.spec:
                x = BasicBlock(p, strides=s, dilation=d, dtype=self.dtype)(x, train)
            return x

    class ConvChain(nn.Module):
        """BN-free twin: same conv shapes as a BasicBlock stage."""

        spec: tuple
        dtype: object = None

        @nn.compact
        def __call__(self, x, train=True):
            for p, s, d in self.spec:
                for stride in (s, 1):
                    x = nn.relu(
                        nn.Conv(
                            p, (3, 3), strides=(stride, stride),
                            padding=((d, d), (d, d)), kernel_dilation=(d, d),
                            use_bias=False, dtype=self.dtype,
                        )(x)
                    )
            return x

    def probe(name, module, x):
        v = jax.jit(lambda k, xx: module.init(k, xx, train=True))(key, x[:1])
        params, rest = v["params"], {k: w for k, w in v.items() if k != "params"}

        def apply(p, xx):
            out = module.apply({"params": p, **rest}, xx, train=True,
                               mutable=["batch_stats"])[0]
            return jnp.sum(out.astype(jnp.float32))

        t_f = device_time(lambda xx: apply(params, xx), x, iters=8)
        t_fb = device_time(
            lambda xx: sum(
                jnp.sum(g.astype(jnp.float32) ** 2)
                for g in jax.tree.leaves(jax.grad(apply, argnums=(0, 1))(params, xx))
            ),
            x, iters=8,
        )
        t_dg = device_time(
            lambda xx: jnp.sum(jax.grad(apply, argnums=1)(params, xx) ** 2),
            x, iters=8,
        )
        t_wg = device_time(
            lambda xx: sum(
                jnp.sum(g.astype(jnp.float32) ** 2)
                for g in jax.tree.leaves(jax.grad(apply, argnums=0)(params, xx))
            ),
            x, iters=8,
        )
        print(
            f"{name:<22s} fwd {t_f*1e3:6.2f}  fwd+bwd {t_fb*1e3:6.2f}  "
            f"fwd+dgrad {t_dg*1e3:6.2f}  fwd+wgrad {t_wg*1e3:6.2f} ms",
            flush=True,
        )
        return t_f, t_fb

    x_full = jax.random.normal(key, (B, 256, 512, 3), jnp.float32)
    x_half = jax.random.normal(key, (B, 128, 256, 32), jnp.float32)
    x_q64 = jax.random.normal(key, (B, 64, 128, 64), jnp.float32)
    x_q128 = jax.random.normal(key, (B, 64, 128, 128), jnp.float32)
    if dtype is not None:
        x_half, x_q64, x_q128 = (
            a.astype(jnp.bfloat16) for a in (x_half, x_q64, x_q128)
        )

    probe("stem (1/2 res)", Stem(dtype=dtype), x_full)
    probe("layer1 3xBB32 @1/2", Blocks(((32, 1, 1),) * 3, dtype=dtype), x_half)
    probe(
        "layer2 16xBB64 @1/4",
        Blocks(((64, 2, 1),) + ((64, 1, 1),) * 15, dtype=dtype),
        x_half,
    )
    probe("layer3 3xBB128", Blocks(((128, 1, 1),) * 3, dtype=dtype), x_q64)
    probe("layer4 3xBB128 d2", Blocks(((128, 1, 2),) * 3, dtype=dtype), x_q128)
    probe(
        "layer2 conv-only twin",
        ConvChain(((64, 2, 1),) + ((64, 1, 1),) * 15, dtype=dtype),
        x_half,
    )
    probe(
        "layer1 conv-only twin",
        ConvChain(((32, 1, 1),) * 3, dtype=dtype),
        x_half,
    )


if __name__ == "__main__":
    main()

"""Locate the train-step conv-chain overhead: bare kd-fold chain vs +train-BN
vs +BN+relu, fwd and fwd+bwd, at the b2 256x512 train volume shape; then the
loss-ladder cost (full sceneflow preset vs smooth-L1-only) on the real model.

Usage: python tools/profile_train_bn.py [--chain-only|--loss-only]
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

from dcanet_tpu.utils.profiling import device_time

B, D, H4, W4, C = 2, 48, 64, 128, 32


def chain():
    from flax import linen as nn

    from dcanet_tpu.nn.layers import BatchNorm, Conv, ConvBN, ConvBNAct

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D, H4, W4, 2 * C), jnp.bfloat16)

    class Bare(nn.Module):
        @nn.compact
        def __call__(self, z, train=True):
            z = Conv(C, (3, 3, 3), padding=1, use_bias=False, dtype=jnp.bfloat16)(z)
            for _ in range(3):
                z = Conv(C, (3, 3, 3), padding=1, use_bias=False, dtype=jnp.bfloat16)(z)
            return z

    class WithBN(nn.Module):
        @nn.compact
        def __call__(self, z, train=True):
            for i in range(4):
                z = ConvBN(C if i else C, 3, 1, 1, dims=3, dtype=jnp.bfloat16)(z, train)
            return z

    class WithBNAct(nn.Module):
        @nn.compact
        def __call__(self, z, train=True):
            for i in range(4):
                z = ConvBNAct(C, 3, 1, 1, dims=3, dtype=jnp.bfloat16)(z, train)
            return z

    for label, mod in (("bare conv x4", Bare()), ("conv+trainBN x4", WithBN()),
                       ("conv+BN+relu x4", WithBNAct())):
        v = jax.jit(lambda k, xx: mod.init(k, xx, True))(key, x[:, :8, :8, :16])

        def f(xx):
            out, _ = mod.apply(v, xx, True, mutable=["batch_stats"])
            return 0.5 * jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

        t0 = time.perf_counter()
        tf = device_time(jax.jit(f), x, iters=6)
        tg = device_time(jax.jit(jax.grad(f)), x, iters=6)
        print(f"{label:<18s} fwd {tf*1e3:7.2f} ms   fwd+bwd {tg*1e3:7.2f} ms "
              f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)


def loss_ladder():
    import optax

    from dcanet_tpu.models import DCANet
    from dcanet_tpu.train.loop import LossConfig, train_step
    from dcanet_tpu.train.state import create_train_state

    key = jax.random.PRNGKey(0)
    model = DCANet(maxdisp=192, num_cva=3, dtype=jnp.bfloat16)
    batch = {
        "left": jax.random.normal(key, (B, 256, 512, 3), jnp.float32),
        "right": jax.random.normal(key, (B, 256, 512, 3), jnp.float32),
        "disparity": jax.random.uniform(key, (B, 256, 512), jnp.float32, 1.0, 190.0),
    }
    state = create_train_state(
        model, key, batch["left"][:1], batch["right"][:1], optax.adam(1e-3)
    )
    for preset in ("sceneflow", "smooth_l1"):
        cfg = LossConfig(max_disp=192, preset=preset)

        def f(l):
            _, m = train_step(state, {**batch, "left": l}, cfg)
            return m["total"] + m["grad_norm"]

        t0 = time.perf_counter()
        t = device_time(jax.jit(f), batch["left"], iters=6)
        print(f"train step loss={preset:<10s} {t*1e3:7.2f} ms  "
              f"{B/t:6.2f} pairs/sec (compile {time.perf_counter()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    if "--loss-only" not in sys.argv:
        chain()
    if "--chain-only" not in sys.argv:
        loss_ladder()

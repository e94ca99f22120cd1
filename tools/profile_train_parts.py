"""Device timings of train-step hot parts: gwc custom-vjp backward and the
MultiAggregation block fwd/bwd (the two unmeasured suspects from r1).

Usage: python tools/profile_train_parts.py [--bf16]
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
    bf16 = "--bf16" in sys.argv
    cdtype = jnp.bfloat16 if bf16 else jnp.float32
    print(f"dtype={'bf16' if bf16 else 'f32'}", flush=True)
    key = jax.random.PRNGKey(0)

    # ---- gwc volume fwd/bwd at the train feature shape (b2 256x512 -> 1/4) ----
    from dcanet_tpu.kernels.gwc import build_gwc_volume_pallas
    from dcanet_tpu.ops.cost_volume import build_gwc_volume

    b, h, w, c, d = 2, 64, 128, 320, 48
    kl, kr = jax.random.split(key)
    left = jax.random.normal(kl, (b, h, w, c), cdtype)
    right = jax.random.normal(kr, (b, h, w, c), cdtype)

    # NB: the loss must be NONLINEAR in the volume: with a plain sum, dvol
    # is all-ones and d/dleft depends only on `right` — which device_time's
    # scan does not salt, so XLA hoists the whole backward out of the timing
    # loop ("gwc fwd+bwd: 0.03 ms" — a measured artifact, not speed).
    def loss_pallas(l, r):
        v = build_gwc_volume_pallas(l, r, d, 40).astype(jnp.float32)
        return 0.5 * jnp.sum(v * v)

    def loss_xla(l, r):
        v = build_gwc_volume(l, r, d, 40).astype(jnp.float32)
        return 0.5 * jnp.sum(v * v)

    for name, fn in (("pallas", loss_pallas), ("xla", loss_xla)):
        t = device_time(jax.jit(fn), left, right, iters=10)
        print(f"gwc fwd ({name}):          {t*1e3:8.2f} ms", flush=True)
        grad = jax.grad(fn, argnums=(0, 1))
        g = jax.jit(lambda l, r: sum(grad(l, r)))  # keep BOTH grads live
        t = device_time(g, left, right, iters=10)
        print(f"gwc fwd+bwd ({name}):      {t*1e3:8.2f} ms", flush=True)

    # ---- MultiAggregation fwd and fwd+bwd at the 1/4 eval shape ----
    from dcanet_tpu.nn.aggregation import MultiAggregation

    dt = jnp.bfloat16 if bf16 else None
    x = jax.random.normal(key, (1, 48, 96, 312, 32), cdtype)
    mod = MultiAggregation(32, dtype=dt)
    v = mod.init(key, x[:, :8, :8, :16], True)

    def fwd(x):
        out, _ = mod.apply(v, x, True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    t = device_time(jax.jit(fwd), x, iters=10)
    print(f"MultiAggregation fwd:      {t*1e3:8.2f} ms", flush=True)
    t = device_time(jax.jit(jax.grad(fwd)), x, iters=10)
    print(f"MultiAggregation fwd+bwd:  {t*1e3:8.2f} ms", flush=True)

    # deconv alone (TorchConvTranspose 64->32 2x up)
    from dcanet_tpu.nn.layers import TorchConvTranspose

    xd = jax.random.normal(key, (1, 24, 48, 156, 64), cdtype)
    dec = TorchConvTranspose(32, dims=3, dtype=dt)
    vd = dec.init(key, xd[:, :4, :4, :8])
    t = device_time(jax.jit(lambda x: dec.apply(vd, x)), xd, iters=10)
    print(f"deconv 64->32 2x:          {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""GANetStereo on the TPU: eval-forward timing at the KITTI bench shape +
isolated SGA-aggregate timings (VERDICT r3 next #4 — the lax.scan wavefront
had never been timed on hardware).

Usage: python tools/profile_ganet.py [--model-only|--sga-only]
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


def sga_micro():
    """Isolated sga_aggregate at the 1/4-res eval volume shape:
    (B=1, D=48, H=96, W=312) x C=32 channels (vmap), bf16."""
    from dcanet_tpu.ops.sga import sga_aggregate

    key = jax.random.PRNGKey(0)
    b, d, h, w, c = 1, 48, 96, 312, 32
    cost = jax.random.normal(key, (b, d, h, w, c), jnp.bfloat16)
    weights = jax.nn.softmax(
        jax.random.normal(key, (b, h, w, 4, 5), jnp.float32), axis=-1
    ).astype(jnp.bfloat16)

    def agg(cost, weights):
        return jax.vmap(
            lambda vol: sga_aggregate(vol, weights), in_axes=-1, out_axes=-1
        )(cost)

    t0 = time.perf_counter()
    dt = device_time(jax.jit(agg), cost, weights, iters=4)
    print(
        f"sga_aggregate 48x96x312x32ch: {dt*1e3:8.2f} ms "
        f"(incl compile {time.perf_counter()-t0:.0f}s)",
        flush=True,
    )


def model_eval():
    from dcanet_tpu.models.ganet import GANetStereo

    H, W = 384, 1248
    model = GANetStereo(maxdisp=192, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 64, 256, 3), jnp.float32)
    variables = jax.jit(lambda k, l, r: model.init(k, l, r, train=False))(
        key, small, small
    )
    left = jax.random.normal(key, (1, H, W, 3), jnp.float32)
    right = jax.random.normal(key, (1, H, W, 3), jnp.float32)

    def fwd(l, r):
        return model.apply(variables, l, r, train=False).disparity

    t0 = time.perf_counter()
    dt = device_time(fwd, left, right, iters=4)
    print(
        f"GANetStereo eval fwd {H}x{W}: {dt*1e3:8.2f} ms "
        f"({1.0/dt:.2f} pairs/sec; incl compile {time.perf_counter()-t0:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    if "--model-only" not in sys.argv:
        sga_micro()
    if "--sga-only" not in sys.argv:
        model_eval()

"""Probe the MultiAggregation residual seam: is the +2.5 ms from `x` being
consumed both by the stride-2 kd-fold conv1 (reshaped (B*D,H,W,C)) and by the
final elementwise add?

Variants at (1,48,96,312,32) bf16:
  shared   — real block: relu(y + x), x also feeds conv1
  split    — same compute, but the add uses a second independent input
  prebar   — shared, but conv1 consumes optimization_barrier(x)
  addf32   — shared, add in f32 then cast
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

    from dcanet_tpu.nn.layers import BatchNorm, ConvBNAct, TorchConvTranspose
    from dcanet_tpu.utils.profiling import device_time

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    D, H, W, C = 48, 96, 312, 32
    x = jax.random.normal(key, (1, D, H, W, C), jnp.bfloat16)
    x2 = jax.random.normal(jax.random.PRNGKey(1), (1, D, H, W, C), jnp.bfloat16)

    class Block(nn.Module):
        mode: str

        @nn.compact
        def __call__(self, x, x2, train: bool = False):
            c = C
            xin = x
            if self.mode == "prebar":
                xin = jax.lax.optimization_barrier(x)
            y = ConvBNAct(c * 2, 3, 2, 1, dims=3, dtype=dtype, name="conv1")(xin, train)
            y = ConvBNAct(c * 2, 3, 1, 1, dims=3, dtype=dtype, name="conv2")(y, train)
            y = TorchConvTranspose(c, dims=3, dtype=dtype, name="conv3")(y)
            y = BatchNorm(dtype=dtype, name="conv3_bn")(y, train)
            if self.mode == "split":
                return nn.relu(y + x2)
            if self.mode == "addf32":
                return nn.relu(
                    y.astype(jnp.float32) + x.astype(jnp.float32)
                ).astype(dtype)
            return nn.relu(y + x)

    for mode in ["shared", "split", "prebar", "addf32"]:
        m = Block(mode=mode)
        v = jax.jit(lambda k, a, b: m.init(k, a, b, False))(
            key, x[:, :8, :8, :16], x2[:, :8, :8, :16])
        t = device_time(lambda a, b: m.apply(v, a, b, False), x, x2, iters=10)
        print(f"{mode:<10s}{t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()

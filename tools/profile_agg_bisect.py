"""Bisect the MultiAggregation composite-vs-parts gap (5.99 vs 2.56 ms).

Times progressively longer prefixes of the block at the KITTI eval shape so
the composition overhead (layout copies / fusion regressions between stages)
is attributed to a specific seam.

Usage: python tools/profile_agg_bisect.py
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

    from dcanet_tpu.nn.layers import BatchNorm, ConvBN, ConvBNAct, TorchConvTranspose
    from dcanet_tpu.utils.profiling import device_time

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    D, H, W, C = 48, 96, 312, 32
    x = jax.random.normal(key, (1, D, H, W, C), jnp.bfloat16)

    class Prefix(nn.Module):
        upto: int  # 1..5

        @nn.compact
        def __call__(self, x, train: bool = False):
            c = C
            y = ConvBNAct(c * 2, 3, 2, 1, dims=3, dtype=dtype, name="conv1")(x, train)
            if self.upto >= 2:
                y = ConvBNAct(c * 2, 3, 1, 1, dims=3, dtype=dtype, name="conv2")(y, train)
            if self.upto >= 3:
                y = TorchConvTranspose(c, dims=3, dtype=dtype, name="conv3")(y)
            if self.upto >= 4:
                y = BatchNorm(dtype=dtype, name="conv3_bn")(y, train)
            if self.upto >= 5:
                redir = ConvBN(c, 1, 1, 0, dims=3, dtype=dtype, name="redir")(x, train)
                y = nn.relu(y + redir)
            return y

    names = ["conv1", "+conv2", "+deconv", "+bn", "+redir/relu"]
    for upto in range(1, 6):
        m = Prefix(upto=upto)
        v = jax.jit(lambda k, xx: m.init(k, xx, False))(key, x[:, :8, :8, :16])
        t = device_time(lambda xx: m.apply(v, xx, False), x, iters=10)
        print(f"prefix {names[upto-1]:<14s}{t*1e3:9.2f} ms", flush=True)


def variants():
    """A/B the redir seam: dot_general vs conv1x1 vs plain add."""
    from flax import linen as nn

    from dcanet_tpu.nn.layers import BatchNorm, ConvBN, ConvBNAct, TorchConvTranspose
    from dcanet_tpu.utils.profiling import device_time

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    D, H, W, C = 48, 96, 312, 32
    x = jax.random.normal(key, (1, D, H, W, C), jnp.bfloat16)

    class Block(nn.Module):
        mode: str

        @nn.compact
        def __call__(self, x, train: bool = False):
            c = C
            y = ConvBNAct(c * 2, 3, 2, 1, dims=3, dtype=dtype, name="conv1")(x, train)
            y = ConvBNAct(c * 2, 3, 1, 1, dims=3, dtype=dtype, name="conv2")(y, train)
            y = TorchConvTranspose(c, dims=3, dtype=dtype, name="conv3")(y)
            y = BatchNorm(dtype=dtype, name="conv3_bn")(y, train)
            if self.mode == "noredir":
                return nn.relu(y + x)
            if self.mode == "conv1x1":
                w = self.param("rw", nn.initializers.normal(0.02), (1, 1, 1, c, c))
                r = jax.lax.conv_general_dilated(
                    x, w.astype(dtype), (1, 1, 1), [(0, 0)] * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                r = BatchNorm(dtype=dtype, name="rbn")(r, train)
                return nn.relu(y + r)
            if self.mode == "matmul2d":
                w = self.param("rw", nn.initializers.normal(0.02), (c, c))
                b, d, h, wd, cc = x.shape
                r = (x.reshape(-1, cc) @ w.astype(dtype)).reshape(x.shape)
                r = BatchNorm(dtype=dtype, name="rbn")(r, train)
                return nn.relu(y + r)
            if self.mode == "convbn":
                r = ConvBN(c, 1, 1, 0, dims=3, dtype=dtype, name="redir")(x, train)
                return nn.relu(y + r)
            raise ValueError(self.mode)

    for mode in ["noredir", "conv1x1", "matmul2d", "convbn"]:
        m = Block(mode=mode)
        v = jax.jit(lambda k, xx: m.init(k, xx, False))(key, x[:, :8, :8, :16])
        t = device_time(lambda xx: m.apply(v, xx, False), x, iters=10)
        print(f"variant {mode:<10s}{t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    if "--variants" in sys.argv:
        variants()
    else:
        main()

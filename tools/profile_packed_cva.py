"""Packed-dialect CVA chain vs the current normal-layout CVA (eval, bf16).

The hypothesis (from the r3 HLO analysis in kernels/deconv3d.py): the CVA's
~4 ms of composition seams are relayout copies XLA inserts wherever a conv
output in a 32-lane volume meets an elementwise/pool consumer. Keeping the
1/4-res volume PACKED (B, D/2, H/2, W/2, 8C = 256 lanes) across the CVA
boundary turns every seam op into a dense conv/matmul.

Usage: python tools/profile_packed_cva.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("DCANET_FOLD_EVAL_BN", "1")

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from flax import linen as nn

    from dcanet_tpu.kernels.deconv3d import (
        avgpool2x_from_packed,
        conv3d_s2_from_packed,
        deconv2x_flat,
        pack2x_pointwise,
        packed_pointwise,
    )
    from dcanet_tpu.nn.attention import DisparityAttentionBlock
    from dcanet_tpu.nn.layers import (
        AvgPool3dTorch,
        Conv,
        ConvBN,
        ConvBNAct,
        reference_conv_init,
    )
    from dcanet_tpu.nn.aggregation import MultiAggregation
    from dcanet_tpu.ops.slc import slc_pool
    from dcanet_tpu.ops.upsample import resize_trilinear
    from dcanet_tpu.utils.profiling import device_time

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    B, D, H, W, C = 1, 48, 96, 312, 32
    x = jax.random.normal(key, (B, D, H, W, C), jnp.bfloat16)
    zp = pack2x_pointwise(x)  # packed input

    class NormalCVA(nn.Module):
        @nn.compact
        def __call__(self, cv, train=False):
            cd = AvgPool3dTorch()(cv)
            cd = ConvBNAct(C, 3, 1, 1, dims=3, dtype=dtype, name="down_conv")(cd, train)
            y = ConvBNAct(C, 3, 1, 1, dims=3, dtype=dtype, name="classify0")(cd, train)
            logits = Conv(1, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False,
                          kernel_init=reference_conv_init, dtype=dtype,
                          name="classify1")(y)[..., 0]
            feats = slc_pool(cd, logits)
            aug = DisparityAttentionBlock(
                transform_channels=C, out_channels=C, key_query_num_convs=2,
                value_out_num_convs=1, dtype=dtype, name="attn",
            )(cd, feats + cd, train)
            aug = resize_trilinear(aug, 2)
            fused = ConvBN(C, 1, 1, 0, dims=3, dtype=dtype, name="fuse")(
                (aug, cv), train
            )
            # agg FIRST: device_time keeps the first output leaf alive;
            # logits-first let XLA DCE the whole aggregation tail (measured
            # 1.8 ms for a '10.7 ms' block)
            return MultiAggregation(C, dtype=dtype, name="agg")(fused, train), logits

    class PackedCVA(nn.Module):
        """Same math, packed volume in/out (weights random, not shared with
        NormalCVA — this is a TIMING harness; parity is covered by the unit
        tests of each packed op)."""

        @nn.compact
        def __call__(self, zp, train=False):
            cd = avgpool2x_from_packed(zp)
            cd = ConvBNAct(C, 3, 1, 1, dims=3, dtype=dtype, name="down_conv")(cd, train)
            y = ConvBNAct(C, 3, 1, 1, dims=3, dtype=dtype, name="classify0")(cd, train)
            logits = Conv(1, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False,
                          kernel_init=reference_conv_init, dtype=dtype,
                          name="classify1")(y)[..., 0]
            feats = slc_pool(cd, logits)
            aug = DisparityAttentionBlock(
                transform_channels=C, out_channels=C, key_query_num_convs=2,
                value_out_num_convs=1, dtype=dtype, name="attn",
            )(cd, feats + cd, train)
            aug = resize_trilinear(aug, 2)
            # fuse: pack the aug half with its weight slice; matmul the
            # packed half with its slice
            wf = self.param("wf", nn.initializers.normal(0.02), (2 * C, C))
            fused = pack2x_pointwise(aug, wf[:C].astype(dtype)) + packed_pointwise(
                zp, wf[C:].astype(dtype)
            )
            # MultiAggregation, packed: conv1 s2 from packed -> 1/8
            w1 = self.param("w1", nn.initializers.normal(0.02), (3, 3, 3, C, 2 * C))
            y2 = conv3d_s2_from_packed(fused, w1.astype(dtype), relu=True)
            y2 = ConvBNAct(2 * C, 3, 1, 1, dims=3, dtype=dtype, name="conv2")(y2, train)
            wk = self.param("wk", nn.initializers.normal(0.02), (3, 3, 3, 2 * C, C))
            wr = self.param("wr", nn.initializers.normal(0.02), (C, C))
            xp_redir = packed_pointwise(fused, wr.astype(dtype))
            out = deconv2x_flat(
                y2, wk.astype(dtype), packed_residual=xp_redir, relu=True,
                interleave=False,
            )
            return out, logits

    for name, mod, inp in (
        ("normal CVA", NormalCVA(), x),
        ("packed CVA", PackedCVA(), zp),
    ):
        v = jax.jit(lambda k, xx, m=mod: m.init(k, xx, False))(
            key, inp[:, :8, :8, :16]
        )
        t = device_time(lambda xx, m=mod, v=v: m.apply(v, xx, False), inp, iters=8)
        print(f"{name:<14s}{t*1e3:7.2f} ms", flush=True)

    # entry/exit costs
    from dcanet_tpu.kernels.deconv3d import interleave2x

    t = device_time(lambda a: pack2x_pointwise(a), x, iters=10)
    print(f"entry pack2x  {t*1e3:7.2f} ms", flush=True)
    t = device_time(lambda a: interleave2x(a, C), zp, iters=10)
    print(f"exit interleave {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

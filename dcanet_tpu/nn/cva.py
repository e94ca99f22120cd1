"""The CVA block (the paper's DCA module) and SemanticLevelContext.

Parity:
  - SemanticLevelContext: reference models/augment/semantic_level.py:15-128 —
    dense `slc_pool` (see ops/slc.py) followed by cross-attention with
    query = cost volume, key/value = pooled-context + cost volume.
  - CVA: reference models/augment/cva.py:33-71 — AvgPool3d(3,s2,p1)+convbn+relu
    downsample, 3D-conv `classify` head producing the 1-channel disparity-class
    logits, SLC injection, trilinear 2x upsample, 1x1x1 `fuse` of
    concat(augmented, input), and a shallow `Multi_Aggregation` hourglass.

Cost volumes are (B, D, H, W, C); classification logits (B, D, H, W).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dcanet_tpu.nn.aggregation import MultiAggregation
from dcanet_tpu.nn.attention import DisparityAttentionBlock
from dcanet_tpu.nn.layers import AvgPool3dTorch, Conv, ConvBN, ConvBNAct, reference_conv_init
from dcanet_tpu.ops.slc import slc_pool
from dcanet_tpu.ops.upsample import resize_trilinear

Dtype = Any


class SemanticLevelContext(nn.Module):
    feats_channels: int = 32
    transform_channels: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, logits, train: bool):
        """x: (B, D, H, W, C) cost volume; logits: (B, D, H, W) class logits."""
        feats_sl = slc_pool(x, logits)
        return DisparityAttentionBlock(
            transform_channels=self.transform_channels,
            out_channels=self.feats_channels,
            key_query_num_convs=2,
            value_out_num_convs=1,
            dtype=self.dtype,
            name="cross_attention",
        )(x, feats_sl + x, train)


class CVA(nn.Module):
    channels: int = 32
    downsample: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, cost_volume, train: bool, post_residual=None, packed: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (class_logits, aggregated_cost).

        `post_residual` is added to aggregated_cost (the model-level
        `cost0 + agg` residual), fused into MultiAggregation's packed
        epilogue on the folded-eval path.

        `packed=True` (eval-fold only, requires downsample): cost_volume and
        post_residual are PACKED (B, D/2, H/2, W/2, 8C) space-to-depth
        volumes and the aggregated cost is returned packed — the CVA chain
        then never materializes a 32-lane 1/4-res volume between blocks
        (kernels/deconv3d.py; measured 8.5 vs 10.8 ms per block).

        class_logits: (B, D', H', W') raw disparity-classification logits at
        the (possibly 2x-downsampled) resolution — callers upsample + softmax
        for supervision, matching the reference's `prob_volume` output.
        aggregated_cost: (B, D, H, W, C) at the input resolution.
        """
        c = self.channels
        if packed:
            assert self.downsample
            from dcanet_tpu.kernels.deconv3d import (
                avgpool2x_from_packed,
                pack2x_pointwise,
                packed_pointwise,
            )

            cost_down = avgpool2x_from_packed(cost_volume)
            cost_down = ConvBNAct(c, 3, 1, 1, dims=3, dtype=self.dtype,
                                  name="down_conv")(cost_down, train)
        elif self.downsample:
            cost_down = AvgPool3dTorch()(cost_volume)
            cost_down = ConvBNAct(c, 3, 1, 1, dims=3, dtype=self.dtype,
                                  name="down_conv")(cost_down, train)
        else:
            cost_down = cost_volume

        # classify head: convbn_3d+relu then 3x3x3 conv -> 1 channel
        y = ConvBNAct(c, 3, 1, 1, dims=3, dtype=self.dtype,
                      name="classify0")(cost_down, train)
        logits = Conv(
            1, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False,
            kernel_init=reference_conv_init, dtype=self.dtype, name="classify1",
        )(y)[..., 0]  # (B, D', H', W')

        augmented = SemanticLevelContext(
            feats_channels=c, transform_channels=c, dtype=self.dtype,
            name="slc",
        )(cost_down, logits, train)

        fuse = ConvBN(c, 1, 1, 0, dims=3, dtype=self.dtype, name="fuse")
        agg = MultiAggregation(c, dtype=self.dtype, name="cost_agg")
        if packed:
            from dcanet_tpu.kernels.deconv3d import (
                pack2x_pointwise,
                packed_pointwise,
            )

            augmented = resize_trilinear(augmented, 2)
            # probe with normal-width channel counts (packed cv is 8C wide)
            wf, sf, bf = fuse(
                (augmented, cost_volume[..., :c]), train, fold_params=True
            )
            wf2 = wf.reshape(2 * c, c) * sf.astype(wf.dtype)
            dt = self.dtype or wf.dtype
            # fuse rows [0:c] take the augmented half, [c:2c] the input half
            fused = pack2x_pointwise(
                augmented.astype(dt), wf2[:c].astype(dt), bias=bf
            ) + packed_pointwise(cost_volume, wf2[c:].astype(dt))
            return logits, agg(
                fused, train, post_residual=post_residual, packed=True
            )

        if self.downsample:
            augmented = resize_trilinear(augmented, 2)

        # fuse(concat([a, b])): the pointwise conv distributes over the
        # channel concat (Conv accepts the parts tuple), avoiding a
        # materialized 64-ch volume concat (~3 ms each in bad XLA fusions).
        fused = fuse((augmented, cost_volume), train)
        aggregated = agg(fused, train, post_residual=post_residual)
        return logits, aggregated

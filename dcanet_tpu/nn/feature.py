"""Shared-weight 2D feature extractor.

Parity: reference feature_extraction (models/gwcnet_dca_g.py:13-66) — 3-conv
stride-2 stem, ResNet BasicBlock stages [3, 16, 3, 3] (stage 2 stride 2,
stage 4 dilation 2), gwc feature = concat(l2, l3, l4) = 320ch at 1/4
resolution, optional 12-channel concat feature head.

TPU note: left and right images share weights; callers stack them on the
batch axis and run ONE forward (2x larger matmuls for the MXU) instead of two
passes (the reference calls the module twice, gwcnet_dca_g.py:213-214).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from dcanet_tpu.nn.layers import BasicBlock, ConvBN, ConvBNAct, reference_conv_init

Dtype = Any


class FeatureExtractor(nn.Module):
    concat_feature: bool = True
    concat_feature_channel: int = 12
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        # stem: 1/2 res
        x = ConvBNAct(32, 3, 2, 1, dims=2, dtype=self.dtype)(x, train)
        x = ConvBNAct(32, 3, 1, 1, dims=2, dtype=self.dtype)(x, train)
        x = ConvBNAct(32, 3, 1, 1, dims=2, dtype=self.dtype)(x, train)

        # layer1: 3 x BasicBlock(32)
        for _ in range(3):
            x = BasicBlock(32, dtype=self.dtype)(x, train)
        # layer2: 16 x BasicBlock(64), first stride 2 -> 1/4 res
        l2 = BasicBlock(64, strides=2, dtype=self.dtype)(x, train)
        for _ in range(15):
            l2 = BasicBlock(64, dtype=self.dtype)(l2, train)
        # layer3: 3 x BasicBlock(128)
        l3 = BasicBlock(128, dtype=self.dtype)(l2, train)
        for _ in range(2):
            l3 = BasicBlock(128, dtype=self.dtype)(l3, train)
        # layer4: 3 x BasicBlock(128, dilation 2)
        l4 = BasicBlock(128, dilation=2, dtype=self.dtype)(l3, train)
        for _ in range(2):
            l4 = BasicBlock(128, dilation=2, dtype=self.dtype)(l4, train)

        gwc_feature = jnp.concatenate([l2, l3, l4], axis=-1)  # 320 ch

        out = {"gwc_feature": gwc_feature}
        if self.concat_feature:
            y = ConvBNAct(128, 3, 1, 1, dims=2, dtype=self.dtype)(gwc_feature, train)
            y = nn.Conv(
                self.concat_feature_channel, (1, 1), use_bias=False,
                kernel_init=reference_conv_init, dtype=self.dtype,
            )(y)
            out["concat_feature"] = y
        return out

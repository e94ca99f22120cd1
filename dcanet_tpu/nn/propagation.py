"""Convex-upsampling mask head (PropagationNet).

Parity: reference PropgationNet_4x / PropgationNet_8x
(models/submodule.py:357-392): convbn+relu then a 3x3 conv predicting
9 * scale^2 blend logits, combined with the coarse disparity by
`ops.convex_upsample`.
"""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn

from dcanet_tpu.nn.layers import ConvBNAct, reference_conv_init
from dcanet_tpu.ops.upsample import convex_upsample

Dtype = Any


class PropagationNet(nn.Module):
    base_channels: int = 64
    scale: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, guidance, disp, train: bool):
        """guidance: (B, H, W, base_channels); disp: (B, H, W) coarse.
        Returns (B, H*scale, W*scale)."""
        y = ConvBNAct(
            self.base_channels * 2, 3, 1, 1, dims=2, dtype=self.dtype
        )(guidance, train)
        mask_logits = nn.Conv(
            9 * self.scale * self.scale, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=False, kernel_init=reference_conv_init, dtype=self.dtype,
        )(y)
        return convex_upsample(
            disp.astype(mask_logits.dtype), mask_logits, self.scale
        )

"""Guidance network for convex upsampling.

Parity: reference Guidance (models/submodule.py:395-460) — 7x7/s2 conv stem,
two ResidualBlock stages (32/s1, 64/s2) to 1/4 res, two BasicConv 3x3, final
3x3 conv to `output_dim` channels, kaiming(fan_out) init, batch norm.
A stride-2 stage-1 variant covers Guidance_8x (models/submodule.py:463-530).
"""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn

from dcanet_tpu.nn.layers import BasicConv, BatchNorm, ResidualBlock, reference_conv_init

Dtype = Any


class Guidance(nn.Module):
    output_dim: int = 64
    norm_fn: str = "batch"
    eight_x: bool = False  # Guidance_8x: extra stride-2 in stage 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            32, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=True,
            kernel_init=reference_conv_init, dtype=self.dtype,
        )(x)
        x = BatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        if self.eight_x:
            x = nn.Conv(
                32, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                kernel_init=reference_conv_init, dtype=self.dtype,
            )(x)
            x = BatchNorm(dtype=self.dtype)(x, train)
            x = nn.relu(x)

        stride1 = 2 if self.eight_x else 1
        x = ResidualBlock(32, strides=stride1, norm_fn=self.norm_fn, dtype=self.dtype)(x, train)
        x = ResidualBlock(32, strides=1, norm_fn=self.norm_fn, dtype=self.dtype)(x, train)
        x = ResidualBlock(64, strides=2, norm_fn=self.norm_fn, dtype=self.dtype)(x, train)
        x = ResidualBlock(64, strides=1, norm_fn=self.norm_fn, dtype=self.dtype)(x, train)

        x = BasicConv(64, 3, 1, 1, dims=2, dtype=self.dtype)(x, train)
        x = BasicConv(64, 3, 1, 1, dims=2, dtype=self.dtype)(x, train)
        g = nn.Conv(
            self.output_dim, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            kernel_init=reference_conv_init, dtype=self.dtype,
        )(x)
        return {"g": g}

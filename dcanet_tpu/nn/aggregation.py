"""3D cost-aggregation blocks.

MultiAggregation: the CVA's shallow one-level 3D hourglass (reference
models/augment/cva.py:13-31). Hourglass3D: plain GwcNet's two-level 3D
hourglass (reference models/gwcnet_dca_g.py:69-106 / models/gwcnet.py:67-104).
Cost volumes are (B, D, H, W, C); 3D convs run NDHWC on the MXU.
"""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn

from dcanet_tpu.nn.layers import (
    BatchNorm,
    ConvBN,
    ConvBNAct,
    TorchConvTranspose,
    fold_eval_bn_enabled,
)

Dtype = Any


def _deconv_bn(deconv, bn, x, features, train):
    """deconv + BN, with the eval-mode BN affine folded into the deconv
    (scale into the f32 kernel, bias fused into the single conv's epilogue)."""
    if not train and fold_eval_bn_enabled(deconv.dtype):
        return deconv(x, epilogue=bn(features, train, fold=True))
    return bn(deconv(x), train)


class MultiAggregation(nn.Module):
    """conv(s2) -> conv -> deconv(2x)+BN, residual 1x1x1 redir, relu."""

    channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        c = self.channels
        y = ConvBNAct(c * 2, 3, 2, 1, dims=3, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBNAct(c * 2, 3, 1, 1, dims=3, dtype=self.dtype, name="conv2")(y, train)
        deconv = TorchConvTranspose(c, dims=3, dtype=self.dtype, name="conv3")
        bn = BatchNorm(dtype=self.dtype, name="conv3_bn")
        y = _deconv_bn(deconv, bn, y, c, train)
        redir = ConvBN(c, 1, 1, 0, dims=3, dtype=self.dtype, name="redir")(x, train)
        return nn.relu(y + redir)


class Hourglass3D(nn.Module):
    """Two-level 3D hourglass with redir skips (plain GwcNet aggregator)."""

    channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        c = self.channels
        conv1 = ConvBNAct(c * 2, 3, 2, 1, dims=3, dtype=self.dtype, name="conv1")(x, train)
        conv2 = ConvBNAct(c * 2, 3, 1, 1, dims=3, dtype=self.dtype, name="conv2")(conv1, train)
        conv3 = ConvBNAct(c * 4, 3, 2, 1, dims=3, dtype=self.dtype, name="conv3")(conv2, train)
        conv4 = ConvBNAct(c * 4, 3, 1, 1, dims=3, dtype=self.dtype, name="conv4")(conv3, train)

        up5 = _deconv_bn(
            TorchConvTranspose(c * 2, dims=3, dtype=self.dtype, name="conv5"),
            BatchNorm(dtype=self.dtype, name="conv5_bn"), conv4, c * 2, train,
        )
        redir2 = ConvBN(c * 2, 1, 1, 0, dims=3, dtype=self.dtype, name="redir2")(conv2, train)
        conv5 = nn.relu(up5 + redir2)

        up6 = _deconv_bn(
            TorchConvTranspose(c, dims=3, dtype=self.dtype, name="conv6"),
            BatchNorm(dtype=self.dtype, name="conv6_bn"), conv5, c, train,
        )
        redir1 = ConvBN(c, 1, 1, 0, dims=3, dtype=self.dtype, name="redir1")(x, train)
        return nn.relu(up6 + redir1)

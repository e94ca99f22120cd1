"""Additional L3 blocks from the reference's submodule.py not used by the
flagship net but part of the capability surface: FMish, pyramid pooling
(PSP/ICNet), MobileV2 residual, 2D hourglass, and the alternate UNet+PSP
feature extractor (models/feature_extraction.py:64-100).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dcanet_tpu.nn.layers import BatchNorm, ConvBNAct, reference_conv_init

Dtype = Any


def fmish(x: jnp.ndarray) -> jnp.ndarray:
    """mish(x) = x * tanh(softplus(x)) (models/submodule.py:105-112)."""
    return x * jnp.tanh(jax.nn.softplus(x))


class Conv2DBatchNormRelu(nn.Module):
    """conv + BN + LeakyReLU(0.1) (models/submodule.py:16-38)."""

    features: int
    kernel: int = 3
    strides: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = True
    with_bn: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(
            self.features, (self.kernel,) * 2, strides=(self.strides,) * 2,
            padding=((self.padding,) * 2,) * 2,
            kernel_dilation=(self.dilation,) * 2, use_bias=self.use_bias,
            kernel_init=reference_conv_init, dtype=self.dtype,
        )(x)
        if self.with_bn:
            y = BatchNorm(dtype=self.dtype)(y, train)
        return nn.leaky_relu(y, 0.1)


class PyramidPooling(nn.Module):
    """PSP/ICNet multi-scale average pooling + fuse
    (models/submodule.py:41-102). pool_sizes are kernel/stride sizes in the
    'cat' fusion mode; 'sum' mode adds 0.25-weighted upsampled paths and
    applies FMish(x/2)."""

    pool_sizes: Sequence[int] = (32, 16, 8, 4)
    fusion_mode: str = "cat"
    with_bn: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        b, h, w, c = x.shape
        n = len(self.pool_sizes)
        outs = [x]
        acc = x
        for i, ps in enumerate(self.pool_sizes):
            k = (1, ps, ps, 1)
            pooled = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, k, k, "VALID"
            ) / float(ps * ps)
            feats = c // n if self.fusion_mode == "cat" else c
            y = Conv2DBatchNormRelu(
                feats, 1, 1, 0, use_bias=not self.with_bn,
                with_bn=self.with_bn, dtype=self.dtype,
            )(pooled, train)
            y = jax.image.resize(y, (b, h, w, y.shape[-1]), "bilinear")
            if self.fusion_mode == "cat":
                outs.append(y)
            else:
                acc = acc + 0.25 * y
        if self.fusion_mode == "cat":
            return jnp.concatenate(outs, axis=-1)
        return fmish(acc / 2.0)


class MobileV2Residual(nn.Module):
    """Inverted-residual block (models/submodule.py:170-210)."""

    features: int
    strides: int = 1
    expanse_ratio: int = 2
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        inp = x.shape[-1]
        hidden = inp * self.expanse_ratio
        use_res = self.strides == 1 and inp == self.features
        y = x
        if self.expanse_ratio != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False,
                        kernel_init=reference_conv_init, dtype=self.dtype)(y)
            y = BatchNorm(dtype=self.dtype)(y, train)
            y = nn.relu6(y)
        pad = self.dilation
        y = nn.Conv(
            hidden, (3, 3), strides=(self.strides,) * 2,
            padding=((pad, pad), (pad, pad)), kernel_dilation=(self.dilation,) * 2,
            feature_group_count=hidden, use_bias=False,
            kernel_init=reference_conv_init, dtype=self.dtype,
        )(y)
        y = BatchNorm(dtype=self.dtype)(y, train)
        y = nn.relu6(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=reference_conv_init, dtype=self.dtype)(y)
        y = BatchNorm(dtype=self.dtype)(y, train)
        return x + y if use_res else y


class Hourglass2D(nn.Module):
    """2D hourglass over MobileV2 residuals (models/submodule.py:213-248)."""

    channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        from dcanet_tpu.nn.layers import TorchConvTranspose

        c = self.channels
        conv1 = MobileV2Residual(c * 2, 2, dtype=self.dtype)(x, train)
        conv2 = MobileV2Residual(c * 2, 1, dtype=self.dtype)(conv1, train)
        conv3 = MobileV2Residual(c * 4, 2, dtype=self.dtype)(conv2, train)
        conv4 = MobileV2Residual(c * 4, 1, dtype=self.dtype)(conv3, train)
        up5 = TorchConvTranspose(c * 2, dims=2, dtype=self.dtype)(conv4)
        up5 = BatchNorm(dtype=self.dtype)(up5, train)
        redir2 = MobileV2Residual(c * 2, 1, dtype=self.dtype)(conv2, train)
        conv5 = nn.relu(up5 + redir2)
        up6 = TorchConvTranspose(c, dims=2, dtype=self.dtype)(conv5)
        up6 = BatchNorm(dtype=self.dtype)(up6, train)
        redir1 = MobileV2Residual(c, 1, dtype=self.dtype)(x, train)
        return nn.relu(up6 + redir1)


class UNetFeatureExtractor(nn.Module):
    """Alternate UNet-style extractor with pyramid pooling
    (models/feature_extraction.py): stem to 1/2, stages to 1/16, PSP, two
    decoder stages back to 1/4; returns 160-ch gwc + 12-ch concat features.
    Accepts stacked left+right on the batch axis (the reference passes a
    list; feature_extraction.py:74-76 concatenates)."""

    gwc_channels: int = 160
    concat_channels: int = 12
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        CB = Conv2DBatchNormRelu
        # stem to 1/2
        y = CB(32, 3, 2, 1, dtype=self.dtype)(x, train)
        y = CB(32, 3, 1, 1, dtype=self.dtype)(y, train)
        l1 = CB(32, 3, 1, 1, dtype=self.dtype)(y, train)
        # stages to 1/4, 1/8, 1/16
        l2 = CB(64, 3, 2, 1, dtype=self.dtype)(l1, train)
        l3 = CB(128, 3, 2, 1, dtype=self.dtype)(l2, train)
        l4 = CB(128, 3, 2, 1, dtype=self.dtype)(l3, train)
        l4 = PyramidPooling(pool_sizes=(8, 4, 2, 1), dtype=self.dtype)(l4, train)
        l4 = CB(128, 1, 1, 0, dtype=self.dtype)(l4, train)
        # decode to 1/8 then 1/4 with skip concats
        b, h8, w8, _ = l3.shape
        up8 = jax.image.resize(l4, (b, h8, w8, l4.shape[-1]), "bilinear")
        d8 = CB(128, 3, 1, 1, dtype=self.dtype)(
            jnp.concatenate([up8, l3], axis=-1), train
        )
        b, h4, w4, _ = l2.shape
        up4 = jax.image.resize(d8, (b, h4, w4, d8.shape[-1]), "bilinear")
        d4 = CB(self.gwc_channels, 3, 1, 1, dtype=self.dtype)(
            jnp.concatenate([up4, l2], axis=-1), train
        )
        concat_feature = nn.Conv(
            self.concat_channels, (1, 1), use_bias=False,
            kernel_init=reference_conv_init, dtype=self.dtype,
        )(d4)
        return {"gwc_feature": d4, "concat_feature": concat_feature}

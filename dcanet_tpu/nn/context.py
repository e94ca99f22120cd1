"""Auxiliary context/attention modules from the reference's ablation family.

Not used by the committed flagship net, but part of the capability surface:
  * NonLocalAttention — full global attention over all D*H*W tokens
    (models/augment/NonLocal.py:60-94; memory-heavy, small inputs only).
  * ImageLevelContext — global avg-pool broadcast + cross-attention
    (models/augment/image_level.py:14-48).
  * DisparityLevelContext — 2D global pooling over the (C*D) channel view
    (models/augment/image_level.py:51-92).
  * SemanticLevelContextLocal — the mask-and-aggregate SLC variant with a 3D
    conv between masking steps, plus the squeeze-excite block over D
    (models/augment/semantic_level_local.py:14-117).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dcanet_tpu.nn.attention import DisparityAttentionBlock, Projection
from dcanet_tpu.nn.layers import ConvBNAct, reference_conv_init

Dtype = Any


class NonLocalAttention(nn.Module):
    """Global attention over all D*H*W positions (single head)."""

    transform_channels: int
    out_channels: int
    matmul_norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, query_feats, key_feats, train: bool):
        b, d, h, w, c = query_feats.shape
        n = d * h * w
        q = Projection(self.transform_channels, 2, True, self.dtype,
                       name="query_project")(query_feats, train).reshape(b, n, -1)
        k = Projection(self.transform_channels, 2, True, self.dtype,
                       name="key_project")(key_feats, train).reshape(b, n, -1)
        v = Projection(self.transform_channels, 1, True, self.dtype,
                       name="value_project")(key_feats, train).reshape(b, n, -1)
        sim = jnp.einsum("bqc,bkc->bqk", q, k)
        if self.matmul_norm:
            sim = sim * (self.transform_channels ** -0.5)
        attn = nn.softmax(sim, axis=-1)
        ctx = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, d, h, w, -1)
        return Projection(self.out_channels, 1, True, self.dtype,
                          name="out_project")(ctx, train)


class ImageLevelContext(nn.Module):
    """Global average context broadcast + disparity-axis cross-attention."""

    feats_channels: int
    transform_channels: int
    concat_input: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        b, d, h, w, c = x.shape
        pooled = x.mean(axis=(1, 2, 3), keepdims=True)
        pooled = jnp.broadcast_to(pooled, x.shape)
        ctx = DisparityAttentionBlock(
            transform_channels=self.transform_channels,
            out_channels=self.feats_channels,
            dtype=self.dtype,
            name="cross_attention",
        )(x, jnp.concatenate([x, pooled], axis=-1)[..., : c], train)
        if self.concat_input:
            y = jnp.concatenate([ctx, x], axis=-1)
            ctx = ConvBNAct(
                self.feats_channels, 1, 1, 0, dims=3,
                act=lambda v: nn.leaky_relu(v, 0.1), dtype=self.dtype,
                name="bottleneck",
            )(y, train)
        return ctx


class DisparityLevelContext(nn.Module):
    """Squeeze over (H, W) of the (C*D)-channel 2D view and re-weight."""

    feats_channels: int
    reduction: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        b, d, h, w, c = x.shape
        flat = x.transpose(0, 3, 2, 1, 4).reshape(b, w, h, d * c)
        pooled = flat.mean(axis=(1, 2))  # (B, D*C)
        hidden = nn.Dense(d * c // self.reduction, dtype=self.dtype)(pooled)
        hidden = nn.relu(hidden)
        gate = nn.sigmoid(nn.Dense(d * c, dtype=self.dtype)(hidden))
        gated = flat * gate[:, None, None, :]
        return gated.reshape(b, w, h, d, c).transpose(0, 3, 2, 1, 4)


class SELayerD(nn.Module):
    """Squeeze-excite over the disparity axis
    (semantic_level_local.py:14-38)."""

    disparity_planes: int
    reduction: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        # x: (B, D, H, W, C)
        b, d, h, w, c = x.shape
        squeezed = x.mean(axis=(2, 3, 4))  # (B, D)
        y = nn.Dense(max(d // self.reduction, 1), use_bias=False, dtype=self.dtype)(squeezed)
        y = nn.relu(y)
        y = nn.sigmoid(nn.Dense(d, use_bias=False, dtype=self.dtype)(y))
        return x * y[:, :, None, None, None]


class SemanticLevelContextLocal(nn.Module):
    """Mask-and-aggregate SLC variant: hard one-hot mask x volume -> 3D conv
    -> mask again -> cross-attention (semantic_level_local.py:105-117)."""

    feats_channels: int = 32
    transform_channels: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, logits, train: bool):
        b, d, h, w, c = x.shape
        p = jax.nn.softmax(logits, axis=1)
        onehot = jax.nn.one_hot(jnp.argmax(p, axis=1), d, dtype=x.dtype)
        mask = onehot.transpose(0, 3, 1, 2)[..., None]  # (B, D, H, W, 1)
        masked = x * mask
        agg = ConvBNAct(
            c, 3, 1, 1, dims=3, dtype=self.dtype, name="agg"
        )(masked, train)
        agg = agg * mask
        return DisparityAttentionBlock(
            transform_channels=self.transform_channels,
            out_channels=self.feats_channels,
            dtype=self.dtype,
            name="cross_attention",
        )(x, agg + x, train)

"""Disparity-axis multi-head cross-attention.

Capability parity with the reference's SelfAttentionBlock
(models/augment/SelfAttention_bn.py:62-98): per-pixel attention over the D
axis with head_dim=8 heads carved from contiguous channel blocks, 1x1x1
conv+BN+LeakyReLU(0.1) projections, and scaled dot-product with softmax over
the key-disparity axis. The per-pixel D x D attention is tiny (D<=48), so it
lowers to batched MXU matmuls via einsum.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from dcanet_tpu.nn.layers import (
    BatchNorm,
    Conv,
    fold_eval_bn_enabled,
    reference_conv_init,
)

Dtype = Any


class Projection(nn.Module):
    """`buildproject` equivalent (SelfAttention_bn.py:136-160): num_convs of
    [1x1x1 conv (no bias) -> BN -> LeakyReLU(0.1)] when use_norm, else bare
    1x1x1 convs."""

    features: int
    num_convs: int = 1
    use_norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(self.num_convs):
            conv = Conv(
                self.features, (1, 1, 1), use_bias=False,
                kernel_init=reference_conv_init, dtype=self.dtype,
            )
            if self.use_norm:
                bn = BatchNorm(dtype=self.dtype)
                if not train and fold_eval_bn_enabled(self.dtype):
                    x = conv(x, epilogue=bn(self.features, train, fold=True))
                else:
                    x = bn(conv(x), train)
                x = nn.leaky_relu(x, negative_slope=0.1)
            else:
                x = conv(x)
        return x


class DisparityAttentionBlock(nn.Module):
    """Cross-attention along the disparity axis, per pixel.

    query_feats, key_feats: (B, D, H, W, C). Returns (B, D, H, W, out_channels).
    """

    transform_channels: int
    out_channels: int
    key_query_num_convs: int = 2
    value_out_num_convs: int = 1
    key_query_norm: bool = True
    value_out_norm: bool = True
    matmul_norm: bool = True
    with_out_project: bool = True
    head_dim: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, query_feats, key_feats, train: bool):
        b, d, h, w, c = query_feats.shape
        hd = self.head_dim
        tc = self.transform_channels
        assert tc % hd == 0
        heads = tc // hd

        query = Projection(
            tc, self.key_query_num_convs, self.key_query_norm, self.dtype,
            name="query_project",
        )(query_feats, train)
        key = Projection(
            tc, self.key_query_num_convs, self.key_query_norm, self.dtype,
            name="key_project",
        )(key_feats, train)
        value = Projection(
            tc if self.with_out_project else self.out_channels,
            self.value_out_num_convs, self.value_out_norm, self.dtype,
            name="value_project",
        )(key_feats, train)

        # channel c = head * head_dim + sub (contiguous head blocks, matching
        # the reference's reshape(B, C//hd, hd, D, HW)). Heads are carved by
        # STATIC lane slices instead of a (heads, hd) reshape: the reshape
        # splits the lane dimension and costs a relayout per tensor — the
        # sliced form measured 0.81 ms vs 1.51 ms at the 1/8 CVA shape
        # (tools/profile_attention.py).
        # Scale is applied to `query` BEFORE the dot (standard practice in
        # production attention kernels), NOT as softmax(sim * scale): under
        # jit, XLA's simplifier sinks the scalar multiply through softmax's
        # max-subtraction and the fused form produces NaN at the max element
        # once |sim| ≳ 1e20 — which untrained eval-mode activations (init BN
        # stats) actually reach. softmax(dot(q*s, k)) is NaN-free at any
        # finite magnitude; agreement with the post-scale form is ~1e-7 at
        # sane magnitudes (tests/test_torch_parity.py covers the reference
        # semantics, SelfAttention_bn.py:88-90).
        scale = hd ** -0.5 if self.matmul_norm else 1.0
        query = query * jnp.asarray(scale, query.dtype)
        outs = []
        for n in range(heads):
            sl = slice(n * hd, (n + 1) * hd)
            sim = jnp.einsum("bihwe,bjhwe->bhwij", query[..., sl], key[..., sl])
            attn = nn.softmax(sim, axis=-1)  # over key-disparity j
            outs.append(jnp.einsum("bhwij,bjhwe->bihwe", attn, value[..., sl]))
        ctx = jnp.concatenate(outs, axis=-1)

        if self.with_out_project:
            ctx = Projection(
                self.out_channels, self.value_out_num_convs,
                self.value_out_norm, self.dtype, name="out_project",
            )(ctx, train)
        return ctx

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
    """conv(s2) -> conv -> deconv(2x)+BN, residual 1x1x1 redir, relu.

    `post_residual` is an output-shaped volume added AFTER the relu — the
    model-level `cost0 + agg` residual (gwcnet_dca_g.py:228) threaded in so
    the folded-eval path can do the add in the deconv's packed domain
    (kernels/deconv3d.py: post-interleave adds cost ~2.3 ms of relayout
    copies; the packed add + one pack2x costs ~0.5 ms)."""

    channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool, post_residual=None, packed: bool = False):
        c = self.channels
        if packed:
            # x and post_residual are PACKED (B, D8, H8, W8, 8c); returns the
            # packed aggregate. Eval-fold only (kernels/deconv3d.py).
            from dcanet_tpu.kernels.deconv3d import (
                conv3d_s2_from_packed,
                deconv2x_flat,
                packed_pointwise,
            )

            if x.shape[-1] != 8 * c:
                raise ValueError(
                    f"packed=True expects a (B, D/2, H/2, W/2, {8*c}) "
                    f"space-to-depth volume, got channels={x.shape[-1]}"
                )
            probe = x[..., :c]  # fold_params only reads the channel count
            w1, s1, b1 = ConvBNAct(
                c * 2, 3, 2, 1, dims=3, dtype=self.dtype, name="conv1"
            )(probe, train, fold_params=True)
            y = conv3d_s2_from_packed(
                x, (w1 * s1).astype(self.dtype or w1.dtype), bias=b1, relu=True
            )
            y = ConvBNAct(c * 2, 3, 1, 1, dims=3, dtype=self.dtype, name="conv2")(y, train)
            wk = TorchConvTranspose(c, dims=3, dtype=self.dtype, name="conv3")(
                y, kernel_only=True
            )
            s3, b3 = BatchNorm(dtype=self.dtype, name="conv3_bn")(c, train, fold=True)
            wr, s2, b2 = ConvBN(c, 1, 1, 0, dims=3, dtype=self.dtype, name="redir")(
                probe, train, fold_params=True
            )
            wr2 = wr.reshape(wr.shape[-2], wr.shape[-1]) * s2.astype(wr.dtype)
            xp = packed_pointwise(x, wr2.astype(y.dtype), bias=b2)
            return deconv2x_flat(
                y, wk, scale=s3, bias=b3, packed_residual=xp,
                post_packed_add=post_residual, relu=True, interleave=False,
            )

        y = ConvBNAct(c * 2, 3, 2, 1, dims=3, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBNAct(c * 2, 3, 1, 1, dims=3, dtype=self.dtype, name="conv2")(y, train)
        deconv = TorchConvTranspose(c, dims=3, dtype=self.dtype, name="conv3")
        bn = BatchNorm(dtype=self.dtype, name="conv3_bn")
        redir = ConvBN(c, 1, 1, 0, dims=3, dtype=self.dtype, name="redir")

        import jax
        import os

        # DCANET_DECONV_SUBPIXEL=1 enables the packed subpixel tail. In
        # ISOLATION it wins (4.40 vs 5.45 ms at the bench shape) but at the
        # MODEL level it loses 4 ms (70.8 vs 66.6 ms eval): the interleaved
        # output hands its consumers (next CVA's avgpool/fuse, classif
        # heads) a conv-hostile layout and XLA re-inserts the relayout
        # copies downstream. Default OFF until consumers can eat the packed
        # layout directly; the plain path still gets the residual fusions.
        knob = os.environ.get("DCANET_DECONV_SUBPIXEL", "0")
        fused = (
            not train
            and fold_eval_bn_enabled(self.dtype)
            and knob == "1"
            and all(s % 2 == 0 for s in x.shape[1:4])
        )
        if fused:
            from dcanet_tpu.kernels.deconv3d import (
                deconv2x_flat,
                pack2x_pointwise,
            )

            wk = deconv(y, kernel_only=True)
            s1, b1 = bn(c, train, fold=True)
            wr, s2, b2 = redir(x, train, fold_params=True)
            # redir is 1x1x1: kernel (1,1,1,C,C) -> (C,C), BN scale folded in
            wr2 = wr.reshape(wr.shape[-2], wr.shape[-1]) * s2.astype(wr.dtype)
            xp = pack2x_pointwise(x, wr2.astype(x.dtype), bias=b2)
            post = (
                pack2x_pointwise(post_residual)
                if post_residual is not None
                else None
            )
            return deconv2x_flat(
                y, wk, scale=s1, bias=b1, packed_residual=xp,
                post_packed_add=post, relu=True,
            )

        from dcanet_tpu.nn.layers import packed_train_bn_enabled

        packed_train = (
            train
            and packed_train_bn_enabled(self.dtype)
            and all(s % 2 == 0 for s in x.shape[1:4])
        )
        if packed_train:
            # TRAIN-mode packed tail: BN statistics, redir add, relu and the
            # model-level residual all happen in the subpixel deconv's PACKED
            # (B, D/2, H/2, W/2, 8c) domain; ONE interleave is the final
            # write. Interleaving first and handing flax BN the result makes
            # XLA materialize a 4x-padded f32 relayout at the BN reduce
            # (1.5 GB for a 384 MB tensor at b8 256x512 — the r4 OOM).
            from dcanet_tpu.kernels.deconv3d import deconv2x_flat, interleave2x

            dt = self.dtype
            wk = deconv(y, kernel_only=True)
            yv = y if dt is None else y.astype(dt)
            z = deconv2x_flat(yv, wk.astype(yv.dtype), interleave=False)
            zb = bn(z, train, parity_packed=True)
            zr = redir(x, train, packed_out=True)
            out = interleave2x(nn.relu(zb + zr.astype(zb.dtype)), c)
            # the model-level residual adds AFTER the interleave: packing it
            # (identity pack2x) costs a stored full-volume activation in the
            # backward — measured as the b8 OOM regression of the first
            # packed-train attempt
            return out if post_residual is None else out + post_residual

        y = _deconv_bn(deconv, bn, y, c, train)
        out = nn.relu(y + redir(x, train))
        return out if post_residual is None else out + post_residual


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

"""DCANet — GwcNet-style stereo matching with Disparity Context Aggregation.

One parameterized module (`num_cva` in 0..4) replaces the reference's five
copy-pasted variant files (models/gwcnet_dca{0,1,2,4}_g.py, gwcnet_dca_g.py)
and fixes their output-signature drift with a clean, typed contract:

  train -> DCANetTrainOutput(prob_volumes, disparities, class_logits)
  eval  -> DCANetEvalOutput(disparity, class_logits)

Pipeline parity (reference models/gwcnet_dca_g.py:209-282):
  shared-weight 2D features (1/4 res) -> 40-group gwc volume + 24-ch concat
  volume -> dres0/dres1 pre-aggregation (64->32ch 3D convs) -> chain of CVA
  blocks (residual add after the first) -> classif head -> softmax over D ->
  soft-argmin -> RAFT-style convex 4x upsample guided by the left image.

Supervision contract, generalized from the reference family:
  * prob_volumes (stereo-focal ladder, all softmaxed, at 1/4 res):
      [softmax(classif0(cost0))]
      + [softmax(up2(cva_i logits)) for i in 1..num_cva-1]
      + [softmax(classif_i(out_i)) for i in 1..num_cva-1]
    -> exactly [pred0, pred_dca1, pred_dca2, pred1, pred2] for num_cva=3
       (gwcnet_dca_g.py:277-278) and [pred0] for num_cva=1
       (gwcnet_dca1_g.py:210). The reference's dca2 train return is broken
       (undefined names, gwcnet_dca2_g.py:232); num_cva=2 here follows the
       same generalized pattern.
  * disparities (smooth-L1 ladder, full res):
      [soft-argmin of up8(last cva logits), convex-upsampled final]
    -> [pred_dca3, pred4] for num_cva=3.
  * full_res_supervision=True reproduces the dca4 flavor
    (gwcnet_dca4_g.py:214-303): every classif head and every CVA logits
    volume is trilinearly upsampled to full resolution and soft-argmin'd,
    giving 2*num_cva+1 disparity outputs and no focal ladder.

TPU-first deviations (documented, intentional):
  * channel-last layouts; left/right run the shared feature extractor as one
    stacked batch (one big MXU pass; the reference runs two).
  * variants all softmax their focal-ladder volumes (the reference's dca0
    returns raw logits where the main model returns softmaxed ones).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dcanet_tpu.nn.cva import CVA
from dcanet_tpu.nn.feature import FeatureExtractor
from dcanet_tpu.nn.guidance import Guidance
from dcanet_tpu.nn.layers import Conv, ConvBN, ConvBNAct, reference_conv_init
from dcanet_tpu.nn.propagation import PropagationNet
from dcanet_tpu.ops.cost_volume import build_concat_volume, build_gwc_volume
from dcanet_tpu.ops.regression import disparity_regression
from dcanet_tpu.ops.upsample import resize_trilinear

Dtype = Any


def _gwc_volume(left, right, maxdisp, num_groups, use_pallas):
    """Dispatch to the Pallas kernel on TPU (one fused kernel instead of a
    D-stage slice/pad/stack graph); XLA formulation elsewhere/CPU."""
    import jax

    from dcanet_tpu.kernels.gwc import build_gwc_volume_pallas, supports_pallas

    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas and supports_pallas(maxdisp):
        return build_gwc_volume_pallas(left, right, maxdisp, num_groups)
    return build_gwc_volume(left, right, maxdisp, num_groups)


class DCANetTrainOutput(NamedTuple):
    prob_volumes: Tuple[jnp.ndarray, ...]  # (B, D/4, H/4, W/4) softmax probs
    disparities: Tuple[jnp.ndarray, ...]  # (B, H, W) full-res estimates
    class_logits: Tuple[jnp.ndarray, ...]  # raw CVA logits (B, D/8, H/8, W/8)


class DCANetEvalOutput(NamedTuple):
    disparity: jnp.ndarray  # (B, H, W)
    class_logits: Tuple[jnp.ndarray, ...]  # raw CVA logits at native res


class _Classifier(nn.Module):
    """convbn_3d+relu then 3x3x3 conv -> 1 channel of cost logits."""

    channels: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        y = ConvBNAct(self.channels, 3, 1, 1, dims=3, dtype=self.dtype)(x, train)
        return Conv(
            1, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False,
            kernel_init=reference_conv_init, dtype=self.dtype,
        )(y)[..., 0]  # (B, D, H, W)


class DCANet(nn.Module):
    maxdisp: int = 192
    num_cva: int = 3
    use_concat_volume: bool = True
    num_groups: int = 40
    concat_channels: int = 12
    base_channels: int = 32
    full_res_supervision: bool = False
    dtype: Optional[Dtype] = None
    # Optional sharding hook: called on every (B, D, H, W, C) volume so the
    # disparity axis can be pinned to the mesh's `disp` axis
    # (parallel/sharding.py: make_disp_constraint).
    constrain_volume: Optional[Callable] = None
    # None = auto (Pallas gwc kernel on TPU, XLA op on CPU)
    use_pallas: Optional[bool] = None
    # True (default, TPU fast path): run left+right through the shared
    # feature extractor as ONE stacked batch — in train mode, BN batch stats
    # are computed jointly over the pair. False matches the reference's two
    # separate calls (gwcnet_dca_g.py:213-214) whose train-mode BN stats are
    # per-image; needed for bit-parity with torch in train mode (eval mode is
    # identical either way since BN uses running stats).
    stacked_features: bool = True
    # Rematerialize each CVA block in the backward pass (jax.checkpoint via
    # nn.remat): trades recompute FLOPs for HBM. b8 256x512 train OOMs by
    # 20 MB without it (the deep-supervision ladder holds three 1/4-res
    # volumes per CVA); with remat the activations inside each CVA are
    # recomputed instead of stored. CLI: --remat.
    remat: bool = False

    def _constrain(self, x):
        return self.constrain_volume(x) if self.constrain_volume is not None else x

    @nn.compact
    def __call__(self, left, right, train: bool = False):
        b = left.shape[0]
        d4 = self.maxdisp // 4
        c = self.base_channels

        extractor = FeatureExtractor(
            concat_feature=self.use_concat_volume,
            concat_feature_channel=self.concat_channels,
            dtype=self.dtype,
            name="feature_extraction",
        )
        if self.stacked_features:
            feats = extractor(jnp.concatenate([left, right], axis=0), train)
            feats_l = {k: v[:b] for k, v in feats.items()}
            feats_r = {k: v[b:] for k, v in feats.items()}
        else:
            feats_l = extractor(left, train)
            feats_r = extractor(right, train)
        guidance = Guidance(64, dtype=self.dtype, name="guidance")(left, train)["g"]

        gwc_l, gwc_r = feats_l["gwc_feature"], feats_r["gwc_feature"]
        volume = self._constrain(
            _gwc_volume(gwc_l, gwc_r, d4, self.num_groups, self.use_pallas)
        )
        if self.use_concat_volume:
            cat_l, cat_r = feats_l["concat_feature"], feats_r["concat_feature"]
            # kept as a parts tuple: dres0's first conv distributes over the
            # channel concat (Conv tuple input), skipping a materialized
            # 64-ch volume concat (~1.6 ms in bad XLA fusions).
            volume = (volume, self._constrain(build_concat_volume(cat_l, cat_r, d4)))

        # pre-aggregation: dres0 (2x convbn3d+relu), dres1 (convbn3d+relu,
        # convbn3d) + residual (gwcnet_dca_g.py:141-148, 224-225)
        cost0 = ConvBNAct(c, 3, 1, 1, dims=3, dtype=self.dtype)(volume, train)
        cost0 = ConvBNAct(c, 3, 1, 1, dims=3, dtype=self.dtype)(cost0, train)
        y = ConvBNAct(c, 3, 1, 1, dims=3, dtype=self.dtype)(cost0, train)
        # residual threaded into the conv epilogue (kd-fold center-block
        # injection on the folded-eval path; plain add otherwise)
        y = ConvBN(c, 3, 1, 1, dims=3, dtype=self.dtype)(y, train, residual=cost0)
        cost0 = self._constrain(y)

        # CVA chain; residual add only after the first block
        # (gwcnet_dca_g.py:228-232), fused into the CVA's packed epilogue
        outs = [cost0]
        cva_logits = []
        out = cost0
        from dcanet_tpu.nn.layers import packed_eval_enabled

        packed_capable = (
            not train and self.num_cva > 0 and packed_eval_enabled(self.dtype)
        )
        use_packed = (
            packed_capable
            and self.constrain_volume is None
            and all(s % 2 == 0 for s in cost0.shape[1:4])
        )
        if packed_capable and not use_packed:
            # visibility for the north-star case: D-sharded eval (or odd
            # volume extents) silently losing the packed dialect costs
            # ~3 ms/pair at the 384x1248 bench shape.
            import warnings

            reason = (
                "constrain_volume (D-sharding) is set"
                if self.constrain_volume is not None
                else f"volume extents {cost0.shape[1:4]} are not all even"
            )
            warnings.warn(
                f"packed eval dialect disabled: {reason}; eval falls back to "
                "the flat CVA chain (~5% slower at the 384x1248 bench shape)",
                stacklevel=2,
            )
        if use_packed:
            # packed-dialect CVA chain: the 1/4-res volume crosses CVA
            # boundaries as a (B, D/2, H/2, W/2, 8C) space-to-depth packing
            # (256 lanes), eliminating the relayout seams XLA inserts around
            # 32-lane conv/elementwise handoffs. ONE pack at entry, ONE
            # interleave before the final classifier. kernels/deconv3d.py.
            from dcanet_tpu.kernels.deconv3d import (
                interleave2x,
                pack2x_pointwise,
            )

            # NOTE: this branch never appends to `outs` and skips
            # `self._constrain` — safe because it is gated on eval
            # (`not train`, so `outs` is unused: the eval return reads only
            # `cva_logits`/`out`) and on `constrain_volume is None`. If the
            # eval path ever grows per-stage diagnostics that read `outs`,
            # append interleave2x(outp, c) per CVA here.
            cost0p = pack2x_pointwise(cost0)
            outp = cost0p
            for i in range(1, self.num_cva + 1):
                logits, outp = CVA(c, dtype=self.dtype, name=f"cva{i}")(
                    outp, train,
                    post_residual=cost0p if i == 1 else None,
                    packed=True,
                )
                cva_logits.append(logits)
            out = interleave2x(outp, c)
        else:
            # remat only matters in train (eval has no stored activations);
            # static_argnums pins the `train` flag out of the residual pass.
            # static_argnums counts `self` (flax nn.remat convention):
            # index 2 is the `train` flag.
            cva_cls = (
                nn.remat(CVA, static_argnums=(2,)) if (self.remat and train) else CVA
            )
            for i in range(1, self.num_cva + 1):
                logits, agg = cva_cls(c, dtype=self.dtype, name=f"cva{i}")(
                    out, train, post_residual=cost0 if i == 1 else None
                )
                out = self._constrain(agg)
                cva_logits.append(logits)
                outs.append(out)

        final_cost = _Classifier(c, dtype=self.dtype, name=f"classif{self.num_cva}")(
            out, train
        )
        final_prob = nn.softmax(final_cost, axis=1)
        pred_coarse = disparity_regression(final_prob, d4)
        disparity = PropagationNet(64, scale=4, dtype=self.dtype, name="prop")(
            guidance, pred_coarse, train
        )

        if not train:
            return DCANetEvalOutput(
                disparity=disparity, class_logits=tuple(cva_logits)
            )

        if self.full_res_supervision:
            # dca4 flavor: everything to full res + soft-argmin.
            disparities = []
            for logits in cva_logits:
                p = nn.softmax(resize_trilinear(logits, 8), axis=1)
                disparities.append(disparity_regression(p, self.maxdisp))
            for i in range(self.num_cva):
                cost_i = _Classifier(c, dtype=self.dtype, name=f"classif{i}")(
                    outs[i], train
                )
                p = nn.softmax(resize_trilinear(cost_i, 4), axis=1)
                disparities.append(disparity_regression(p, self.maxdisp))
            disparities.append(disparity)
            return DCANetTrainOutput(
                prob_volumes=(),
                disparities=tuple(disparities),
                class_logits=tuple(cva_logits),
            )

        if self.num_cva == 0:
            # classif0 IS the final head (gwcnet_dca0_g.py:172-190).
            return DCANetTrainOutput(
                prob_volumes=(final_prob,),
                disparities=(disparity,),
                class_logits=(),
            )

        prob_volumes = [
            nn.softmax(
                _Classifier(c, dtype=self.dtype, name="classif0")(cost0, train),
                axis=1,
            )
        ]
        for logits in cva_logits[: max(self.num_cva - 1, 0)]:
            prob_volumes.append(nn.softmax(resize_trilinear(logits, 2), axis=1))
        for i in range(1, self.num_cva):
            cost_i = _Classifier(c, dtype=self.dtype, name=f"classif{i}")(
                outs[i], train
            )
            prob_volumes.append(nn.softmax(cost_i, axis=1))

        disparities = []
        if self.num_cva > 0:
            dca_full = nn.softmax(resize_trilinear(cva_logits[-1], 8), axis=1)
            disparities.append(disparity_regression(dca_full, self.maxdisp))
        disparities.append(disparity)

        return DCANetTrainOutput(
            prob_volumes=tuple(prob_volumes),
            disparities=tuple(disparities),
            class_logits=tuple(cva_logits),
        )


class GwcNetBaseline(nn.Module):
    """Plain GwcNet (upstream baseline; reference models/gwcnet.py:107-249):
    3 stacked 3D hourglass aggregators, 4 classif heads, full-res trilinear
    cost upsampling, 4-output deep supervision (all disparities, smooth-L1)."""

    maxdisp: int = 192
    use_concat_volume: bool = True
    num_groups: int = 40
    concat_channels: int = 12
    dtype: Optional[Dtype] = None
    stacked_features: bool = True  # see DCANet.stacked_features

    @nn.compact
    def __call__(self, left, right, train: bool = False):
        from dcanet_tpu.nn.aggregation import Hourglass3D

        b = left.shape[0]
        d4 = self.maxdisp // 4
        c = 32

        extractor = FeatureExtractor(
            concat_feature=self.use_concat_volume,
            concat_feature_channel=self.concat_channels,
            dtype=self.dtype,
            name="feature_extraction",
        )
        if self.stacked_features:
            feats = extractor(jnp.concatenate([left, right], axis=0), train)
            feats_l = {k: v[:b] for k, v in feats.items()}
            feats_r = {k: v[b:] for k, v in feats.items()}
        else:
            feats_l = extractor(left, train)
            feats_r = extractor(right, train)

        volume = build_gwc_volume(
            feats_l["gwc_feature"], feats_r["gwc_feature"], d4, self.num_groups
        )
        if self.use_concat_volume:
            volume = (
                volume,
                build_concat_volume(
                    feats_l["concat_feature"], feats_r["concat_feature"], d4
                ),
            )

        cost0 = ConvBNAct(c, 3, 1, 1, dims=3, dtype=self.dtype)(volume, train)
        cost0 = ConvBNAct(c, 3, 1, 1, dims=3, dtype=self.dtype)(cost0, train)
        y = ConvBNAct(c, 3, 1, 1, dims=3, dtype=self.dtype)(cost0, train)
        y = ConvBN(c, 3, 1, 1, dims=3, dtype=self.dtype)(y, train)
        cost0 = y + cost0

        out1 = Hourglass3D(c, dtype=self.dtype, name="dres2")(cost0, train)
        out2 = Hourglass3D(c, dtype=self.dtype, name="dres3")(out1, train)
        out3 = Hourglass3D(c, dtype=self.dtype, name="dres4")(out2, train)

        def head(name, x):
            cost = _Classifier(c, dtype=self.dtype, name=name)(x, train)
            p = nn.softmax(resize_trilinear(cost, 4), axis=1)
            return disparity_regression(p, self.maxdisp)

        pred3 = head("classif3", out3)
        if not train:
            return DCANetEvalOutput(disparity=pred3, class_logits=())
        pred0 = head("classif0", cost0)
        pred1 = head("classif1", out1)
        pred2 = head("classif2", out2)
        return DCANetTrainOutput(
            prob_volumes=(),
            disparities=(pred0, pred1, pred2, pred3),
            class_logits=(),
        )

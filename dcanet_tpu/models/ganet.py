"""GANet-style stereo network: guided cost aggregation end-to-end.

The reference vendors GANet's CUDA SGA/LGA kernels and nn.Module wrappers
(models/libs/GANet/modules/GANet.py:18-146, src/GANet_kernel.cu) but never
assembles them into a net — they are the lineage's aggregation capability
(SURVEY §2.8). This module completes that capability TPU-natively: a full
stereo network whose cost aggregation is semi-global scan recurrences
(ops/sga.py: lax.scan wavefronts) plus local guided filtering, with the
guidance weights predicted from the left image — the GANet recipe
(Zhang et al., CVPR 2019) re-expressed for XLA.

Pipeline:
  shared-weight 2D features (1/4 res) -> concat volume (GetCostVolume,
  modules/GANet.py; gwc volume optional) -> pre-aggregation 3D convs ->
  [SGABlock x num_sga] with residual adds -> LGABlock local refinement ->
  classif head -> softmax over D -> soft-argmin -> convex 4x upsample.

Train mode deep-supervises one soft-argmin disparity per SGA stage
(full-res trilinear cost upsampling, as GANet's DisparityRegression +
my CUDA-free GwcNetBaseline heads do).

SGA tap normalization: the default softmax-normalizes the 5 scan-tap
weights (positive, sum-1) for scan stability on TPU; `sga_normalize="l1"`
switches to the reference's SIGNED L1 MyNormalize semantics
(modules/GANet.py:18-33, reproduced exactly in nn/ganet.my_normalize,
torch-verified in tests/test_ganet_blocks.py) so GANet-lineage checkpoint
weights keep their meaning.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from dcanet_tpu.models.dcanet import (
    DCANetEvalOutput,
    DCANetTrainOutput,
    _Classifier,
)
from dcanet_tpu.nn.feature import FeatureExtractor
from dcanet_tpu.nn.ganet import LGABlock, SGABlock
from dcanet_tpu.nn.guidance import Guidance
from dcanet_tpu.nn.layers import ConvBN, ConvBNAct
from dcanet_tpu.nn.propagation import PropagationNet
from dcanet_tpu.ops.cost_volume import build_concat_volume, build_gwc_volume
from dcanet_tpu.ops.regression import disparity_regression
from dcanet_tpu.ops.upsample import resize_trilinear

Dtype = Any


class GANetStereo(nn.Module):
    maxdisp: int = 192
    num_sga: int = 2
    use_lga: bool = True
    use_gwc_volume: bool = True
    num_groups: int = 40
    concat_channels: int = 12
    base_channels: int = 32
    sga_normalize: str = "softmax"  # or "l1" (MyNormalize parity)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, left, right, train: bool = False):
        b = left.shape[0]
        d4 = self.maxdisp // 4
        c = self.base_channels

        feats = FeatureExtractor(
            concat_feature=True,
            concat_feature_channel=self.concat_channels,
            dtype=self.dtype,
            name="feature_extraction",
        )(jnp.concatenate([left, right], axis=0), train)
        guidance = Guidance(64, dtype=self.dtype, name="guidance")(left, train)["g"]

        cat_l, cat_r = feats["concat_feature"][:b], feats["concat_feature"][b:]
        volume = build_concat_volume(cat_l, cat_r, d4)
        if self.use_gwc_volume:
            gwc_l, gwc_r = feats["gwc_feature"][:b], feats["gwc_feature"][b:]
            # parts tuple = implicit channel concat (layers.Conv)
            volume = (build_gwc_volume(gwc_l, gwc_r, d4, self.num_groups), volume)

        cost = ConvBNAct(c, 3, 1, 1, dims=3, dtype=self.dtype)(volume, train)
        cost = ConvBNAct(c, 3, 1, 1, dims=3, dtype=self.dtype)(cost, train)
        y = ConvBNAct(c, 3, 1, 1, dims=3, dtype=self.dtype)(cost, train)
        y = ConvBN(c, 3, 1, 1, dims=3, dtype=self.dtype)(y, train)
        cost = y + cost

        aux = []
        for i in range(self.num_sga):
            agg = SGABlock(
                normalize=self.sga_normalize, dtype=self.dtype, name=f"sga{i}"
            )(cost, guidance, train)
            cost = cost + agg
            # aux heads are constructed unconditionally so train/eval inits
            # yield identical param trees (an eval-initialized checkpoint
            # must be trainable); only the compute is gated on `train`.
            aux_head = _Classifier(c, dtype=self.dtype, name=f"classif_sga{i}")
            if train:
                logits = aux_head(cost, train)
                p = nn.softmax(resize_trilinear(logits, 4), axis=1)
                aux.append(disparity_regression(p, self.maxdisp))
            else:
                _ = aux_head(cost[:, :1, :1, :1, :], train)
        if self.use_lga:
            cost = cost + LGABlock(dtype=self.dtype, name="lga")(
                cost, guidance, train
            )

        final_logits = _Classifier(c, dtype=self.dtype, name="classif_final")(
            cost, train
        )
        final_prob = nn.softmax(final_logits, axis=1)
        pred_coarse = disparity_regression(final_prob, d4)
        disparity = PropagationNet(64, scale=4, dtype=self.dtype, name="prop")(
            guidance, pred_coarse, train
        )

        if not train:
            return DCANetEvalOutput(disparity=disparity, class_logits=())
        return DCANetTrainOutput(
            prob_volumes=(),
            disparities=tuple(aux) + (disparity,),
            class_logits=(),
        )

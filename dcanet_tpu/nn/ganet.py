"""GANet-capability module wrappers.

The reference vendors GANet's nn.Module wrappers (models/libs/GANet/modules/
GANet.py:18-146: SGA, LGA*, MyNormalize, GetCostVolume, DisparityRegression)
around its CUDA kernels; none are wired into the committed models but they
define the lineage's aggregation capability. TPU-native equivalents around
ops/sga.py:

  * SGABlock — guidance subnet (2D convs on left-image features) producing
    per-direction 5-weights (softmax-normalized, as MyNormalize/L1 did for
    the CUDA kernel) + the 4-direction scan aggregation, applied per channel
    of a (B, D, H, W, C) cost volume.
  * LGABlock — guidance-predicted (2r+1)^2 x 3 filters + lga3d.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dcanet_tpu.nn.layers import ConvBNAct, reference_conv_init
from dcanet_tpu.ops.sga import lga3d, sga_aggregate


def my_normalize(x, axis: int = -1):
    """Signed L1 normalization, exact MyNormalize semantics (reference
    models/libs/GANet/modules/GANet.py:18-33): divide by sum(|x|) with a
    sign-following 1e-6 guard — the in-place torch edits leave norm>0 at
    norm+1e-6 and norm==0 at -1e-6 (the second masked write reads the
    already-modified tensor, so a zero norm stays negative)."""
    norm = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
    norm = jnp.where(norm > 0, norm + 1e-6, norm - 1e-6)
    return x / norm


class SGABlock(nn.Module):
    """Semi-global aggregation of a cost volume guided by image features.

    cost: (B, D, H, W, C); guidance_feats: (B, H, W, Cg) at the same spatial
    resolution. Returns (B, D, H, W, C).
    """

    hidden: int = 32
    # "softmax": positive sum-1 taps (scan-stable default). "l1": SIGNED L1
    # normalization reproducing the reference's MyNormalize
    # (models/libs/GANet/modules/GANet.py:18-33) exactly — taps may be
    # negative; needed to ingest GANet-lineage checkpoints.
    normalize: str = "softmax"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, cost, guidance_feats, train: bool):
        b, d, h, w, c = cost.shape
        g = ConvBNAct(self.hidden, 3, 1, 1, dims=2, dtype=self.dtype)(
            guidance_feats, train
        )
        logits = nn.Conv(
            4 * 5, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            kernel_init=reference_conv_init, dtype=self.dtype,
        )(g).reshape(b, h, w, 4, 5)
        weights = my_normalize(logits) if self.normalize == "l1" else nn.softmax(
            logits, axis=-1
        )

        agg = jax.vmap(
            lambda vol: sga_aggregate(vol, weights), in_axes=-1, out_axes=-1
        )(cost)
        return agg


class LGABlock(nn.Module):
    """Local guided aggregation with guidance-predicted per-pixel filters."""

    radius: int = 2
    hidden: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, cost, guidance_feats, train: bool):
        b, d, h, w, c = cost.shape
        k2 = (2 * self.radius + 1) ** 2
        g = ConvBNAct(self.hidden, 3, 1, 1, dims=2, dtype=self.dtype)(
            guidance_feats, train
        )
        filt = nn.Conv(
            3 * k2, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            kernel_init=reference_conv_init, dtype=self.dtype,
        )(g).reshape(b, h, w, 3, k2)
        # L1-normalize the filters (MyNormalize, modules/GANet.py)
        filt = filt / jnp.maximum(jnp.sum(jnp.abs(filt), axis=(-2, -1), keepdims=True), 1e-6)
        return jax.vmap(
            lambda vol: lga3d(vol, filt, self.radius), in_axes=-1, out_axes=-1
        )(cost)

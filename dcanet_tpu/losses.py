"""Training losses: multi-scale smooth-L1 + stereo focal loss.

Parity: reference models/loss.py.
  * `model_loss`: weighted smooth-L1 over the disparity ladder, weights
    [1.8, 2.1] for the committed 2-output configuration (loss.py:6-14). The
    reference's masked-mean over boolean-indexed pixels becomes
    sum(loss*mask)/sum(mask) — identical value, static shapes.
  * `stereo_focal_loss`: rescale gt to the volume's scale (avg-pool dense /
    max-pool sparse, loss.py:199-204), mask to (start, maxdisp/scale), build a
    Laplace gt probability volume, then
    -sum_d gtProb * log_softmax(est) * (1-gtProb)^(-alpha), masked, averaged
    over ALL pixels (masked ones contribute zero to the numerator but stay in
    the denominator — loss.py:238 `.mean()`).
  * `focal_loss_ladder`: weights [0.5, 0.7, 1.0, 1.2, 1.5] over the prob
    ladder (loss.py:16-24). NB the reference feeds already-softmaxed volumes
    into log_softmax for the main model; we reproduce that faithfully by
    passing the model's softmaxed `prob_volumes` straight through.

All disparity maps are (B, H, W); probability/cost volumes (B, D, H, W).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from dcanet_tpu.ops.disp2prob import laplace_disp2prob

SMOOTH_L1_WEIGHTS = (1.8, 2.1)
FOCAL_WEIGHTS = (0.5, 0.7, 1.0, 1.2, 1.5)
FULL_LADDER_WEIGHTS = (0.5, 0.7, 1.0, 1.2, 1.5, 1.8, 2.1)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise smooth-L1 (torch F.smooth_l1_loss semantics, beta=1)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def masked_smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean smooth-L1 over masked pixels (== torch's boolean-index mean)."""
    m = mask.astype(pred.dtype)
    num = jnp.sum(smooth_l1(pred, target) * m)
    den = jnp.maximum(jnp.sum(m), 1.0)
    return num / den


def model_loss(
    disp_ests: Sequence[jnp.ndarray],
    disp_gt: jnp.ndarray,
    mask: jnp.ndarray,
    weights: Optional[Sequence[float]] = None,
) -> jnp.ndarray:
    """Weighted multi-scale smooth-L1 (reference models/loss.py:6-14)."""
    if weights is None:
        weights = (
            SMOOTH_L1_WEIGHTS
            if len(disp_ests) == len(SMOOTH_L1_WEIGHTS)
            else FULL_LADDER_WEIGHTS[-len(disp_ests):]
        )
    assert len(weights) == len(disp_ests)
    total = 0.0
    for est, w in zip(disp_ests, weights):
        total = total + w * masked_smooth_l1(est, disp_gt, mask)
    return total


def smoothness_loss(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware first-order disparity smoothness (reference util.py:76-86):
    |dx disp| * exp(-|dx img|) + |dy disp| * exp(-|dy img|), averaged.

    disp: (B, H, W); img: (B, H, W, 3).
    """
    dx_d = jnp.abs(disp[:, :, 1:] - disp[:, :, :-1])
    dy_d = jnp.abs(disp[:, 1:, :] - disp[:, :-1, :])
    dx_i = jnp.mean(jnp.abs(img[:, :, 1:] - img[:, :, :-1]), axis=-1)
    dy_i = jnp.mean(jnp.abs(img[:, 1:, :] - img[:, :-1, :]), axis=-1)
    return (dx_d * jnp.exp(-dx_i)).mean() + (dy_d * jnp.exp(-dy_i)).mean()


def _downsample_gt(gt: jnp.ndarray, scale: int, sparse: bool) -> jnp.ndarray:
    """adaptive_{avg,max}_pool2d for integer scales (loss.py:199-204,215)."""
    b, h, w = gt.shape
    assert h % scale == 0 and w % scale == 0, (gt.shape, scale)
    blocks = gt.reshape(b, h // scale, scale, w // scale, scale)
    if sparse:
        return blocks.max(axis=(2, 4))
    return blocks.mean(axis=(2, 4))


def stereo_focal_loss(
    est_volume: jnp.ndarray,
    disp_gt: jnp.ndarray,
    max_disp: int = 192,
    focal_coefficient: float = 5.0,
    sparse: bool = False,
    variance: float = 1.0,
    start_disp: int = 0,
) -> jnp.ndarray:
    """Single-level stereo focal loss (reference StereoFocalLoss.loss_per_level,
    models/loss.py:206-240).

    est_volume: (B, D, h, w) cost/probability volume at any scale.
    disp_gt:    (B, H, W) full-resolution ground truth.
    """
    b, d, h, w = est_volume.shape
    gt = disp_gt
    scale = disp_gt.shape[-1] // w
    if disp_gt.shape[-2] != h or disp_gt.shape[-1] != w:
        gt = _downsample_gt(disp_gt / float(scale), scale, sparse)
        scale_f = float(scale)
    else:
        scale_f = 1.0

    lower = start_disp
    upper = lower + int(max_disp / scale_f)
    mask = (gt > lower) & (gt < upper)
    maskf = mask.astype(est_volume.dtype)

    gt_prob = laplace_disp2prob(
        gt * maskf, int(max_disp / scale_f), variance=variance, start_disp=start_disp
    )
    # If no pixel is valid, the reference zeroes the target (-> zero loss);
    # here the masked sum is already zero in that case.
    est_logp = jax.nn.log_softmax(est_volume, axis=1)
    weight = jnp.power(1.0 - gt_prob, -focal_coefficient)
    per_pixel = -jnp.sum(gt_prob * est_logp * weight, axis=1) * maskf
    return per_pixel.mean()


def focal_loss_ladder(
    prob_volumes: Sequence[jnp.ndarray],
    disp_gt: jnp.ndarray,
    max_disp: int = 192,
    focal_coefficient: float = 5.0,
    sparse: bool = False,
    weights: Optional[Sequence[float]] = None,
) -> jnp.ndarray:
    """Weighted focal loss over the prob ladder (reference models/loss.py:16-24)."""
    if weights is None:
        weights = FOCAL_WEIGHTS[: len(prob_volumes)]
    assert len(weights) == len(prob_volumes)
    total = 0.0
    for vol, w in zip(prob_volumes, weights):
        total = total + w * stereo_focal_loss(
            vol, disp_gt, max_disp, focal_coefficient, sparse
        )
    return total


# ---------------------------------------------------------------------------
# GANet's custom robust losses (reference models/libs/GANet/functions/
# GANet.py:264-310). Their defining property is a hand-written backward that
# does NOT match the forward's analytic gradient (a graduated gradient-scale
# schedule); reproduced here with jax.custom_vjp, including the reference's
# sequential-masking quirks:
#   * MyLoss2Function.backward first maps |d| > thresh+alpha to 1, and the
#     follow-up [thresh, thresh+alpha] window test is applied to the ALREADY
#     REWRITTEN value (with the default thresh=1 those 1s land inside the
#     window and become 2).
#   * MyLossFunction.backward omits the 1/N of the forward's mean (the grad
#     is N x the analytic scale).
# ---------------------------------------------------------------------------


@jax.custom_vjp
def ganet_loss(pred: jnp.ndarray, target: jnp.ndarray, upper: float = 5.0, lower: float = 1.0):
    """MyLossFunction: forward = mean |pred - target|."""
    return jnp.mean(jnp.abs(pred - target))


def _ganet_loss_fwd(pred, target, upper, lower):
    return ganet_loss(pred, target, upper, lower), (pred - target, upper, lower)


def _ganet_loss_bwd(res, g):
    diff, upper, lower = res
    s = jnp.abs(diff)
    s = jnp.where(s > upper, 1.0, s)
    tag = (s <= upper) & (s >= lower)
    s = jnp.where(tag, 2.0 - jnp.abs(s - (upper + lower) / 2.0) / 2.0, s)
    d = jnp.sign(diff) * s * g
    return d.astype(diff.dtype), (-d).astype(diff.dtype), None, None


ganet_loss.defvjp(_ganet_loss_fwd, _ganet_loss_bwd)


@jax.custom_vjp
def ganet_loss2(pred: jnp.ndarray, target: jnp.ndarray, thresh: float = 1.0, alpha: float = 2.0):
    """MyLoss2Function: piecewise quadratic/linear robust loss. The three
    rewrites are SEQUENTIAL on the mutated buffer (reference semantics): the
    final `+ alpha/2` step also hits mid-branch outputs that exceed
    thresh+alpha."""
    t = jnp.abs(pred - target)
    s = jnp.where(t < thresh, t * t / thresh, t)
    tag = (s <= thresh + alpha) & (s >= thresh)
    s = jnp.where(tag, s * 2.0 - (s - thresh) ** 2 / (2.0 * alpha) - thresh, s)
    s = jnp.where(s > thresh + alpha, s + alpha / 2.0, s)
    return jnp.mean(s)


def _ganet_loss2_fwd(pred, target, thresh, alpha):
    return ganet_loss2(pred, target, thresh, alpha), (pred - target, thresh, alpha)


def _ganet_loss2_bwd(res, g):
    diff, thresh, alpha = res
    s = jnp.abs(diff)
    # sequential rewrites, matching the reference's in-place masking order
    s = jnp.where(s > thresh + alpha, 1.0, s)
    tag = (s <= thresh + alpha) & (s >= thresh)
    s = jnp.where(tag, 2.0 - (s - thresh) / alpha, s)
    tag2 = s < thresh
    s = jnp.where(tag2, 2.0 * s / thresh, s)
    d = jnp.sign(diff) * s * g / diff.size
    return d.astype(diff.dtype), (-d).astype(diff.dtype), None, None


ganet_loss2.defvjp(_ganet_loss2_fwd, _ganet_loss2_bwd)

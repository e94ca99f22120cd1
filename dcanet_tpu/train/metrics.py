"""Stereo evaluation metrics as on-device reductions.

Parity: reference utils/metrics.py (EPE / D1 / Thres), util.py:55-74 (simple
twins), and main_dca.py:66-120 (SegmentationMetric — confusion-matrix
PA/cPA/mPA/mIoU/FWIoU over disparity classes) plus the gt-class construction
at main_dca.py:209-215 (gt/8 avg-pooled to the 1/8 grid, floored).

Two aggregation protocols, matching the reference's two code paths:
  * `eval_metrics` — global masked means over the whole batch (the simple
    util.py:55-74 twins used inside the training loops).
  * `per_image_metrics` — the reference eval protocol
    (utils/metrics.py:22-41 `compute_metric_for_each_image`): metrics are
    computed per image, images whose valid-mask coverage is < 10% of their
    gt>0 coverage are SKIPPED, and the kept images' values are averaged
    (0.0 when every image is skipped). On sparse KITTI gt the two protocols
    genuinely differ; `cmd_eval` uses this one.

All functions are jit-friendly (static shapes, masked means).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def epe_metric(disp_est: jnp.ndarray, disp_gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute disparity error over masked pixels (utils/metrics.py:61-65)."""
    return _masked_mean(jnp.abs(disp_est - disp_gt), mask)


def d1_metric(disp_est: jnp.ndarray, disp_gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """D1: err > 3px AND err > 5% * |gt|, rate over masked pixels
    (utils/metrics.py:43-49)."""
    err = jnp.abs(disp_est - disp_gt)
    bad = (err > 3.0) & (err > 0.05 * jnp.abs(disp_gt))
    return _masked_mean(bad.astype(disp_est.dtype), mask)


def thres_metric(
    disp_est: jnp.ndarray, disp_gt: jnp.ndarray, mask: jnp.ndarray, thres: float
) -> jnp.ndarray:
    """Fraction of masked pixels with error > thres (utils/metrics.py:51-58)."""
    err = jnp.abs(disp_est - disp_gt)
    return _masked_mean((err > thres).astype(disp_est.dtype), mask)


def eval_metrics(
    disp_est: jnp.ndarray, disp_gt: jnp.ndarray, mask: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """The standard eval dict (EPE, D1, >1/2/3px) computed in one pass."""
    return {
        "epe": epe_metric(disp_est, disp_gt, mask),
        "d1": d1_metric(disp_est, disp_gt, mask),
        "thres1": thres_metric(disp_est, disp_gt, mask, 1.0),
        "thres2": thres_metric(disp_est, disp_gt, mask, 2.0),
        "thres3": thres_metric(disp_est, disp_gt, mask, 3.0),
    }


def per_image_metrics(
    disp_est: jnp.ndarray, disp_gt: jnp.ndarray, mask: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Reference eval protocol (utils/metrics.py:22-41): per-image metrics,
    skipping images with mask.mean()/(gt>0).mean() < 0.1, then averaged over
    the kept images (0.0 if none kept).

    Inputs are batched (B, H, W). Returns the same keys as `eval_metrics`
    plus `n_valid_images` (kept-image count, useful for dataset-level
    re-weighting when accumulating across batches).
    """
    axes = tuple(range(1, disp_est.ndim))
    m = mask.astype(jnp.float32)
    msum = jnp.sum(m, axes)

    def pmean(x):  # per-image masked mean -> (B,)
        return jnp.sum(x * m, axes) / jnp.maximum(msum, 1.0)

    err = jnp.abs(disp_est - disp_gt)
    vals = {
        "epe": pmean(err),
        # D1 on masked pixels: E > 3 AND E/|gt| > 0.05 (utils/metrics.py:43-49)
        "d1": pmean(((err > 3.0) & (err > 0.05 * jnp.abs(disp_gt))).astype(jnp.float32)),
        "thres1": pmean((err > 1.0).astype(jnp.float32)),
        "thres2": pmean((err > 2.0).astype(jnp.float32)),
        "thres3": pmean((err > 3.0).astype(jnp.float32)),
    }
    gt_frac = jnp.mean((disp_gt > 0).astype(jnp.float32), axes)
    mask_frac = jnp.mean(m, axes)
    # keep iff mask_frac / gt_frac >= 0.1; multiplied form avoids the 0/0
    # (gt_frac == 0 -> mask_frac == 0 -> skipped, matching the reference's
    # nan-comparison behavior of dropping degenerate images).
    keep = (mask_frac >= 0.1 * gt_frac) & (gt_frac > 0)
    n_keep = jnp.sum(keep.astype(jnp.float32))
    out = {
        k: jnp.sum(jnp.where(keep, v, 0.0)) / jnp.maximum(n_keep, 1.0)
        for k, v in vals.items()
    }
    out["n_valid_images"] = n_keep
    return out


def disparity_class_confusion(
    class_logits: jnp.ndarray,
    disp_gt: jnp.ndarray,
    num_classes: int,
    class_width: float = 8.0,
) -> jnp.ndarray:
    """Confusion matrix of predicted vs gt disparity classes.

    class_logits: (B, D', H', W') CVA logits at 1/8 resolution (D' classes).
    disp_gt: (B, H, W) full res. gt classes = floor(avgpool_{8x}(gt) / 8)
    (main_dca.py:210-215); invalid (class >= num_classes or gt<=0 regions
    pooled to 0 -> class 0 kept, matching the reference) are clipped the same
    way the reference's int conversion behaves only for in-range pixels: we
    mask out-of-range classes.

    Returns (num_classes, num_classes) counts [gt, pred].
    """
    b, dp, hp, wp = class_logits.shape
    assert dp == num_classes, (dp, num_classes)
    scale = disp_gt.shape[-1] // wp
    gt_pooled = disp_gt.reshape(b, hp, scale, wp, scale).mean(axis=(2, 4))
    gt_cls = jnp.floor(gt_pooled / class_width).astype(jnp.int32)
    valid = (gt_cls >= 0) & (gt_cls < num_classes)
    gt_cls = jnp.clip(gt_cls, 0, num_classes - 1)

    pred_cls = jnp.argmax(class_logits, axis=1)  # (B, H', W')

    idx = gt_cls * num_classes + pred_cls
    counts = jnp.bincount(
        idx.reshape(-1),
        weights=valid.reshape(-1).astype(jnp.float32),
        length=num_classes * num_classes,
    )
    return counts.reshape(num_classes, num_classes)


def segmentation_scores(confusion: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """PA / mPA / mIoU / FWIoU from a confusion matrix (main_dca.py:66-120)."""
    total = confusion.sum()
    diag = jnp.diag(confusion)
    gt_per_class = confusion.sum(axis=1)
    pred_per_class = confusion.sum(axis=0)
    pa = diag.sum() / jnp.maximum(total, 1.0)
    cpa = diag / jnp.maximum(gt_per_class, 1e-12)
    present = gt_per_class > 0
    mpa = jnp.sum(jnp.where(present, cpa, 0.0)) / jnp.maximum(present.sum(), 1)
    union = gt_per_class + pred_per_class - diag
    iou = diag / jnp.maximum(union, 1e-12)
    present_u = union > 0
    miou = jnp.sum(jnp.where(present_u, iou, 0.0)) / jnp.maximum(present_u.sum(), 1)
    freq = gt_per_class / jnp.maximum(total, 1.0)
    fwiou = jnp.sum(freq * jnp.where(present_u, iou, 0.0))
    return {"pa": pa, "mpa": mpa, "miou": miou, "fwiou": fwiou}

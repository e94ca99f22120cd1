"""Stereo evaluation metrics as on-device reductions.

Parity: reference utils/metrics.py (EPE / D1 / Thres, batch-safe with the
<10%-valid skip), util.py:55-74 (simple twins), and main_dca.py:66-120
(SegmentationMetric — confusion-matrix PA/cPA/mPA/mIoU/FWIoU over disparity
classes) plus the gt-class construction at main_dca.py:209-215 (gt/8
avg-pooled to the 1/8 grid, floored).

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

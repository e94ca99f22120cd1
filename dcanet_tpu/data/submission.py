"""KITTI benchmark-submission preprocessing (my_img.py parity).

  * per-channel whitening: (x - mean(channel)) / std(channel) computed per
    image (my_img.py:47-69 — NOT the ImageNet stats used in training).
  * fixed-shape transform to (384, 1248): zero-pad anchored bottom-left
    (pad rows on TOP, cols on the RIGHT) when the image is smaller, else
    center-crop vertically / left-crop horizontally (my_img.py:71-87).
  * inverse: strip the top pad / width pad from the predicted disparity
    (my_img.py:105-108).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

SUBMISSION_H, SUBMISSION_W = 384, 1248


def whiten_per_channel(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint-range -> per-channel zero-mean/unit-std float32."""
    img = img.astype(np.float32)
    mean = img.mean(axis=(0, 1), keepdims=True)
    std = img.std(axis=(0, 1), keepdims=True)
    return (img - mean) / np.maximum(std, 1e-6)


def to_submission_shape(
    img: np.ndarray, crop_h: int = SUBMISSION_H, crop_w: int = SUBMISSION_W
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """(H, W, C) -> (crop_h, crop_w, C) + original (h, w) for unpadding."""
    h, w = img.shape[:2]
    if h <= crop_h and w <= crop_w:
        out = np.zeros((crop_h, crop_w) + img.shape[2:], np.float32)
        out[crop_h - h :, :w] = img
    else:
        sy = (h - crop_h) // 2
        out = img[sy : sy + crop_h, :crop_w].astype(np.float32)
    return out, (h, w)


def from_submission_shape(
    disp: np.ndarray, orig_hw: Tuple[int, int],
    crop_h: int = SUBMISSION_H, crop_w: int = SUBMISSION_W,
) -> np.ndarray:
    """Predicted (crop_h, crop_w) -> original (h, w) region."""
    h, w = orig_hw
    if h <= crop_h and w <= crop_w:
        return disp[crop_h - h :, :w]
    return disp

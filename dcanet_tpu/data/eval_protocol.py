"""Dataset-specific test-time transforms (reference eval-protocol parity).

The reference evaluates each benchmark at a protocol-pinned geometry:

  kitti       bottom-right 1232x368 crop of images AND gt
              (dataloader/datasets.py:320-333; 1232/368 are /16 so the
              trainer's pad-to-16 is then a no-op, train_kitti.py:131-144)
  eth3d       normalize, then zero-pad top to 768 / right to 1024 on images
              and gt; metrics on the padded alignment with gt==0 masked
              (dataloader/datasets.py:409-429)
  sceneflow   zero-pad top/right to /16, strip the pad from the prediction
              (main_dca.py:153-174)
  middlebury  replicate-pad to /16 split top/bottom + left/right
              (InputPadder, dataloader/datasets.py:530-540, 691-705)

Each transform returns (left, right, gt, pads) with `pads=(top, right)`
relative to the returned gt: `loader.unpad(pred, pads)` aligns the model
output with the returned gt. For kitti/eth3d the gt itself is at the model's
geometry, so pads=(0, 0).

Shape discipline: kitti/eth3d/sceneflow resolve to ONE static shape per
dataset (368x1232, 768x1024, 544x960), so `jax.jit` compiles once per
dataset. Mixed-size Middlebury rounds up to /64 buckets instead of /16,
collapsing the per-image shapes to a handful of compilations (SURVEY §7.3
item 7).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from dcanet_tpu.data.loader import pad_to_multiple


def eval_transform(
    item: Dict[str, np.ndarray], preset: str
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Tuple[int, int]]:
    left, right, gt = item["left"], item["right"], item["disparity"]
    if preset == "kitti":
        h, w = left.shape[:2]
        ch, cw = min(368, h), min(1232, w)
        left = left[h - ch :, w - cw :]
        right = right[h - ch :, w - cw :]
        gt = gt[h - ch :, w - cw :]
        # the trainer then pads to /16 (train_kitti.py:131-144) — a no-op at
        # the protocol 368x1232, but it keeps non-standard sizes legal
        left, pads = pad_to_multiple(left, 16)
        right, _ = pad_to_multiple(right, 16)
        return left, right, gt, pads
    if preset == "eth3d":
        h, w = left.shape[:2]
        top, rp = max(768 - h, 0), max(1024 - w, 0)
        pads_i = [(top, 0), (0, rp), (0, 0)]
        left = np.pad(left, pads_i)
        right = np.pad(right, pads_i)
        gt = np.pad(gt, [(top, 0), (0, rp)])
        # 768x1024 is /16; the extra pad only triggers for oversized scenes
        left, pads = pad_to_multiple(left, 16)
        right, _ = pad_to_multiple(right, 16)
        return left, right, gt, pads
    if preset == "middlebury":
        # replicate mode splits pads top/bottom + left/right (InputPadder);
        # rather than a 4-offset unpad, the gt is zero-padded to the same
        # geometry — padded pixels carry gt==0 and are masked by every metric.
        left, pads = pad_to_multiple(left, 64, mode="replicate")
        right, _ = pad_to_multiple(right, 64, mode="replicate")
        top, rcols = pads
        gt_p = np.pad(gt, [(top // 2, top - top // 2), (rcols // 2, rcols - rcols // 2)])
        return left, right, gt_p, (0, 0)
    # sceneflow + default: zero-pad top/right to /16 (main_dca protocol)
    left, pads = pad_to_multiple(left, 16)
    right, _ = pad_to_multiple(right, 16)
    return left, right, gt, pads

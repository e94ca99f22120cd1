"""Dataset-specific eval-time geometry vs the reference transforms.

kitti: bottom-right 1232x368 crop (dataloader/datasets.py:320-333)
eth3d: fixed top/right zero-pad to 768x1024 incl. gt (datasets.py:409-429)
middlebury: replicate pad to /64 buckets (InputPadder, datasets.py:691-705)
sceneflow: zero-pad top/right to /16 (main_dca.py:153-166)
"""

import numpy as np

from dcanet_tpu.data.eval_protocol import eval_transform
from dcanet_tpu.data.loader import unpad


def _item(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "left": rng.random((h, w, 3), dtype=np.float32),
        "right": rng.random((h, w, 3), dtype=np.float32),
        "disparity": rng.random((h, w), dtype=np.float32) * 50 + 1,
    }


def test_kitti_bottom_right_crop():
    item = _item(375, 1242)
    left, right, gt, pads = eval_transform(item, "kitti")
    assert left.shape == (368, 1232, 3) and right.shape == (368, 1232, 3)
    assert gt.shape == (368, 1232) and pads == (0, 0)
    # bottom-right alignment: last row/col match the original's
    np.testing.assert_array_equal(left, item["left"][7:, 10:])
    np.testing.assert_array_equal(gt, item["disparity"][7:, 10:])


def test_eth3d_fixed_pad():
    item = _item(491, 939)
    left, right, gt, pads = eval_transform(item, "eth3d")
    assert left.shape == (768, 1024, 3) and gt.shape == (768, 1024)
    assert pads == (0, 0)
    top, rp = 768 - 491, 1024 - 939
    # content sits bottom-left; padding is zero
    np.testing.assert_array_equal(left[top:, :939], item["left"])
    np.testing.assert_array_equal(gt[top:, :939], item["disparity"])
    assert (gt[:top] == 0).all() and (gt[:, 939:] == 0).all()
    assert (left[:top] == 0).all() and (left[:, 939:] == 0).all()


def test_middlebury_bucket_pad():
    # two nearby sizes collapse to the same /64 bucket -> one compile
    s1 = eval_transform(_item(497, 741), "middlebury")
    s2 = eval_transform(_item(481, 709), "middlebury")
    assert s1[0].shape == s2[0].shape == (512, 768, 3)
    # gt zero-padded to the same geometry (masked by gt>0 downstream)
    assert s1[2].shape == (512, 768)


def test_sceneflow_pad16_and_unpad():
    item = _item(540, 960)
    left, right, gt, pads = eval_transform(item, "sceneflow")
    assert left.shape == (544, 960, 3)
    assert pads == (4, 0)
    assert gt.shape == (540, 960)  # gt stays at the original geometry
    # a model-geometry prediction strips back into gt alignment
    pred = np.zeros(left.shape[:2], np.float32)
    assert unpad(pred, pads).shape == gt.shape

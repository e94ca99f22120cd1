"""KITTI submission transform parity (my_img.py:47-108 semantics)."""

import numpy as np

from dcanet_tpu.data.submission import (
    from_submission_shape,
    to_submission_shape,
    whiten_per_channel,
)
from dcanet_tpu.losses import smoothness_loss


def test_whiten(rng):
    img = (rng.random((10, 12, 3)) * 255).astype(np.float32)
    out = whiten_per_channel(img)
    np.testing.assert_allclose(out.mean(axis=(0, 1)), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(axis=(0, 1)), 1.0, atol=1e-4)


def test_pad_small_image(rng):
    img = rng.random((370, 1226, 3)).astype(np.float32)
    out, hw = to_submission_shape(img)
    assert out.shape == (384, 1248, 3)
    # bottom-left anchored: top 14 rows and right 22 cols are zero
    assert np.all(out[:14] == 0) and np.all(out[:, 1226:] == 0)
    np.testing.assert_array_equal(out[14:, :1226], img)
    # inverse recovers the original region from a disparity map
    disp = rng.random((384, 1248)).astype(np.float32)
    rec = from_submission_shape(disp, hw)
    assert rec.shape == (370, 1226)
    np.testing.assert_array_equal(rec, disp[14:, :1226])


def test_crop_large_image(rng):
    img = rng.random((400, 1300, 3)).astype(np.float32)
    out, hw = to_submission_shape(img)
    assert out.shape == (384, 1248, 3)
    np.testing.assert_array_equal(out, img[8:392, :1248])


def test_smoothness_loss(rng):
    import jax.numpy as jnp

    disp = jnp.asarray(rng.random((1, 8, 8), dtype=np.float32))
    img = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
    v = float(smoothness_loss(disp, img))
    assert np.isfinite(v) and v >= 0
    # constant disparity -> zero loss
    v0 = float(smoothness_loss(jnp.ones((1, 8, 8)), img))
    assert v0 == 0.0

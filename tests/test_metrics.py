"""Metric protocol tests, incl. the reference's per-image <10%-valid skip."""

import numpy as np
import jax.numpy as jnp

from dcanet_tpu.train.metrics import eval_metrics, per_image_metrics


def test_per_image_skip_excludes_sparse_image():
    h, w = 8, 10
    gt = np.full((2, h, w), 10.0, np.float32)
    est = gt.copy()
    est[0] += 2.0  # image 0: EPE 2 everywhere
    est[1] += 6.0  # image 1: EPE 6 — but will be skipped
    mask = np.ones((2, h, w), bool)
    # image 1: gt fully valid but only 4% of pixels in-mask -> coverage
    # ratio 0.04 < 0.1 -> the reference protocol skips it.
    mask[1] = False
    mask[1, :1, :3] = True

    m = per_image_metrics(jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mask))
    assert int(m["n_valid_images"]) == 1
    np.testing.assert_allclose(float(m["epe"]), 2.0, atol=1e-6)
    np.testing.assert_allclose(float(m["thres3"]), 0.0, atol=1e-6)

    # the global protocol, by contrast, mixes both images
    g = eval_metrics(jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mask))
    assert float(g["epe"]) > 2.0


def test_per_image_all_skipped_returns_zero():
    gt = np.zeros((1, 4, 4), np.float32)  # no gt>0 anywhere
    est = np.ones_like(gt)
    mask = np.zeros((1, 4, 4), bool)
    m = per_image_metrics(jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mask))
    assert int(m["n_valid_images"]) == 0
    assert float(m["epe"]) == 0.0


def test_per_image_matches_global_when_dense():
    rng = np.random.default_rng(0)
    gt = rng.uniform(1.0, 60.0, (3, 8, 8)).astype(np.float32)
    est = gt + rng.normal(0, 2.0, gt.shape).astype(np.float32)
    mask = np.ones_like(gt, bool)
    m = per_image_metrics(jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mask))
    g = eval_metrics(jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mask))
    # fully-valid equal-size images: per-image mean == global mean
    for k in ("epe", "d1", "thres1", "thres2", "thres3"):
        np.testing.assert_allclose(float(m[k]), float(g[k]), rtol=1e-5)

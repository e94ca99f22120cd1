"""Resize / convex-upsample parity vs torch (CPU) — the reference uses
F.interpolate(mode='trilinear'/'bilinear', align_corners=False) and
F.unfold-based convex upsampling (models/submodule.py:357-392)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dcanet_tpu.ops import convex_upsample, resize_bilinear, resize_trilinear, unfold3x3
from dcanet_tpu.ops.regression import disparity_regression, softargmin_disparity


def test_trilinear_matches_torch(rng):
    x = rng.standard_normal((2, 6, 4, 5), dtype=np.float32)
    got = np.asarray(resize_trilinear(jnp.asarray(x), 2))
    want = F.interpolate(
        torch.from_numpy(x).unsqueeze(1), scale_factor=(2, 2, 2), mode="trilinear"
    ).squeeze(1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_trilinear_x8_matches_torch(rng):
    x = rng.standard_normal((1, 3, 4, 4), dtype=np.float32)
    got = np.asarray(resize_trilinear(jnp.asarray(x), 8))
    want = F.interpolate(
        torch.from_numpy(x).unsqueeze(1), scale_factor=(8, 8, 8), mode="trilinear"
    ).squeeze(1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_trilinear_channels(rng):
    x = rng.standard_normal((1, 4, 3, 5, 2), dtype=np.float32)
    got = np.asarray(resize_trilinear(jnp.asarray(x), 2))
    # torch: (B, C, D, H, W)
    want = F.interpolate(
        torch.from_numpy(x.transpose(0, 4, 1, 2, 3)),
        scale_factor=(2, 2, 2),
        mode="trilinear",
    ).numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bilinear_matches_torch(rng):
    x = rng.standard_normal((2, 5, 7), dtype=np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), 4))
    want = F.interpolate(
        torch.from_numpy(x).unsqueeze(1), scale_factor=(4, 4), mode="bilinear"
    ).squeeze(1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_unfold3x3_matches_torch(rng):
    x = rng.standard_normal((2, 5, 6), dtype=np.float32)
    got = np.asarray(unfold3x3(jnp.asarray(x)))  # (B, H, W, 9)
    want = (
        F.unfold(torch.from_numpy(x).unsqueeze(1), [3, 3], padding=1)
        .reshape(2, 9, 5, 6)
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_convex_upsample_matches_torch(rng):
    """Full parity with PropgationNet_4x's mask/unfold math
    (models/submodule.py:366-373), given identical mask logits."""
    b, h, w, scale = 2, 4, 6, 4
    disp = rng.standard_normal((b, h, w), dtype=np.float32)
    mask_logits = rng.standard_normal((b, h, w, 9 * scale * scale), dtype=np.float32)

    got = np.asarray(convex_upsample(jnp.asarray(disp), jnp.asarray(mask_logits), scale))

    # torch reference computation (mask channel-first: (B, 9*16, H, W))
    tdisp = torch.from_numpy(disp).unsqueeze(1)
    tmask = torch.from_numpy(mask_logits.transpose(0, 3, 1, 2))
    unfolded = F.unfold(scale * tdisp, [3, 3], padding=1).view(b, 1, 9, 1, 1, h, w)
    m = tmask.view(b, 1, 9, scale, scale, h, w)
    m = F.softmax(m, dim=2)
    up = torch.sum(m * unfolded, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3).reshape(b, 1, scale * h, scale * w)
    want = up.squeeze(1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_disparity_regression(rng):
    logits = rng.standard_normal((2, 8, 3, 4), dtype=np.float32)
    prob = np.asarray(jnp.asarray(logits))
    e = np.exp(prob - prob.max(1, keepdims=True))
    p = e / e.sum(1, keepdims=True)
    want = (p * np.arange(8).reshape(1, 8, 1, 1)).sum(1)
    got = np.asarray(softargmin_disparity(jnp.asarray(logits), 8))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    got2 = np.asarray(disparity_regression(jnp.asarray(p), 8))
    np.testing.assert_allclose(got2, want, rtol=1e-5, atol=1e-5)


"""Disp2Prob family vs torch reference math (models/loss.py:26-163)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dcanet_tpu.ops import gaussian_disp2prob, laplace_disp2prob, onehot_disp2prob


def torch_laplace(gt, maxdisp, start=0):
    # gt: (B, H, W) -> (B, D, H, W); mirrors LaplaceDisp2Prob.getProb
    g = torch.from_numpy(gt).unsqueeze(1)
    idx = torch.arange(0, maxdisp, dtype=g.dtype).view(1, maxdisp, 1, 1)
    end = start + maxdisp - 1
    mask = ((g > start) & (g < end)).to(g.dtype)
    g = g * mask
    prob = F.softmax(-torch.abs(idx - g), dim=1)
    return (prob * mask + 1e-40).numpy()


def test_laplace(rng):
    gt = (rng.random((2, 4, 5), dtype=np.float32) * 12) - 2  # some out of range
    got = np.asarray(laplace_disp2prob(jnp.asarray(gt), 8))
    want = torch_laplace(gt, 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_laplace_masked_pixels_near_zero(rng):
    gt = np.full((1, 2, 2), 100.0, np.float32)  # all out of range for D=8
    got = np.asarray(laplace_disp2prob(jnp.asarray(gt), 8))
    # XLA flushes the 1e-40 eps (subnormal in f32) to 0; either is fine.
    np.testing.assert_allclose(got, 0.0, atol=1e-39)


def test_gaussian_normalized(rng):
    gt = rng.random((1, 3, 3), dtype=np.float32) * 6 + 0.5
    got = np.asarray(gaussian_disp2prob(jnp.asarray(gt), 8, variance=2.0))
    np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-5)


def test_onehot(rng):
    gt = np.array([[[2.2, 5.0]]], np.float32)
    got = np.asarray(onehot_disp2prob(jnp.asarray(gt), 8))
    assert got[0, :, 0, 0].tolist() == [0, 0, 1, 0, 0, 0, 0, 0]
    assert got[0, :, 0, 1].tolist() == [0, 0, 0, 0, 0, 1, 0, 0]

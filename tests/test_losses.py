"""Loss parity vs torch mirrors of the reference math (models/loss.py)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dcanet_tpu import losses


def torch_stereo_focal(est, gt, max_disp, alpha, sparse):
    """Mirror of StereoFocalLoss.loss_per_level (models/loss.py:206-240)."""
    est = torch.from_numpy(est)  # (B, D, h, w)
    gt = torch.from_numpy(gt).unsqueeze(1)  # (B, 1, H, W)
    N, C, H, W = est.shape
    scaled_gt = gt.clone()
    scale = 1.0
    if gt.shape[-2] != H or gt.shape[-1] != W:
        scale = gt.shape[-1] / (W * 1.0)
        scaled_gt = gt.clone() / scale
        pool = F.adaptive_max_pool2d if sparse else F.adaptive_avg_pool2d
        scaled_gt = pool(scaled_gt, (H, W))
    lower, upper = 0, int(max_disp / scale)
    mask = (scaled_gt > lower) & (scaled_gt < upper)
    mask = mask.to(scaled_gt.dtype)
    m_gt = scaled_gt * mask
    # LaplaceDisp2Prob.getProb
    D = int(max_disp / scale)
    idx = torch.arange(0, D, dtype=m_gt.dtype).view(1, D, 1, 1)
    pmask = ((m_gt > 0) & (m_gt < D - 1)).to(m_gt.dtype)
    g = m_gt * pmask
    prob = F.softmax(-torch.abs(idx - g), dim=1) * pmask + 1e-40
    est_logp = F.log_softmax(est, dim=1)
    weight = (1.0 - prob).pow(-alpha)
    loss = -((prob * est_logp) * weight * mask).sum(dim=1, keepdim=True).mean()
    return loss.item()


def test_focal_same_scale(rng):
    est = rng.standard_normal((2, 8, 6, 10), dtype=np.float32)
    gt = (rng.random((2, 6, 10), dtype=np.float32) * 10).astype(np.float32)
    got = float(losses.stereo_focal_loss(jnp.asarray(est), jnp.asarray(gt), 8, 5.0))
    want = torch_stereo_focal(est, gt, 8, 5.0, False)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_focal_downscaled_dense(rng):
    est = rng.standard_normal((2, 8, 4, 6), dtype=np.float32)
    gt = (rng.random((2, 16, 24), dtype=np.float32) * 40).astype(np.float32)
    got = float(losses.stereo_focal_loss(jnp.asarray(est), jnp.asarray(gt), 32, 5.0))
    want = torch_stereo_focal(est, gt, 32, 5.0, False)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_focal_downscaled_sparse(rng):
    est = rng.standard_normal((1, 8, 4, 6), dtype=np.float32)
    gt = (rng.random((1, 16, 24), dtype=np.float32) * 40).astype(np.float32)
    gt[gt < 15] = 0.0  # sparse: zero-invalid like KITTI
    got = float(
        losses.stereo_focal_loss(jnp.asarray(est), jnp.asarray(gt), 32, 5.0, sparse=True)
    )
    want = torch_stereo_focal(est, gt, 32, 5.0, True)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_model_loss_matches_torch(rng):
    gt = (rng.random((2, 8, 8), dtype=np.float32) * 30).astype(np.float32)
    ests = [gt + rng.standard_normal((2, 8, 8)).astype(np.float32) for _ in range(2)]
    mask = gt > 10
    got = float(
        losses.model_loss([jnp.asarray(e) for e in ests], jnp.asarray(gt), jnp.asarray(mask))
    )
    want = 0.0
    for e, w in zip(ests, [1.8, 2.1]):
        t = F.smooth_l1_loss(
            torch.from_numpy(e)[torch.from_numpy(mask)],
            torch.from_numpy(gt)[torch.from_numpy(mask)],
        )
        want += w * t.item()
    np.testing.assert_allclose(got, want, rtol=1e-5)

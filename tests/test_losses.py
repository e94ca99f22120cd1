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


def test_ganet_custom_losses_forward_and_custom_grad():
    """ganet_loss/ganet_loss2 vs a direct numpy transcription of the
    reference's forward + hand-written backward (models/libs/GANet/functions/
    GANet.py:264-310), incl. its sequential-masking quirks."""
    import jax

    rng = np.random.default_rng(0)
    a = rng.standard_normal((4, 6)).astype(np.float32) * 4
    b = rng.standard_normal((4, 6)).astype(np.float32) * 4
    diff = a - b
    g = 1.0

    from dcanet_tpu.losses import ganet_loss, ganet_loss2

    # --- MyLossFunction (upper 5, lower 1) ---
    want_fwd = np.mean(np.abs(diff))
    scale = np.abs(diff).copy()
    scale[scale > 5.0] = 1.0
    tag = (scale <= 5.0) & (scale >= 1.0)
    scale[tag] = 2.0 - np.abs(scale[tag] - 3.0) / 2.0
    want_grad = np.sign(diff) * scale * g  # NB: no 1/N (reference quirk)

    got_fwd, got_grads = jax.value_and_grad(
        lambda x, y: ganet_loss(jnp.asarray(x), jnp.asarray(y)), argnums=(0, 1)
    )(a, b)
    np.testing.assert_allclose(float(got_fwd), want_fwd, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_grads[0]), want_grad, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_grads[1]), -want_grad, rtol=1e-5)

    # --- MyLoss2Function (thresh 1, alpha 2) ---
    t = np.abs(diff).copy()
    lo = t < 1.0
    t[lo] = t[lo] ** 2 / 1.0
    tag = (t <= 3.0) & (t >= 1.0)
    t[tag] = t[tag] * 2 - (t[tag] - 1.0) ** 2 / 4.0 - 1.0
    t[t > 3.0] += 1.0
    want_fwd2 = np.mean(t)

    s = np.abs(diff).copy()
    s[s > 3.0] = 1.0
    tag = (s <= 3.0) & (s >= 1.0)
    s[tag] = 2.0 - (s[tag] - 1.0) / 2.0
    tag = s < 1.0
    s[tag] = 2.0 * s[tag] / 1.0
    want_grad2 = np.sign(diff) * s * g / diff.size

    got_fwd2, got_grads2 = jax.value_and_grad(
        lambda x, y: ganet_loss2(jnp.asarray(x), jnp.asarray(y)), argnums=(0, 1)
    )(a, b)
    np.testing.assert_allclose(float(got_fwd2), want_fwd2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_grads2[0]), want_grad2, rtol=1e-5)

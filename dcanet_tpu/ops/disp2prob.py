"""Ground-truth disparity -> matching-probability volumes.

Capability parity with the reference's `Disp2Prob` family
(models/loss.py:26-163): Laplace / Gaussian / one-hot distributions centered
on the ground-truth disparity, with out-of-range pixels masked to ~zero
probability. All functions take gt disparity (B, H, W) and return
(B, maxdisp, H, W).

Matching quirks preserved from the reference:
  * `LaplaceDisp2Prob.calProb` ignores its `variance` argument
    (models/loss.py:123-128: `scaled_distance = -|index - gt|`); the
    `variance` parameter here is applied as a divisor only when != 1 so the
    default exactly reproduces the reference.
  * valid mask is strict: start_disp < gt < start_disp + maxdisp - 1
    (models/loss.py:87).
  * the output is `prob * mask + 1e-40` (models/loss.py:95).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-40


def _index_and_mask(gt: jnp.ndarray, maxdisp: int, start_disp: int):
    assert gt.ndim == 3, gt.shape
    end_disp = start_disp + maxdisp - 1
    index = jnp.arange(maxdisp, dtype=gt.dtype).reshape(1, maxdisp, 1, 1)
    mask = (gt > start_disp) & (gt < end_disp)
    mask = mask.astype(gt.dtype)
    gt = gt * mask
    return index, gt[:, None], mask[:, None]


def laplace_disp2prob(
    gt: jnp.ndarray, maxdisp: int, variance: float = 1.0, start_disp: int = 0
) -> jnp.ndarray:
    """softmax_d(-|d - gt| / variance), masked. Parity: models/loss.py:117-128."""
    index, gt4, mask = _index_and_mask(gt, maxdisp, start_disp)
    scaled = -jnp.abs(index - gt4)
    if variance != 1.0:
        scaled = scaled / variance
    prob = jax.nn.softmax(scaled, axis=1)
    return prob * mask + _EPS


def gaussian_disp2prob(
    gt: jnp.ndarray, maxdisp: int, variance: float = 1.0, start_disp: int = 0
) -> jnp.ndarray:
    """softmax_d(-(d - gt)^2 / variance), masked. Parity: models/loss.py:130-142."""
    index, gt4, mask = _index_and_mask(gt, maxdisp, start_disp)
    scaled = -jnp.square(jnp.abs(index - gt4)) / variance
    prob = jax.nn.softmax(scaled, axis=1)
    return prob * mask + _EPS


def onehot_disp2prob(
    gt: jnp.ndarray, maxdisp: int, variance: float = 0.5001, start_disp: int = 0
) -> jnp.ndarray:
    """Hard window |d - gt| < variance (no mask/eps). Parity: models/loss.py:144-163."""
    assert gt.ndim == 3, gt.shape
    index = jnp.arange(maxdisp, dtype=gt.dtype).reshape(1, maxdisp, 1, 1)
    return (jnp.abs(index - gt[:, None]) < variance).astype(gt.dtype)

"""Soft-argmin disparity regression.

Parity: reference models/submodule.py:127-131 (`disparity_regression`).
Probability volumes are (B, D, H, W); disparities are (B, H, W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def disparity_regression(prob: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """Expected disparity under a probability volume.

    prob: (B, D, H, W) softmax probabilities over the D axis (D == maxdisp).
    Returns (B, H, W): sum_d prob[:, d] * d.
    """
    assert prob.ndim == 4, prob.shape
    assert prob.shape[1] == maxdisp, (prob.shape, maxdisp)
    disp_values = jnp.arange(maxdisp, dtype=prob.dtype).reshape(1, maxdisp, 1, 1)
    return jnp.sum(prob * disp_values, axis=1)


def softargmin_disparity(cost: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """Fused softmax-over-D + expected-disparity on raw cost logits.

    cost: (B, D, H, W) unnormalized logits. Equivalent to
    `disparity_regression(softmax(cost, axis=1), maxdisp)` but keeps the
    softmax and the weighted reduction in one fusion group.
    """
    prob = jax.nn.softmax(cost, axis=1)
    return disparity_regression(prob, maxdisp)

"""Semantic-level context (SLC) class pooling — the heart of the DCA module.

The reference (models/augment/semantic_level.py:96-128) computes, with Python
loops over batch x disparity classes and boolean-mask indexing:

  1. p = softmax(logits, axis=D);  a = argmax_D p  (per-pixel disparity class)
  2. for each class d: over the pixels whose argmax == d, take the class
     probability s = p[pixel, d] (== the per-pixel max), softmax it across
     those pixels, and write `x[pixel, at plane d, :] * weight[pixel]` into a
     zero volume at plane d.

Boolean-mask indexing is shape-dynamic and unusable under XLA. Here the same
math is re-derived as dense one-hot linear algebra (static shapes, MXU-friendly
matmuls, no per-class loop):

  onehot[p, d]  = [a_p == d]
  M_d           = max_{p: a_p=d} s_p          (class max, for a stable softmax)
  e_p           = exp(s_p - M_{a_p})
  Z_d           = sum_{p: a_p=d} e_p          (one matmul: onehot^T e)
  weight_p      = e_p / Z_{a_p}
  out[p, d, :]  = onehot[p, d] * weight_p * x[p, a_p, :]

The "skip empty class" branch of the reference is vacuous here: every pixel
belongs to its own (hence non-empty) class, and empty classes receive only
zeros.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def slc_pool(x: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """Dense semantic-level class pooling.

    Args:
      x:      (B, D, H, W, C) cost-volume features.
      logits: (B, D, H, W) raw classification logits over the D axis.

    Returns:
      (B, D, H, W, C) volume, zero except at each pixel's argmax plane, where
      it holds the pixel's feature scaled by its within-class softmax weight.
    """
    b, d, h, w, c = x.shape
    assert logits.shape == (b, d, h, w), (logits.shape, x.shape)

    p = jax.nn.softmax(logits, axis=1)  # (B, D, H, W)
    a = jnp.argmax(p, axis=1)  # (B, H, W) int
    s = jnp.max(p, axis=1)  # (B, H, W) prob at the argmax plane

    onehot = jax.nn.one_hot(a, d, dtype=x.dtype)  # (B, H, W, D)

    # Per-class max of s (for softmax stability parity with torch.F.softmax
    # over the masked subset). Sentinel for empty classes is 0.0: s is a
    # softmax maximum so s >= 1/D > 0 for every pixel, hence the masked max
    # over a NON-empty class is unaffected, and empty classes are never
    # gathered back. (A -inf sentinel poisons the one-hot contraction with
    # 0 * inf = NaN; a -1e30 sentinel overflows to inf under XLA fusion that
    # factors exp(s - pix_max) — observed on the CPU backend.)
    masked_s = jnp.where(onehot > 0, s[..., None], 0.0)  # (B, H, W, D)
    class_max = jnp.max(masked_s, axis=(1, 2))  # (B, D)
    pix_max = jnp.einsum("bhwd,bd->bhw", onehot, class_max)

    e = jnp.exp(s - pix_max)  # (B, H, W)
    class_sum = jnp.einsum("bhwd,bhw->bd", onehot, e)  # (B, D)
    pix_sum = jnp.einsum("bhwd,bd->bhw", onehot, class_sum)
    weight = e / pix_sum  # (B, H, W) softmax weight within the pixel's class

    # Feature at the argmax plane: contraction over D (one small matmul per
    # pixel instead of a gather).
    f = jnp.einsum("bdhwc,bhwd->bhwc", x, onehot)  # (B, H, W, C)

    scaled = f * weight[..., None]  # (B, H, W, C)
    # Scatter back to the argmax plane via broadcast with the one-hot mask.
    out = onehot.transpose(0, 3, 1, 2)[..., None] * scaled[:, None]  # (B,D,H,W,C)
    return out

"""TPU-native semi-global (SGA) and local guided (LGA) cost aggregation.

The reference vendors GANet's CUDA kernels for these (models/libs/GANet/src/
GANet_kernel.cu: sga_{down,up,right,left}_forward at :66-720, lga/lga3d; not
wired into the committed models but part of the lineage's capability surface
— SURVEY §2.8). Here they are re-derived for XLA:

SGA: per direction r in {down, up, right, left}, a first-order recurrence
along the scan line with 5 learned, per-pixel weights (normalized to sum 1):

  out[p, d] = w0[p]*cost[p, d]
            + w1[p]*out[p-r, d]
            + w2[p]*out[p-r, d-1]
            + w3[p]*out[p-r, d+1]
            + w4[p]*max_d' out[p-r, d']

expressed as `lax.scan` over the scan axis (sequential length H or W, each
step a fused vectorized update over the full (B, line, D) slab — the scan is
the TPU analog of the CUDA thread-per-pixel wavefront). The four directions
are fused with an elementwise max, as in the reference's Max/MaxDepth fusion
(GANet_kernel.cu:23-64).

LGA: per-pixel learned (2r+1)^2 spatial filters applied to each disparity
plane, with separate filters for d-1, d, d+1 (lga3d) — an unfold + einsum.

Layouts: cost (B, D, H, W); SGA weights (B, H, W, 4, 5) (direction-major);
LGA filters (B, H, W, 3, (2r+1)^2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sga_scan(cost: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Recurrence along axis 0.

    cost: (L, B, X, D) — L is the scan axis (rows or cols), X the other
    spatial axis. w: (L, B, X, 5) weights.
    Returns aggregated (L, B, X, D).
    """

    def step(prev, inputs):
        c, wt = inputs  # (B, X, D), (B, X, 5)
        w0, w1, w2, w3, w4 = [wt[..., i : i + 1] for i in range(5)]
        prev_dm1 = jnp.pad(prev[..., :-1], ((0, 0), (0, 0), (1, 0)))
        prev_dp1 = jnp.pad(prev[..., 1:], ((0, 0), (0, 0), (0, 1)))
        prev_max = jnp.max(prev, axis=-1, keepdims=True)
        out = (
            w0 * c + w1 * prev + w2 * prev_dm1 + w3 * prev_dp1 + w4 * prev_max
        )
        return out, out

    # First step sees a zero "previous" line, matching the CUDA kernel's
    # boundary handling (out[0] = w0 * cost[0]).
    init = jnp.zeros_like(cost[0])
    _, outs = jax.lax.scan(step, init, (cost, w))
    return outs


def sga_aggregate(cost: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """4-direction semi-global aggregation with max fusion.

    cost: (B, D, H, W); weights: (B, H, W, 4, 5), already normalized
    (softmax over the last axis is the caller's duty, as in GANet's guidance
    subnet). Directions: 0=down (top->bottom), 1=up, 2=right (left->right),
    3=left. Returns (B, D, H, W) = max over directions.
    """
    b, d, h, w_ = cost.shape
    assert weights.shape == (b, h, w_, 4, 5), weights.shape
    # (B, D, H, W) -> (H, B, W, D) for row scans
    rows = cost.transpose(2, 0, 3, 1)
    w_rows = weights.transpose(1, 0, 2, 3, 4)  # (H, B, W, 4, 5)
    down = _sga_scan(rows, w_rows[..., 0, :])
    up = _sga_scan(rows[::-1], w_rows[::-1][..., 1, :])[::-1]
    # (B, D, H, W) -> (W, B, H, D) for column scans
    cols = cost.transpose(3, 0, 2, 1)
    w_cols = weights.transpose(2, 0, 1, 3, 4)  # (W, B, H, 4, 5)
    right = _sga_scan(cols, w_cols[..., 2, :])
    left = _sga_scan(cols[::-1], w_cols[::-1][..., 3, :])[::-1]

    down = down.transpose(1, 3, 0, 2)  # (B, D, H, W)
    up = up.transpose(1, 3, 0, 2)
    right = right.transpose(1, 3, 2, 0)
    left = left.transpose(1, 3, 2, 0)
    return jnp.maximum(jnp.maximum(down, up), jnp.maximum(right, left))


def lga3d(cost: jnp.ndarray, filters: jnp.ndarray, radius: int = 2) -> jnp.ndarray:
    """Local guided aggregation over d-1/d/d+1 planes.

    cost: (B, D, H, W); filters: (B, H, W, 3, K2) with K2 = (2r+1)^2,
    ordering k = (dy+r)*(2r+1) + (dx+r). Returns (B, D, H, W):

      out[d] = sum_k f[:, :, :, 0, k]*patch_k(cost[d-1])
             + f[..., 1, k]*patch_k(cost[d])
             + f[..., 2, k]*patch_k(cost[d+1])
    """
    b, d, h, w = cost.shape
    k = 2 * radius + 1
    assert filters.shape == (b, h, w, 3, k * k), filters.shape
    padded = jnp.pad(cost, ((0, 0), (0, 0), (radius, radius), (radius, radius)))
    patches = jnp.stack(
        [
            padded[:, :, dy : dy + h, dx : dx + w]
            for dy in range(k)
            for dx in range(k)
        ],
        axis=-1,
    )  # (B, D, H, W, K2)
    cost_m1 = jnp.pad(patches[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    cost_p1 = jnp.pad(patches[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    out = (
        jnp.einsum("bdhwk,bhwk->bdhw", cost_m1, filters[..., 0, :])
        + jnp.einsum("bdhwk,bhwk->bdhw", patches, filters[..., 1, :])
        + jnp.einsum("bdhwk,bhwk->bdhw", cost_p1, filters[..., 2, :])
    )
    return out

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


def _sga_step(prev, c, wt):
    """One recurrence update. prev/c: (..., D, X); wt: (..., 5, 1, X)
    (per-pixel weights: broadcast over D only, X is explicit). D rides the SUBLANE axis and the wide spatial
    axis X rides the LANES (X is W or H >= 96 at production shapes, vs
    D = 48 — lane-major D wasted 2/3 of each vector register)."""
    w0, w1, w2, w3, w4 = [wt[..., i, :, :] for i in range(5)]
    prev_dm1 = jnp.pad(prev[..., :-1, :], [(0, 0)] * (prev.ndim - 2) + [(1, 0), (0, 0)])
    prev_dp1 = jnp.pad(prev[..., 1:, :], [(0, 0)] * (prev.ndim - 2) + [(0, 1), (0, 0)])
    prev_max = jnp.max(prev, axis=-2, keepdims=True)
    return w0 * c + w1 * prev + w2 * prev_dm1 + w3 * prev_dp1 + w4 * prev_max


def _sga_scan_bidir(cost: jnp.ndarray, w_fwd: jnp.ndarray, w_bwd: jnp.ndarray):
    """Forward AND backward recurrences along axis 0 in ONE lax.scan.

    cost: (L, B, D, X) — L is the scan axis (rows or cols), X the other
    spatial axis (lane-major). w_fwd/w_bwd: (L, B, 5, 1, X) weights for the
    forward (0->L) and backward (L->0) directions.

    Fusing the two directions halves the serial step count vs two scans
    (each step's slab is tiny — (B, D, X) elementwise taps — so on TPU the
    scan is overhead-bound, not FLOP-bound; measured in
    tools/profile_ganet.py). unroll=8 further amortizes the per-step loop
    overhead. Returns (fwd_out, bwd_out), both (L, B, D, X) in the original
    line order.
    """

    def step(carry, inputs):
        pf, pb = carry
        cf, cb, wf, wb = inputs
        outf = _sga_step(pf, cf, wf)
        outb = _sga_step(pb, cb, wb)
        return (outf, outb), (outf, outb)

    # First step sees a zero "previous" line, matching the CUDA kernel's
    # boundary handling (out[0] = w0 * cost[0]).
    init = (jnp.zeros_like(cost[0]), jnp.zeros_like(cost[0]))
    _, (fwd, bwd_rev) = jax.lax.scan(
        step, init, (cost, cost[::-1], w_fwd, w_bwd[::-1]), unroll=8
    )
    return fwd, bwd_rev[::-1]


def sga_aggregate(cost: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """4-direction semi-global aggregation with max fusion.

    cost: (B, D, H, W); weights: (B, H, W, 4, 5), already normalized
    (softmax over the last axis is the caller's duty, as in GANet's guidance
    subnet). Directions: 0=down (top->bottom), 1=up, 2=right (left->right),
    3=left. Returns (B, D, H, W) = max over directions.
    """
    b, d, h, w_ = cost.shape
    assert weights.shape == (b, h, w_, 4, 5), weights.shape
    # (B, D, H, W) -> (H, B, D, W) for row scans: W stays lane-major
    rows = cost.transpose(2, 0, 1, 3)
    # (B, H, W, 4, 5) -> (H, B, 4, 5, W), then (H, B, 5, 1, W) per direction
    w_rows = weights.transpose(1, 0, 3, 4, 2)[..., None, :]
    down, up = _sga_scan_bidir(rows, w_rows[:, :, 0], w_rows[:, :, 1])
    # (B, D, H, W) -> (W, B, D, H) for column scans: H lane-major
    cols = cost.transpose(3, 0, 1, 2)
    w_cols = weights.transpose(2, 0, 3, 4, 1)[..., None, :]
    right, left = _sga_scan_bidir(cols, w_cols[:, :, 2], w_cols[:, :, 3])

    down = down.transpose(1, 2, 0, 3)  # (B, D, H, W)
    up = up.transpose(1, 2, 0, 3)
    right = right.transpose(1, 2, 3, 0)
    left = left.transpose(1, 2, 3, 0)
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

"""SGA/LGA vs naive loop references (GANet recurrence semantics,
GANet_kernel.cu:66-128)."""

import numpy as np
import jax.numpy as jnp

from dcanet_tpu.ops.sga import lga3d, sga_aggregate


def naive_sga_down(cost, w):
    # cost (B, D, H, W); w (B, H, W, 5) — recurrence over rows, zero init
    b, d, h, wd = cost.shape
    out = np.zeros_like(cost)
    for y in range(h):
        for x in range(wd):
            for bb in range(b):
                w0, w1, w2, w3, w4 = w[bb, y, x]
                prev = out[bb, :, y - 1, x] if y > 0 else np.zeros(d, cost.dtype)
                pm1 = np.concatenate([[0.0], prev[:-1]]).astype(cost.dtype)
                pp1 = np.concatenate([prev[1:], [0.0]]).astype(cost.dtype)
                out[bb, :, y, x] = (
                    w0 * cost[bb, :, y, x]
                    + w1 * prev
                    + w2 * pm1
                    + w3 * pp1
                    + w4 * prev.max()
                )
    return out


def test_sga_down_scan_matches_naive(rng):
    from dcanet_tpu.ops.sga import _sga_scan_bidir

    b, d, h, w = 2, 5, 4, 3
    cost = rng.standard_normal((b, d, h, w), dtype=np.float32)
    raw = rng.random((b, h, w, 2, 5)).astype(np.float32)
    wts = raw / raw.sum(-1, keepdims=True)
    rows = jnp.asarray(cost).transpose(2, 0, 1, 3)  # (H, B, D, W)
    # (B, H, W, 2, 5) -> (H, B, 2, 5, W) -> per-direction (H, B, 5, 1, W)
    w_rows = jnp.asarray(wts).transpose(1, 0, 3, 4, 2)[..., None, :]
    down, up = _sga_scan_bidir(rows, w_rows[:, :, 0], w_rows[:, :, 1])
    want_down = naive_sga_down(cost, wts[..., 0, :])
    np.testing.assert_allclose(
        np.asarray(down).transpose(1, 2, 0, 3), want_down, rtol=1e-4, atol=1e-5
    )
    # backward direction == naive down on the row-reversed volume, reversed
    want_up = naive_sga_down(cost[:, :, ::-1], wts[:, ::-1][..., 1, :])[:, :, ::-1]
    np.testing.assert_allclose(
        np.asarray(up).transpose(1, 2, 0, 3), want_up, rtol=1e-4, atol=1e-5
    )


def test_sga_passthrough():
    """w = [1,0,0,0,0] for every direction -> output == input."""
    rng = np.random.default_rng(1)
    cost = rng.standard_normal((2, 6, 5, 4)).astype(np.float32)
    w = np.zeros((2, 5, 4, 4, 5), np.float32)
    w[..., 0] = 1.0
    got = np.asarray(sga_aggregate(jnp.asarray(cost), jnp.asarray(w)))
    np.testing.assert_allclose(got, cost, rtol=1e-6)


def test_sga_accumulates_down():
    """w = [1,1,0,0,0] down only, others pass-through: down output is the
    prefix sum over rows; max fusion picks max(prefix, identity)."""
    cost = np.ones((1, 3, 4, 2), np.float32)
    w = np.zeros((1, 4, 2, 4, 5), np.float32)
    w[..., 0] = 1.0
    w[..., 0, 1] = 1.0  # down: out = cost + prev
    got = np.asarray(sga_aggregate(jnp.asarray(cost), jnp.asarray(w)))
    expected_rows = np.array([1, 2, 3, 4], np.float32)
    np.testing.assert_allclose(got[0, 0, :, 0], expected_rows, rtol=1e-6)


def naive_lga3d(cost, filters, radius):
    b, d, h, w = cost.shape
    k = 2 * radius + 1
    out = np.zeros_like(cost)
    padded = np.pad(cost, ((0, 0), (0, 0), (radius, radius), (radius, radius)))
    for dd in range(d):
        for y in range(h):
            for x in range(w):
                acc = 0.0
                for i, dplane in enumerate([dd - 1, dd, dd + 1]):
                    if dplane < 0 or dplane >= d:
                        continue
                    patch = padded[:, dplane, y : y + k, x : x + k].reshape(b, -1)
                    acc = acc + (patch * filters[:, y, x, i, :]).sum(-1)
                out[:, dd, y, x] = acc
    return out


def test_lga3d(rng):
    b, d, h, w, r = 1, 4, 5, 6, 1
    cost = rng.standard_normal((b, d, h, w), dtype=np.float32)
    filters = rng.standard_normal((b, h, w, 3, (2 * r + 1) ** 2), dtype=np.float32)
    got = np.asarray(lga3d(jnp.asarray(cost), jnp.asarray(filters), radius=r))
    want = naive_lga3d(cost, filters, r)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

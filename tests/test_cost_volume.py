"""Cost-volume ops vs naive loop references (reference semantics:
models/submodule.py:134-167, NCHW in-place stores, here validated in numpy)."""

import numpy as np
import jax.numpy as jnp

from dcanet_tpu.ops import build_concat_volume, build_gwc_volume


def naive_gwc(left, right, maxdisp, groups):
    # left/right: (B, H, W, C)
    b, h, w, c = left.shape
    cpg = c // groups
    vol = np.zeros((b, maxdisp, h, w, groups), np.float32)
    for d in range(maxdisp):
        for ww in range(d, w):
            prod = left[:, :, ww, :] * right[:, :, ww - d, :]
            vol[:, d, :, ww, :] = prod.reshape(b, h, groups, cpg).mean(-1)
    return vol


def naive_concat(left, right, maxdisp):
    b, h, w, c = left.shape
    vol = np.zeros((b, maxdisp, h, w, 2 * c), np.float32)
    for d in range(maxdisp):
        for ww in range(d, w):
            vol[:, d, :, ww, :c] = left[:, :, ww, :]
            vol[:, d, :, ww, c:] = right[:, :, ww - d, :]
    return vol


def test_gwc_volume(rng):
    left = rng.standard_normal((2, 5, 12, 16), dtype=np.float32)
    right = rng.standard_normal((2, 5, 12, 16), dtype=np.float32)
    got = np.asarray(build_gwc_volume(jnp.asarray(left), jnp.asarray(right), 6, 4))
    want = naive_gwc(left, right, 6, 4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_concat_volume(rng):
    left = rng.standard_normal((2, 4, 10, 3), dtype=np.float32)
    right = rng.standard_normal((2, 4, 10, 3), dtype=np.float32)
    got = np.asarray(build_concat_volume(jnp.asarray(left), jnp.asarray(right), 5))
    want = naive_concat(left, right, 5)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_gwc_zero_margin(rng):
    left = rng.standard_normal((1, 3, 8, 8), dtype=np.float32)
    right = rng.standard_normal((1, 3, 8, 8), dtype=np.float32)
    vol = np.asarray(build_gwc_volume(jnp.asarray(left), jnp.asarray(right), 4, 2))
    for d in range(4):
        assert np.all(vol[:, d, :, :d, :] == 0.0)

"""Dense SLC pooling vs a direct loop implementation of the reference
semantics (models/augment/semantic_level.py:96-128: per-batch, per-class
boolean-mask indexing + within-class softmax, no pooling sum)."""

import numpy as np
import jax.numpy as jnp

from dcanet_tpu.ops import slc_pool


def naive_slc(x, logits):
    # x: (B, D, H, W, C); logits: (B, D, H, W)
    b, d, h, w, c = x.shape
    # softmax over D
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    p = e / e.sum(axis=1, keepdims=True)
    out = np.zeros_like(x)
    for bi in range(b):
        pm = p[bi].reshape(d, h * w).T  # (HW, D)
        xm = x[bi].reshape(d, h * w, c).transpose(1, 0, 2)  # (HW, D, C)
        argmax = pm.argmax(axis=1)  # (HW,)
        for cls in range(d):
            mask = argmax == cls
            if mask.sum() == 0:
                continue
            s = pm[mask, cls]
            es = np.exp(s - s.max())
            weight = es / es.sum()
            feats = xm[mask, cls] * weight[:, None]  # (n, C)
            flat = out[bi].reshape(d, h * w, c)
            flat[cls, mask, :] = feats
    return out


def test_slc_matches_loop(rng):
    b, d, h, w, c = 2, 6, 4, 5, 3
    x = rng.standard_normal((b, d, h, w, c), dtype=np.float32)
    logits = rng.standard_normal((b, d, h, w), dtype=np.float32)
    got = np.asarray(slc_pool(jnp.asarray(x), jnp.asarray(logits)))
    want = naive_slc(x, logits)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_slc_single_class(rng):
    """All pixels in one class -> weights form a global softmax over s."""
    b, d, h, w, c = 1, 3, 2, 2, 1
    logits = np.zeros((b, d, h, w), np.float32)
    logits[:, 1] = 5.0  # argmax plane 1 everywhere
    x = rng.standard_normal((b, d, h, w, c), dtype=np.float32)
    got = np.asarray(slc_pool(jnp.asarray(x), jnp.asarray(logits)))
    # planes 0 and 2 must be exactly zero
    assert np.all(got[:, 0] == 0) and np.all(got[:, 2] == 0)
    # plane 1: x * uniform weight (equal probs -> 1/(H*W))
    np.testing.assert_allclose(
        got[:, 1], x[:, 1] / (h * w), rtol=1e-5, atol=1e-7
    )

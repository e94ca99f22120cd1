"""Pallas kernels vs XLA reference implementations (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcanet_tpu.ops import build_gwc_volume


def _pallas_gwc_interpret(left, right, maxdisp, groups):
    """Run the kernel in interpreter mode (no TPU in the test env)."""
    from jax.experimental import pallas as pl  # noqa: F401
    import dcanet_tpu.kernels.gwc as G

    orig = pl.pallas_call
    import functools

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    G.pl.pallas_call = patched
    try:
        return G._gwc_forward(left, right, maxdisp, groups)
    finally:
        G.pl.pallas_call = orig


def test_gwc_kernel_matches_xla(rng):
    b, h, w, c = 2, 4, 24, 16
    maxdisp, groups = 8, 4
    left = jnp.asarray(rng.standard_normal((b, h, w, c), dtype=np.float32))
    right = jnp.asarray(rng.standard_normal((b, h, w, c), dtype=np.float32))
    want = build_gwc_volume(left, right, maxdisp, groups)
    got = _pallas_gwc_interpret(left, right, maxdisp, groups)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_kdfold_conv3d_matches_xla(rng):
    """kd-fold fast conv3d (XLA conv2d + Pallas epilogue, interpret mode on
    CPU) vs the native 3D conv, incl. the fused affine+relu eval variant."""
    import dcanet_tpu.kernels.conv3d as K

    b, d, h, w, c, co = 1, 5, 8, 12, 8, 8
    x = jnp.asarray(rng.standard_normal((b, d, h, w, c), dtype=np.float32))
    wt = jnp.asarray(rng.standard_normal((3, 3, 3, c, co), dtype=np.float32)) * 0.2
    want = K.conv3d_xla(x, wt)

    K._INTERPRET = True
    try:
        got = K.conv3d_kdfold(x, wt)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

        scale = jnp.asarray(rng.uniform(0.5, 1.5, (co,)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
        got_f = K.conv3d_kdfold_fused(x, wt, scale, bias, relu=True)
        want_f = jnp.maximum(want * scale + bias, 0.0)
        np.testing.assert_allclose(
            np.asarray(got_f), np.asarray(want_f), rtol=1e-4, atol=1e-4
        )
    finally:
        K._INTERPRET = False


def test_kdfold_stride2_matches_xla(rng):
    import dcanet_tpu.kernels.conv3d as K

    b, d, h, w, c, co = 1, 6, 8, 12, 8, 16
    x = jnp.asarray(rng.standard_normal((b, d, h, w, c), dtype=np.float32))
    wt = jnp.asarray(rng.standard_normal((3, 3, 3, c, co), dtype=np.float32)) * 0.2
    want = jax.lax.conv_general_dilated(
        x, wt, (2, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    got = K.conv3d_kdfold(x, wt, strides=(2, 2, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_kdfold_grad_matches_xla(rng):
    """custom_vjp of the kd-fold epilogue vs autodiff of the native conv."""
    import dcanet_tpu.kernels.conv3d as K

    b, d, h, w, c, co = 1, 4, 8, 10, 8, 8
    x = jnp.asarray(rng.standard_normal((b, d, h, w, c), dtype=np.float32))
    wt = jnp.asarray(rng.standard_normal((3, 3, 3, c, co), dtype=np.float32)) * 0.2
    g = jnp.asarray(rng.standard_normal((b, d, h, w, co), dtype=np.float32))

    def ref_loss(x, wt):
        return jnp.sum(K.conv3d_xla(x, wt) * g)

    def fast_loss(x, wt):
        return jnp.sum(K.conv3d_kdfold(x, wt) * g)

    dref = jax.grad(ref_loss, argnums=(0, 1))(x, wt)
    K._INTERPRET = True
    try:
        dfast = jax.grad(fast_loss, argnums=(0, 1))(x, wt)
    finally:
        K._INTERPRET = False
    for a, b_ in zip(dfast, dref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_gwc_custom_vjp_matches_xla_grad(rng):
    """Backward (XLA formulation in the custom_vjp) vs autodiff of the
    reference op."""
    from dcanet_tpu.kernels.gwc import _bwd

    b, h, w, c = 1, 3, 12, 8
    maxdisp, groups = 4, 2
    left = jnp.asarray(rng.standard_normal((b, h, w, c), dtype=np.float32))
    right = jnp.asarray(rng.standard_normal((b, h, w, c), dtype=np.float32))
    g = jnp.asarray(rng.standard_normal((b, maxdisp, h, w, groups), dtype=np.float32))

    def ref_loss(l, r):
        return jnp.sum(build_gwc_volume(l, r, maxdisp, groups) * g)

    dl_ref, dr_ref = jax.grad(ref_loss, argnums=(0, 1))(left, right)
    dl, dr = _bwd(maxdisp, groups, (left, right), g)
    np.testing.assert_allclose(np.asarray(dl), np.asarray(dl_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dr), np.asarray(dr_ref), rtol=1e-5, atol=1e-5)


def test_deconv2x_flat_rejects_unpacked_operands():
    """An UNPACKED (B, 2D, 2H, 2W, Co) tensor has the same element count as
    the packed (B, D, H, W, 8Co) layout, so without the shape guard the
    reshape would succeed and silently corrupt the output (ADVICE r3/r4)."""
    from dcanet_tpu.kernels.deconv3d import deconv2x_flat

    y = jnp.zeros((1, 4, 4, 6, 8), jnp.float32)
    w = jnp.zeros((3, 3, 3, 8, 4), jnp.float32)
    bad = jnp.zeros((1, 8, 8, 12, 4), jnp.float32)  # unpacked, same numel
    good = jnp.zeros((1, 4, 4, 6, 32), jnp.float32)
    with pytest.raises(ValueError, match="packed"):
        deconv2x_flat(y, w, packed_residual=bad)
    with pytest.raises(ValueError, match="packed"):
        deconv2x_flat(y, w, post_packed_add=bad)
    # the correctly packed layout passes the guard
    out = deconv2x_flat(y, w, packed_residual=good, post_packed_add=good)
    assert out.shape == (1, 8, 8, 12, 4)

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

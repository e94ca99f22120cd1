"""TPU fast-path formulations vs reference XLA ops, forced on CPU.

The Conv fast paths (pointwise-as-matmul, dslice stride-1/2) and the
separable AvgPool3d only activate when jax.default_backend() == 'tpu';
here we monkeypatch the backend query so the CPU test suite exercises the
exact same lowering-level math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dcanet_tpu.nn.layers as L


@pytest.fixture
def fake_tpu(monkeypatch):
    monkeypatch.setattr(L.jax, "default_backend", lambda: "tpu")


def _conv_ref(x, kernel, strides, padding):
    n = x.ndim - 2
    dn = {2: ("NHWC", "HWIO", "NHWC"), 3: ("NDHWC", "DHWIO", "NDHWC")}[n]
    return jax.lax.conv_general_dilated(
        x, kernel, strides, padding, dimension_numbers=dn
    )


def _run_conv(x, features, kernel_size, strides, padding, fake, dtype=None):
    conv = L.Conv(
        features, kernel_size, strides=strides, padding=padding, use_bias=False,
        dtype=dtype,
    )
    v = conv.init(jax.random.PRNGKey(0), x)
    kernel = v["params"]["kernel"]
    if dtype is not None:
        kernel = kernel.astype(dtype)
    return conv.apply(v, x), kernel


def test_pointwise_conv_matches(rng, fake_tpu):
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 10, 16)), jnp.float32)
    y, k = _run_conv(x, 24, (1, 1, 1), (1, 1, 1), ((0, 0),) * 3, True)
    want = _conv_ref(x, k, (1, 1, 1), ((0, 0),) * 3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("strides", [(1, 1, 1), (2, 2, 2)])
def test_kdfold_conv3d_fastpath_matches(rng, fake_tpu, strides):
    x = jnp.asarray(rng.standard_normal((1, 7, 10, 12, 8)), jnp.bfloat16)
    y, k = _run_conv(x, 8, (3, 3, 3), strides, ((1, 1),) * 3, True, dtype=jnp.bfloat16)
    want = _conv_ref(x, k, strides, ((1, 1),) * 3)
    assert y.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(want, np.float32), rtol=0.05, atol=0.05
    )


def _avgpool_ref(x):
    # monolithic torch-equivalent reference (count_include_pad=True)
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
    )
    return summed / 27.0


def test_separable_avgpool_matches(rng, fake_tpu):
    x = jnp.asarray(rng.standard_normal((2, 7, 9, 11, 4)), jnp.float32)
    pool = L.AvgPool3dTorch()
    v = pool.init(jax.random.PRNGKey(0), x)
    got = pool.apply(v, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_avgpool_ref(x)), rtol=1e-5, atol=1e-6
    )


def test_avgpool_kdfold_path_matches(rng, fake_tpu):
    """bf16 + C%8==0 routes avgpool through the kd-fold conv formulation."""
    x = jnp.asarray(rng.standard_normal((1, 6, 9, 11, 8)), jnp.bfloat16)
    pool = L.AvgPool3dTorch()
    v = pool.init(jax.random.PRNGKey(0), x)
    got = pool.apply(v, x)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(_avgpool_ref(x)),
        rtol=0.05, atol=0.02,
    )


def test_deconv_subpixel_train_path_matches(rng, fake_tpu, monkeypatch):
    """TorchConvTranspose's subpixel route (default on TPU+bf16, incl.
    train) == the lhs-dilated emitter."""
    import jax
    import jax.numpy as jnp

    from dcanet_tpu.nn.layers import TorchConvTranspose

    x = jnp.asarray(rng.standard_normal((2, 6, 8, 10, 16)), jnp.bfloat16)
    m = TorchConvTranspose(8, dims=3, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("DCANET_DECONV_SUBPIXEL_TRAIN", "1")
    got = m.apply(v, x)
    monkeypatch.setenv("DCANET_DECONV_SUBPIXEL_TRAIN", "0")
    want = m.apply(v, x)
    assert got.shape == want.shape == (2, 12, 16, 20, 8)
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    assert np.abs(g - w).max() <= 0.05 * max(np.abs(w).max(), 1e-3)

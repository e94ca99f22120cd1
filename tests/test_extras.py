"""Auxiliary modules: shapes + key invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcanet_tpu.nn.context import (
    DisparityLevelContext,
    ImageLevelContext,
    NonLocalAttention,
    SELayerD,
    SemanticLevelContextLocal,
)
from dcanet_tpu.nn.extras import (
    Hourglass2D,
    MobileV2Residual,
    PyramidPooling,
    UNetFeatureExtractor,
    fmish,
)

KEY = jax.random.PRNGKey(0)


def test_fmish():
    x = jnp.asarray([-2.0, 0.0, 3.0])
    got = np.asarray(fmish(x))
    want = np.asarray(x) * np.tanh(np.log1p(np.exp(np.asarray(x))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.slow
def test_nonlocal_shape(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 6, 16), dtype=np.float32))
    m = NonLocalAttention(transform_channels=16, out_channels=16)
    v = m.init(KEY, x, x, True)
    out, _ = m.apply(v, x, x, True, mutable=["batch_stats"])
    assert out.shape == x.shape


@pytest.mark.slow
def test_image_level_context(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 6, 16), dtype=np.float32))
    m = ImageLevelContext(feats_channels=16, transform_channels=16)
    v = m.init(KEY, x, True)
    out, _ = m.apply(v, x, True, mutable=["batch_stats"])
    assert out.shape == x.shape


def test_disparity_level_context(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 6, 8), dtype=np.float32))
    m = DisparityLevelContext(feats_channels=8)
    v = m.init(KEY, x, True)
    out = m.apply(v, x, True)
    assert out.shape == x.shape


def test_se_layer_d(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 3, 4, 8), dtype=np.float32))
    m = SELayerD(disparity_planes=6)
    v = m.init(KEY, x)
    out = m.apply(v, x)
    assert out.shape == x.shape


@pytest.mark.slow
def test_slc_local(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 6, 16), dtype=np.float32))
    lg = jnp.asarray(rng.standard_normal((1, 4, 4, 6), dtype=np.float32))
    m = SemanticLevelContextLocal(feats_channels=16, transform_channels=16)
    v = m.init(KEY, x, lg, True)
    out, _ = m.apply(v, x, lg, True, mutable=["batch_stats"])
    assert out.shape == x.shape


@pytest.mark.slow
def test_pyramid_pooling_modes(rng):
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 16), dtype=np.float32))
    cat = PyramidPooling(pool_sizes=(8, 4, 2, 1), fusion_mode="cat")
    v = cat.init(KEY, x, True)
    out, _ = cat.apply(v, x, True, mutable=["batch_stats"])
    assert out.shape == (1, 32, 32, 16 + 4 * 4)
    s = PyramidPooling(pool_sizes=(8, 4, 2, 1), fusion_mode="sum")
    v = s.init(KEY, x, True)
    out, _ = s.apply(v, x, True, mutable=["batch_stats"])
    assert out.shape == x.shape


@pytest.mark.slow
def test_mobilev2_and_hourglass2d(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8), dtype=np.float32))
    m = MobileV2Residual(8, strides=1)
    v = m.init(KEY, x, True)
    out, _ = m.apply(v, x, True, mutable=["batch_stats"])
    assert out.shape == x.shape
    hg = Hourglass2D(8)
    v = hg.init(KEY, x, True)
    out, _ = hg.apply(v, x, True, mutable=["batch_stats"])
    assert out.shape == x.shape


@pytest.mark.slow
def test_unet_feature_extractor(rng):
    x = jnp.asarray(rng.standard_normal((2, 128, 128, 3), dtype=np.float32))
    m = UNetFeatureExtractor()
    v = m.init(KEY, x, True)
    out, _ = m.apply(v, x, True, mutable=["batch_stats"])
    assert out["gwc_feature"].shape == (2, 32, 32, 160)
    assert out["concat_feature"].shape == (2, 32, 32, 12)

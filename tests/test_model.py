"""DCANet model family: init + forward shape contracts on tiny inputs.

maxdisp=32 and 64x96 crops keep CPU compile time sane; the structural
contracts (ladder lengths, resolutions) are scale-invariant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcanet_tpu.models import DCANet, GwcNetBaseline, make_model

B, H, W, MAXDISP = 1, 32, 64, 32


def _inputs(seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    left = jax.random.normal(k1, (B, H, W, 3), jnp.float32)
    right = jax.random.normal(k2, (B, H, W, 3), jnp.float32)
    return left, right


@pytest.mark.slow
def test_dcanet3_train_contract():
    model = DCANet(maxdisp=MAXDISP, num_cva=3)
    left, right = _inputs()
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    out, _ = model.apply(
        variables, left, right, train=True, mutable=["batch_stats"]
    )
    d4, h4, w4 = MAXDISP // 4, H // 4, W // 4
    assert len(out.prob_volumes) == 5
    for p in out.prob_volumes:
        assert p.shape == (B, d4, h4, w4)
        np.testing.assert_allclose(np.asarray(p.sum(axis=1)), 1.0, rtol=1e-4)
    assert len(out.disparities) == 2
    for d in out.disparities:
        assert d.shape == (B, H, W)
    assert len(out.class_logits) == 3
    for lg in out.class_logits:
        assert lg.shape == (B, d4 // 2, h4 // 2, w4 // 2)


@pytest.mark.slow
def test_dcanet3_eval_contract():
    model = DCANet(maxdisp=MAXDISP, num_cva=3)
    left, right = _inputs()
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    out = model.apply(variables, left, right, train=False)
    assert out.disparity.shape == (B, H, W)
    assert len(out.class_logits) == 3
    assert np.isfinite(np.asarray(out.disparity)).all()


@pytest.mark.slow
@pytest.mark.parametrize("num_cva,n_probs,n_disps", [(0, 1, 1), (1, 1, 2), (2, 3, 2)])
def test_dcanet_variants(num_cva, n_probs, n_disps):
    model = DCANet(maxdisp=MAXDISP, num_cva=num_cva)
    left, right = _inputs()
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    out, _ = model.apply(
        variables, left, right, train=True, mutable=["batch_stats"]
    )
    assert len(out.prob_volumes) == n_probs
    assert len(out.disparities) == n_disps
    assert out.disparities[-1].shape == (B, H, W)


@pytest.mark.slow
def test_dcanet4_fullres_supervision():
    model = DCANet(maxdisp=MAXDISP, num_cva=4, full_res_supervision=True)
    left, right = _inputs()
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    out, _ = model.apply(
        variables, left, right, train=True, mutable=["batch_stats"]
    )
    assert len(out.prob_volumes) == 0
    assert len(out.disparities) == 9  # 4 dca + 4 classif + final
    for d in out.disparities:
        assert d.shape == (B, H, W)


@pytest.mark.slow
def test_gwcnet_baseline():
    model = GwcNetBaseline(maxdisp=MAXDISP)
    left, right = _inputs()
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    out, _ = model.apply(
        variables, left, right, train=True, mutable=["batch_stats"]
    )
    assert len(out.disparities) == 4
    ev = model.apply(variables, left, right, train=False)
    assert ev.disparity.shape == (B, H, W)


def test_registry():
    for name in ["dcanet", "dcanet-cva0", "gwcnet-g"]:
        m = make_model(name, maxdisp=64)
        assert m.maxdisp == 64


def test_packed_dialect_fallback_warns(monkeypatch):
    """When the packed eval dialect WOULD run (bf16 + fold regime) but is
    disabled by D-sharding (constrain_volume) the model emits one warning
    naming the fallback (VERDICT r3 weak #5)."""
    import warnings

    monkeypatch.setenv("DCANET_PACKED_EVAL", "1")
    left, right = _inputs()
    model = DCANet(
        maxdisp=MAXDISP, num_cva=1, dtype=jnp.bfloat16,
        constrain_volume=lambda x: x,
    )
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    with pytest.warns(UserWarning, match="packed eval dialect disabled.*D-sharding"):
        model.apply(variables, left, right, train=False)

    # no constraint, even extents: packed path runs, no warning
    model2 = DCANet(maxdisp=MAXDISP, num_cva=1, dtype=jnp.bfloat16)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        model2.apply(variables, left, right, train=False)

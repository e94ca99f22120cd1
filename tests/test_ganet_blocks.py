"""GANet-capability blocks: shapes + gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcanet_tpu.nn.ganet import LGABlock, SGABlock

KEY = jax.random.PRNGKey(0)


@pytest.mark.slow
def test_sga_block(rng):
    cost = jnp.asarray(rng.standard_normal((1, 6, 8, 10, 4), dtype=np.float32))
    gf = jnp.asarray(rng.standard_normal((1, 8, 10, 16), dtype=np.float32))
    m = SGABlock(hidden=8)
    v = m.init(KEY, cost, gf, True)
    out, _ = m.apply(v, cost, gf, True, mutable=["batch_stats"])
    assert out.shape == cost.shape
    assert np.isfinite(np.asarray(out)).all()

    def loss(params):
        o, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            cost, gf, True, mutable=["batch_stats"],
        )
        return jnp.sum(o * o)

    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(g))


@pytest.mark.slow
def test_ganet_stereo_model():
    """Full GANet-capability net: train/eval contracts + one optimizer step."""
    import optax

    from dcanet_tpu.models import GANetStereo
    from dcanet_tpu.train.loop import LossConfig, train_step
    from dcanet_tpu.train.state import create_train_state

    maxdisp, h, w = 32, 32, 64
    model = GANetStereo(maxdisp=maxdisp, num_sga=2, use_lga=True)
    k1, k2, kd = jax.random.split(jax.random.PRNGKey(0), 3)
    left = jax.random.normal(k1, (1, h, w, 3), jnp.float32)
    right = jax.random.normal(k2, (1, h, w, 3), jnp.float32)

    variables = model.init(KEY, left, right, train=True)
    out, _ = model.apply(variables, left, right, train=True, mutable=["batch_stats"])
    assert len(out.disparities) == 3  # one per SGA stage + final
    for d in out.disparities:
        assert d.shape == (1, h, w)
        assert np.isfinite(np.asarray(d)).all()
    ev = model.apply(variables, left, right, train=False)
    assert ev.disparity.shape == (1, h, w)

    batch = {
        "left": left,
        "right": right,
        "disparity": jax.random.uniform(kd, (1, h, w), jnp.float32, 1.0, maxdisp - 2.0),
    }
    state = create_train_state(model, KEY, left, right, optax.adam(1e-3))
    state, metrics = train_step(state, batch, LossConfig(max_disp=maxdisp, preset="smooth_l1"))
    assert np.isfinite(float(metrics["total"]))


@pytest.mark.slow
def test_lga_block(rng):
    cost = jnp.asarray(rng.standard_normal((1, 4, 8, 10, 2), dtype=np.float32))
    gf = jnp.asarray(rng.standard_normal((1, 8, 10, 16), dtype=np.float32))
    m = LGABlock(radius=1, hidden=8)
    v = m.init(KEY, cost, gf, True)
    out, _ = m.apply(v, cost, gf, True, mutable=["batch_stats"])
    assert out.shape == cost.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_ganet_eval_init_tree_matches_train_init():
    """ADVICE r1: aux classif_sga heads must exist in BOTH train- and
    eval-initialized variable trees (an eval-initialized checkpoint must be
    trainable)."""
    import jax

    from dcanet_tpu.models.ganet import GANetStereo

    maxdisp, h, w = 16, 16, 32
    model = GANetStereo(maxdisp=maxdisp, num_sga=2)
    left = jnp.zeros((1, h, w, 3), jnp.float32)
    v_train = model.init(KEY, left, left, train=True)
    v_eval = model.init(KEY, left, left, train=False)

    paths_t = set(jax.tree_util.tree_flatten_with_path(v_train["params"])[0][i][0]
                  for i in range(len(jax.tree.leaves(v_train["params"]))))
    paths_e = set(jax.tree_util.tree_flatten_with_path(v_eval["params"])[0][i][0]
                  for i in range(len(jax.tree.leaves(v_eval["params"]))))
    assert paths_t == paths_e
    assert any("classif_sga0" in str(p) for p in paths_e)


def test_my_normalize_matches_torch_reference(rng):
    """my_normalize == the reference MyNormalize forward (signed L1 with the
    sign-following 1e-6 guard), reproduced here in torch including the
    sequential in-place masked writes (modules/GANet.py:18-33)."""
    import torch

    from dcanet_tpu.nn.ganet import my_normalize

    x = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
    x[0, 0] = 0.0  # exercise the zero-norm branch

    xt = torch.from_numpy(x)
    norm = torch.sum(torch.abs(xt), -1)
    norm[norm <= 0] = norm[norm <= 0] - 1e-6
    norm[norm >= 0] = norm[norm >= 0] + 1e-6
    want = (xt / torch.unsqueeze(norm, -1)).numpy()

    got = np.asarray(my_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_sga_l1_normalize_option(rng):
    """SGABlock(normalize='l1') runs and differs from the softmax flavor on
    the same params (signed taps reach the scan)."""
    from dcanet_tpu.nn.ganet import SGABlock

    cost = jnp.asarray(rng.standard_normal((1, 4, 6, 8, 4)), jnp.float32)
    gfeat = jnp.asarray(rng.standard_normal((1, 6, 8, 16)), jnp.float32)
    m_soft = SGABlock()
    m_l1 = SGABlock(normalize="l1")
    v = m_soft.init(jax.random.PRNGKey(0), cost, gfeat, False)
    a = m_soft.apply(v, cost, gfeat, False)
    b = m_l1.apply(v, cost, gfeat, False)
    assert a.shape == b.shape == cost.shape
    assert np.isfinite(np.asarray(b)).all()
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4

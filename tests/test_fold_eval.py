"""Eval-mode BN folding: the folded-affine fast path (DCANET_FOLD_EVAL_BN)
must agree with the literal conv -> flax-BN eval path.

The fold rewrites BN(conv(x)) as conv(x; kernel*s) + b with the bias fused
into the conv epilogue (kernels/conv3d.py kd-fold docstring has the TPU
measurements). These tests run the folded and unfolded module graphs on the
same variables (the param/variable trees are byte-identical by construction)
and assert numerical agreement at bf16 tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _randomize_bn_stats(variables, rng):
    """Replace init-default BN stats/affine with nontrivial values so the
    fold actually has something to fold."""

    def visit(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("mean", "bias"):
            return jnp.asarray(rng.normal(0, 0.5, leaf.shape), leaf.dtype)
        if name == "var":
            return jnp.asarray(rng.uniform(0.3, 2.0, leaf.shape), leaf.dtype)
        if name == "scale" and leaf.ndim == 1:
            return jnp.asarray(rng.normal(1.0, 0.3, leaf.shape), leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, variables)


def test_kdfold_bias_matches_xla(rng):
    """conv3d_kdfold(bias=...) == native conv + bias (the bias is injected
    into the step-1 output's kd=1 block; must land exactly once per plane,
    including at D edges and under stride 2)."""
    import dcanet_tpu.kernels.conv3d as K

    b, d, h, w, c, co = 1, 6, 8, 12, 8, 8
    x = jnp.asarray(rng.standard_normal((b, d, h, w, c), dtype=np.float32))
    wt = jnp.asarray(rng.standard_normal((3, 3, 3, c, co), dtype=np.float32)) * 0.2
    bias = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))

    want = K.conv3d_xla(x, wt) + bias
    got = K.conv3d_kdfold(x, wt, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    want2 = jax.lax.conv_general_dilated(
        x, wt, (2, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + bias
    got2 = K.conv3d_kdfold(x, wt, strides=(2, 2, 2), bias=bias)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=1e-4, atol=1e-4)

    # tuple-parts input (channel-concat distribution) with bias
    got3 = K.conv3d_kdfold((x[..., :3], x[..., 3:]), wt, bias=bias)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want), rtol=1e-4, atol=1e-4)


def _fold_vs_unfold(module, inputs, rng, monkeypatch, tol=0.05):
    variables = module.init(jax.random.PRNGKey(0), *inputs, train=False)
    variables = _randomize_bn_stats(variables, rng)

    monkeypatch.setenv("DCANET_FOLD_EVAL_BN", "0")
    want = module.apply(variables, *inputs, train=False)
    monkeypatch.setenv("DCANET_FOLD_EVAL_BN", "1")
    got = module.apply(variables, *inputs, train=False)

    want, got = jax.tree.map(
        lambda a: np.asarray(a, np.float32), (want, got)
    )
    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        err = np.abs(w - g).max()
        scale = max(np.abs(w).max(), 1e-3)
        assert err / scale < tol, (err, scale)


def test_convbnact_fold_matches(rng, monkeypatch):
    from dcanet_tpu.nn.layers import ConvBNAct

    x = jnp.asarray(rng.standard_normal((1, 6, 8, 16, 8)), jnp.bfloat16)
    m = ConvBNAct(8, 3, 1, 1, dims=3, dtype=jnp.bfloat16)
    _fold_vs_unfold(m, (x,), rng, monkeypatch)


def test_multiaggregation_fold_matches(rng, monkeypatch):
    from dcanet_tpu.nn.aggregation import MultiAggregation

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16, 8)), jnp.bfloat16)
    m = MultiAggregation(8, dtype=jnp.bfloat16)
    _fold_vs_unfold(m, (x,), rng, monkeypatch)


def test_basicblock_fold_matches(rng, monkeypatch):
    from dcanet_tpu.nn.layers import BasicBlock

    x = jnp.asarray(rng.standard_normal((1, 16, 24, 8)), jnp.bfloat16)
    m = BasicBlock(16, strides=2, dtype=jnp.bfloat16)
    _fold_vs_unfold(m, (x,), rng, monkeypatch)


@pytest.mark.slow
def test_dcanet_eval_fold_matches(rng, monkeypatch):
    """Full model: folded vs literal eval forward on the same variables."""
    from dcanet_tpu.models import DCANet

    model = DCANet(maxdisp=32, num_cva=1, dtype=jnp.bfloat16)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    left = jax.random.normal(k1, (1, 32, 64, 3), jnp.float32)
    right = jax.random.normal(k2, (1, 32, 64, 3), jnp.float32)

    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    variables = _randomize_bn_stats(variables, rng)

    monkeypatch.setenv("DCANET_FOLD_EVAL_BN", "0")
    want = model.apply(variables, left, right, train=False)
    monkeypatch.setenv("DCANET_FOLD_EVAL_BN", "1")
    got = model.apply(variables, left, right, train=False)

    w = np.asarray(want.disparity, np.float32)
    g = np.asarray(got.disparity, np.float32)
    # disparities are in [0, 32); bf16 fold reassociation tolerance
    assert np.abs(w - g).mean() < 0.25, np.abs(w - g).mean()

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


def test_deconv2x_flat_matches_dilated(rng):
    """Subpixel flat transposed conv == lhs-dilated reference (k3 s2 p1 op1),
    including the folded affine, pre-relu packed residual, and post-relu
    packed add epilogues (kernels/deconv3d.py)."""
    from dcanet_tpu.kernels.deconv3d import (
        deconv2x_flat,
        interleave2x,
        pack2x_pointwise,
    )

    b, d8, h8, w8, ci, co = 1, 3, 4, 6, 8, 8
    y = jnp.asarray(rng.standard_normal((b, d8, h8, w8, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)), jnp.float32) * 0.2
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (co,)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
    xres = jnp.asarray(
        rng.standard_normal((b, 2 * d8, 2 * h8, 2 * w8, co)), jnp.float32
    )
    post = jnp.asarray(
        rng.standard_normal((b, 2 * d8, 2 * h8, 2 * w8, co)), jnp.float32
    )

    ref = jax.lax.conv_general_dilated(
        y, w * scale, (1, 1, 1), ((1, 2),) * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    ref = jax.nn.relu(ref + bias + xres) + post

    got = deconv2x_flat(
        y, w, scale=scale, bias=bias,
        packed_residual=pack2x_pointwise(xres),
        post_packed_add=pack2x_pointwise(post),
        relu=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    # pack2x round-trip: interleave(pack(x)) == x, and the pointwise+bias form
    wr = jnp.asarray(rng.standard_normal((co, co)), jnp.float32) * 0.3
    br = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
    packed = pack2x_pointwise(xres, wr, bias=br)
    got2 = interleave2x(packed.reshape(b, d8, h8, w8, 8 * co), co)
    ref2 = jnp.einsum("bdhwc,co->bdhwo", xres, wr) + br
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), rtol=1e-4, atol=1e-4)


def test_kdfold_residual_matches_xla(rng):
    """conv3d_kdfold(residual=...) == native conv + residual tensor."""
    import dcanet_tpu.kernels.conv3d as K

    b, d, h, w, c, co = 1, 6, 8, 12, 8, 8
    x = jnp.asarray(rng.standard_normal((b, d, h, w, c), dtype=np.float32))
    wt = jnp.asarray(rng.standard_normal((3, 3, 3, c, co), dtype=np.float32)) * 0.2
    r = jnp.asarray(rng.standard_normal((b, d, h, w, co), dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))

    want = K.conv3d_xla(x, wt) + bias + r
    got = K.conv3d_kdfold(x, wt, bias=bias, residual=r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_multiaggregation_subpixel_fold_matches(rng, monkeypatch):
    """The packed subpixel eval tail (forced on via DCANET_DECONV_SUBPIXEL)
    agrees with the literal deconv+BN+redir+relu(+post) path."""
    from dcanet_tpu.nn.aggregation import MultiAggregation

    monkeypatch.setenv("DCANET_DECONV_SUBPIXEL", "1")
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16, 8)), jnp.bfloat16)
    post = jnp.asarray(rng.standard_normal((1, 8, 8, 16, 8)), jnp.bfloat16)
    m = MultiAggregation(8, dtype=jnp.bfloat16)

    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    variables = _randomize_bn_stats(variables, rng)
    monkeypatch.setenv("DCANET_FOLD_EVAL_BN", "0")
    want = m.apply(variables, x, train=False, post_residual=post)
    monkeypatch.setenv("DCANET_FOLD_EVAL_BN", "1")
    got = m.apply(variables, x, train=False, post_residual=post)
    w, g = np.asarray(want, np.float32), np.asarray(got, np.float32)
    assert np.abs(w - g).max() / max(np.abs(w).max(), 1e-3) < 0.05

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


def test_packed_dialect_ops_match_plain(rng):
    """conv3d_s2_from_packed / avgpool2x_from_packed / packed_pointwise on a
    packed volume == the plain ops on the unpacked volume."""
    from dcanet_tpu.kernels.deconv3d import (
        avgpool2x_from_packed,
        conv3d_s2_from_packed,
        pack2x_pointwise,
        packed_pointwise,
        interleave2x,
    )

    b, d, h, wd, ci, co = 1, 6, 8, 12, 8, 16
    x = jnp.asarray(rng.standard_normal((b, d, h, wd, ci)), jnp.float32)
    zp = pack2x_pointwise(x)  # (b, d/2, h/2, w/2, 8ci)

    # stride-2 conv
    w = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)), jnp.float32) * 0.2
    bias = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, w, (2, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + bias
    got = conv3d_s2_from_packed(zp, w, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    # avgpool 3 s2 p1 count_include_pad
    want_p = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)],
    ) / 27.0
    got_p = avgpool2x_from_packed(zp)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p), rtol=1e-4, atol=1e-4)

    # packed pointwise == pack of pointwise
    wpt = jnp.asarray(rng.standard_normal((ci, co)), jnp.float32) * 0.3
    bpt = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
    want_m = pack2x_pointwise(x, wpt, bias=bpt)
    got_m = packed_pointwise(zp, wpt, bias=bpt)
    np.testing.assert_allclose(
        np.asarray(got_m), np.asarray(want_m), rtol=1e-4, atol=1e-4
    )

    # pack -> interleave round trip
    rt = interleave2x(zp, ci)
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x), rtol=1e-6, atol=1e-6)


def test_cva_packed_path_matches(rng, monkeypatch):
    """CVA(packed=True) on a packed volume == the plain CVA, same params."""
    from dcanet_tpu.kernels.deconv3d import interleave2x, pack2x_pointwise
    from dcanet_tpu.nn.cva import CVA

    monkeypatch.setenv("DCANET_FOLD_EVAL_BN", "1")
    c = 8
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16, c)), jnp.bfloat16)
    post = jnp.asarray(rng.standard_normal((1, 8, 8, 16, c)), jnp.bfloat16)
    m = CVA(c, dtype=jnp.bfloat16)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    variables = _randomize_bn_stats(variables, rng)

    lw, aw = m.apply(variables, x, train=False, post_residual=post)
    lp, ap = m.apply(
        variables, pack2x_pointwise(x), train=False,
        post_residual=pack2x_pointwise(post), packed=True,
    )
    ap = interleave2x(ap, c)
    for w, g in ((lw, lp), (aw, ap)):
        w = np.asarray(w, np.float32)
        g = np.asarray(g, np.float32)
        assert np.abs(w - g).max() / max(np.abs(w).max(), 1e-3) < 0.06


@pytest.mark.slow
def test_dcanet_packed_eval_matches(rng, monkeypatch):
    """Full model: packed-dialect eval chain vs the plain folded eval."""
    from dcanet_tpu.models import DCANet

    model = DCANet(maxdisp=32, num_cva=2, dtype=jnp.bfloat16)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    left = jax.random.normal(k1, (1, 32, 64, 3), jnp.float32)
    right = jax.random.normal(k2, (1, 32, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    variables = _randomize_bn_stats(variables, rng)

    monkeypatch.setenv("DCANET_FOLD_EVAL_BN", "1")
    monkeypatch.setenv("DCANET_PACKED_EVAL", "0")
    want = model.apply(variables, left, right, train=False)
    monkeypatch.setenv("DCANET_PACKED_EVAL", "1")
    got = model.apply(variables, left, right, train=False)

    w = np.asarray(want.disparity, np.float32)
    g = np.asarray(got.disparity, np.float32)
    # random-init logits make soft-argmin winner-take-all at some pixels, so
    # a few flip across any reassociation (measured: packed-vs-unfolded mean
    # diff 0.495 == plain-fold-vs-unfolded 0.492 — the packed chain adds NO
    # error beyond the established fold deviation). Assert on the bulk
    # (median) and on the logits, not the flip-dominated mean.
    assert np.median(np.abs(w - g)) < 0.1, np.median(np.abs(w - g))
    for a, b in zip(want.class_logits, got.class_logits):
        aa, bb = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.abs(aa - bb).max() / max(np.abs(aa).max(), 1e-3) < 0.06


@pytest.mark.slow
def test_eval_dialect_accuracy_on_trained_weights(monkeypatch):
    """bf16-folded and bf16-packed eval vs f32-unfolded eval on TRAINED
    weights (VERDICT r3 next #3): random weights give a near-uniform softmax
    whose soft-argmin is chaotic, so the drift of the eval fast paths is only
    meaningful after training. Overfits one synthetic pair to sub-pixel EPE
    (the r2 trainability fixture), then pins EPE drift of each eval dialect
    below the BASELINE.md golden-parity tolerance (0.05 px)."""
    import optax

    from dcanet_tpu.models import DCANet
    from dcanet_tpu.train.loop import LossConfig, eval_step, train_step
    from dcanet_tpu.train.state import create_train_state

    H, W, MAXDISP = 32, 64, 32
    gt_disp = 6.0
    key = jax.random.PRNGKey(42)
    base = jax.random.normal(key, (1, H, W // 8, 3), jnp.float32)
    left = jax.image.resize(base, (1, H, W, 3), "linear")
    right = jnp.roll(left, -int(gt_disp), axis=2)
    batch = {
        "left": left,
        "right": right,
        "disparity": jnp.full((1, H, W), gt_disp, jnp.float32),
    }

    # full 3-CVA chain so the packed dialect crosses every CVA boundary
    model = DCANet(maxdisp=MAXDISP, num_cva=3)
    state = create_train_state(model, key, left, right, optax.adam(1e-3))
    cfg = LossConfig(max_disp=MAXDISP, preset="sceneflow")
    epe = None
    for step in range(300):
        state, _ = train_step(state, batch, cfg)
        if step % 50 == 49:
            epe = float(eval_step(state, batch, cfg)["epe"])
            if epe < 0.5:
                break
    assert epe is not None and epe < 1.0, f"failed to overfit: EPE={epe}"

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def run(dtype, fold, packed):
        monkeypatch.setenv("DCANET_FOLD_EVAL_BN", "1" if fold else "0")
        monkeypatch.setenv("DCANET_PACKED_EVAL", "1" if packed else "0")
        m = DCANet(maxdisp=MAXDISP, num_cva=3, dtype=dtype)
        return np.asarray(
            m.apply(variables, left, right, train=False).disparity, np.float32
        )

    ref = run(None, fold=False, packed=False)  # f32 literal conv->BN path
    folded = run(jnp.bfloat16, fold=True, packed=False)
    packed = run(jnp.bfloat16, fold=True, packed=True)

    gt = np.asarray(batch["disparity"])
    epe_ref = np.abs(ref - gt).mean()
    for name, pred in (("bf16-folded", folded), ("bf16-packed", packed)):
        epe_v = np.abs(pred - gt).mean()
        drift_epe = abs(epe_v - epe_ref)
        drift_mean = np.abs(pred - ref).mean()
        assert drift_epe < 0.05, (
            f"{name}: EPE drift {drift_epe:.4f} px vs f32 (EPE {epe_ref:.4f} "
            f"-> {epe_v:.4f}) exceeds the 0.05 px golden tolerance"
        )
        assert drift_mean < 0.1, (
            f"{name}: mean |disp - disp_f32| = {drift_mean:.4f} px"
        )


def test_packed_train_bn_parity(monkeypatch, rng):
    """The TRAIN-mode packed tail (DCANET_PACKED_TRAIN_BN=1: parity-folded BN
    stats + packed redir/residual adds before the interleave) must match the
    default interleave-then-flax-BN path: outputs, gradients, and the updated
    running statistics."""
    from dcanet_tpu.nn.aggregation import MultiAggregation

    b, d, h, w, c = 2, 8, 6, 10, 8
    x = jnp.asarray(rng.standard_normal((b, d, h, w, c), dtype=np.float32))
    pr = jnp.asarray(rng.standard_normal((b, d, h, w, c), dtype=np.float32))
    m = MultiAggregation(channels=c)

    monkeypatch.setenv("DCANET_PACKED_TRAIN_BN", "0")
    variables = m.init(jax.random.PRNGKey(0), x, True)
    variables = _randomize_bn_stats(variables, rng)

    def run(knob):
        monkeypatch.setenv("DCANET_PACKED_TRAIN_BN", knob)
        out, mut = m.apply(
            variables, x, True, post_residual=pr, mutable=["batch_stats"]
        )
        return out, mut["batch_stats"]

    out0, bs0 = run("0")
    out1, bs1 = run("1")
    assert out1.shape == out0.shape
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), rtol=1e-4, atol=1e-4)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5
        ),
        bs1, bs0,
    )

    def loss(params, knob):
        monkeypatch.setenv("DCANET_PACKED_TRAIN_BN", knob)
        out, _ = m.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, True, post_residual=pr, mutable=["batch_stats"],
        )
        return jnp.sum(out * out)

    g0 = jax.grad(lambda p: loss(p, "0"))(variables["params"])
    g1 = jax.grad(lambda p: loss(p, "1"))(variables["params"])
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
        ),
        g1, g0,
    )

"""Train-step fixture on random tensors: loss finite + decreasing, grads
flow, BN stats update (SURVEY §4 test strategy, layer (c))."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dcanet_tpu.models import DCANet
from dcanet_tpu.train.loop import LossConfig, eval_step, train_step
from dcanet_tpu.train.state import create_train_state

MAXDISP = 32
B, H, W = 2, 32, 64


def _batch(key):
    kl, kr, kd = jax.random.split(key, 3)
    return {
        "left": jax.random.normal(kl, (B, H, W, 3), jnp.float32),
        "right": jax.random.normal(kr, (B, H, W, 3), jnp.float32),
        "disparity": jax.random.uniform(kd, (B, H, W), jnp.float32, 1.0, MAXDISP - 2.0),
    }


@pytest.mark.slow
def test_train_step_decreases_loss():
    model = DCANet(maxdisp=MAXDISP, num_cva=1)
    key = jax.random.PRNGKey(0)
    batch = _batch(key)
    state = create_train_state(
        model, key, batch["left"][:1], batch["right"][:1], optax.adam(1e-3)
    )
    cfg = LossConfig(max_disp=MAXDISP, preset="sceneflow")

    losses = []
    for _ in range(8):
        state, metrics = train_step(state, batch, cfg)
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8

    em = eval_step(state, batch, cfg)
    assert np.isfinite(float(em["epe"]))


@pytest.mark.slow
def test_bf16_training_tracks_f32():
    """bf16-compute training (f32 params/optimizer, the TPU production
    configuration) must track the f32 loss curve over synthetic steps —
    the acceptance check for running the train bench in bf16."""
    key = jax.random.PRNGKey(3)
    batch = _batch(key)
    cfg = LossConfig(max_disp=MAXDISP, preset="sceneflow")

    curves = {}
    for name, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        model = DCANet(maxdisp=MAXDISP, num_cva=1, dtype=dtype)
        state = create_train_state(
            model, key, batch["left"][:1], batch["right"][:1], optax.adam(1e-3)
        )
        losses = []
        for _ in range(20):
            state, metrics = train_step(state, batch, cfg)
            losses.append(float(metrics["total"]))
        curves[name] = np.asarray(losses)

    assert np.isfinite(curves["bf16"]).all()
    assert curves["bf16"][-1] < curves["bf16"][0]
    # mean relative gap between the curves stays small
    rel = np.abs(curves["bf16"] - curves["f32"]) / np.abs(curves["f32"])
    assert rel.mean() < 0.05, (rel.mean(), curves)


@pytest.mark.slow
def test_batch_stats_update():
    model = DCANet(maxdisp=MAXDISP, num_cva=0)
    key = jax.random.PRNGKey(1)
    batch = _batch(key)
    state = create_train_state(
        model, key, batch["left"][:1], batch["right"][:1], optax.adam(1e-3)
    )
    before = jax.tree.leaves(state.batch_stats)[0].copy()
    cfg = LossConfig(max_disp=MAXDISP, preset="smooth_l1")
    state, _ = train_step(state, batch, cfg)
    after = jax.tree.leaves(state.batch_stats)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


@pytest.mark.slow
def test_gwcnet_baseline_train_step():
    from dcanet_tpu.models import GwcNetBaseline

    model = GwcNetBaseline(maxdisp=MAXDISP)
    key = jax.random.PRNGKey(3)
    batch = _batch(key)
    state = create_train_state(
        model, key, batch["left"][:1], batch["right"][:1], optax.adam(1e-3)
    )
    cfg = LossConfig(
        max_disp=MAXDISP, preset="smooth_l1",
        disparity_weights=(0.5, 0.5, 0.7, 1.0),  # gwcnet ladder (gwcnet.py)
    )
    state, metrics = train_step(state, batch, cfg)
    assert np.isfinite(float(metrics["total"]))
    em = eval_step(state, batch, cfg)
    assert np.isfinite(float(em["epe"]))


@pytest.mark.slow
def test_kitti_preset_sparse_gt():
    model = DCANet(maxdisp=MAXDISP, num_cva=2)
    key = jax.random.PRNGKey(2)
    batch = _batch(key)
    # sparse gt: zero out most pixels like KITTI
    sparse = np.array(batch["disparity"])  # writable copy
    sparse[:, ::2] = 0.0
    batch["disparity"] = jnp.asarray(sparse)
    state = create_train_state(
        model, key, batch["left"][:1], batch["right"][:1], optax.adam(1e-3)
    )
    cfg = LossConfig(max_disp=MAXDISP, preset="kitti", sparse=True)
    state, metrics = train_step(state, batch, cfg)
    assert np.isfinite(float(metrics["total"]))


@pytest.mark.slow
def test_overfit_synthetic_pair_to_subpixel_epe():
    """Trainability proof (VERDICT r2 #7): overfit ONE fixed synthetic stereo
    pair — right image = left shifted by a constant disparity — until EPE is
    sub-pixel. Catches optimizer/BN/loss-scale bugs that a loss-decreases
    test cannot (a silently crippled optimizer still 'decreases')."""
    gt_disp = 6.0
    key = jax.random.PRNGKey(42)
    # smooth left image so the shifted right is well-correlated at 1/4 res
    base = jax.random.normal(key, (1, H, W // 8, 3), jnp.float32)
    left = jax.image.resize(base, (1, H, W, 3), "linear")
    right = jnp.roll(left, -int(gt_disp), axis=2)
    valid = jnp.ones((1, H, W), jnp.float32)
    batch = {
        "left": left,
        "right": right,
        "disparity": jnp.full((1, H, W), gt_disp, jnp.float32),
    }

    model = DCANet(maxdisp=MAXDISP, num_cva=1)
    state = create_train_state(
        model, key, left, right, optax.adam(1e-3)
    )
    cfg = LossConfig(max_disp=MAXDISP, preset="sceneflow")

    epe = None
    for step in range(300):
        state, metrics = train_step(state, batch, cfg)
        if step % 50 == 49:
            em = eval_step(state, batch, cfg)
            epe = float(em["epe"])
            if epe < 0.5:
                break
    assert epe is not None and np.isfinite(epe)
    assert epe < 1.0, f"failed to overfit: EPE={epe}"


def test_remat_matches_plain():
    """DCANet(remat=True) computes the same loss/grads as remat=False
    (jax.checkpoint changes memory, not math)."""
    model = DCANet(maxdisp=MAXDISP, num_cva=1)
    model_r = DCANet(maxdisp=MAXDISP, num_cva=1, remat=True)
    key = jax.random.PRNGKey(3)
    batch = _batch(key)
    cfg = LossConfig(max_disp=MAXDISP, preset="sceneflow")
    # train_step donates the state: build one per call
    state = create_train_state(
        model, key, batch["left"][:1], batch["right"][:1], optax.adam(1e-3)
    )
    _, m0 = train_step(state, batch, cfg)
    state2 = create_train_state(
        model, key, batch["left"][:1], batch["right"][:1], optax.adam(1e-3)
    )
    _, m1 = train_step(state2.replace(apply_fn=model_r.apply), batch, cfg)
    assert abs(float(m0["total"]) - float(m1["total"])) < 1e-4
    assert abs(float(m0["grad_norm"]) - float(m1["grad_norm"])) < 1e-3


@pytest.mark.slow
def test_ganet_overfit_synthetic_pair():
    """GANetStereo trainability proof (VERDICT r4 #7): the SGA scan
    recurrences (signed-L1 MyNormalize taps), LGA refinement, and the
    reference's custom-vjp robust losses (hand-written backwards,
    models/libs/GANet/functions/GANet.py:264-310) together drive EPE below
    1 px on one synthetic pair — end-to-end gradient flow through every
    GANet-specific op, not just a finite-loss smoke."""
    from dcanet_tpu.losses import ganet_loss, ganet_loss2
    from dcanet_tpu.models.ganet import GANetStereo

    gt_disp = 6.0
    key = jax.random.PRNGKey(7)
    base = jax.random.normal(key, (1, H, W // 8, 3), jnp.float32)
    left = jax.image.resize(base, (1, H, W, 3), "linear")
    right = jnp.roll(left, -int(gt_disp), axis=2)
    disp_gt = jnp.full((1, H, W), gt_disp, jnp.float32)
    mask = jnp.ones((1, H, W), jnp.float32)

    model = GANetStereo(
        maxdisp=MAXDISP, num_sga=1, sga_normalize="l1", use_gwc_volume=False
    )
    state = create_train_state(model, key, left, right, optax.adam(1e-3))

    @jax.jit
    def step(state):
        def loss_fn(params):
            out, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                left, right, train=True, mutable=["batch_stats"],
            )
            ds = out.disparities
            # GANet's graduated recipe: robust custom loss per aux head,
            # the sequential-masking MyLoss2 on the final disparity
            total = 0.0
            for est, w in zip(ds[:-1], (0.2, 0.6)):
                total = total + w * ganet_loss(est, disp_gt)
            total = total + ganet_loss2(ds[-1], disp_gt)
            return total, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads, new_batch_stats=new_stats), loss

    epe = None
    for i in range(300):
        state, loss = step(state)
        assert np.isfinite(float(loss)), (i, float(loss))
        if i % 50 == 49:
            out = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                left, right, train=False,
            )
            epe = float(
                jnp.sum(jnp.abs(out.disparity - disp_gt) * mask) / jnp.sum(mask)
            )
            if epe < 0.5:
                break
    assert epe is not None and np.isfinite(epe)
    assert epe < 1.0, f"failed to overfit: EPE={epe}"

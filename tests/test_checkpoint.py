"""Orbax checkpoint save/restore roundtrip of the full TrainState."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dcanet_tpu.models import DCANet
from dcanet_tpu.train.checkpoint import CheckpointManager, load_params_only, save_params_only
from dcanet_tpu.train.loop import LossConfig, train_step
from dcanet_tpu.train.state import create_train_state

MAXDISP = 32


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    key = jax.random.PRNGKey(0)
    kl, kr, kd = jax.random.split(key, 3)
    batch = {
        "left": jax.random.normal(kl, (1, 32, 64, 3), jnp.float32),
        "right": jax.random.normal(kr, (1, 32, 64, 3), jnp.float32),
        "disparity": jax.random.uniform(kd, (1, 32, 64), jnp.float32, 1.0, 30.0),
    }
    model = DCANet(maxdisp=MAXDISP, num_cva=0)

    def fresh():
        return create_train_state(
            model, key, batch["left"], batch["right"], optax.adam(1e-3)
        )

    state = fresh()
    cfg = LossConfig(max_disp=MAXDISP, preset="smooth_l1")
    state, _ = train_step(state, batch, cfg)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state)
    mgr.wait()
    assert mgr.latest_step() == 1

    restored = mgr.restore(fresh())
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()

    # weights-only export/load
    save_params_only(str(tmp_path / "weights"), state.params, state.batch_stats)
    loaded = load_params_only(str(tmp_path / "weights"))
    ref_leaf = jax.tree.leaves(state.params)[0]
    got_leaf = jax.tree.leaves(loaded["params"])[0]
    np.testing.assert_array_equal(np.asarray(ref_leaf), np.asarray(got_leaf))

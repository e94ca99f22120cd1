"""Train state: params + BN batch_stats + optimizer state, as one pytree.

Replaces the reference's stateful nn.Module + torch.optim.Adam
(main_dca.py:44-64) with a functional TrainState that Orbax can checkpoint
whole — fixing the reference's resume gap (it restored weights only;
optimizer state and epoch counter were lost, main_dca.py:249).
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import core, struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    apply_fn: Any = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
        )


def create_train_state(model, rng, sample_left, sample_right, tx) -> TrainState:
    """Initialize model variables and optimizer state."""
    variables = model.init(rng, sample_left, sample_right, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )

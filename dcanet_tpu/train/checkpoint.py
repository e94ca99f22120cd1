"""Orbax checkpointing of the FULL TrainState.

Fixes the reference's resume gap: it saved {'epoch','state_dict','train_loss'}
per epoch (main_dca.py:275-281) but restored weights only — optimizer state
and the epoch counter were lost (start_epoch hardcoded 0, main_dca.py:249).
Here params + batch_stats + optimizer state + step are one checkpointed tree.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from dcanet_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state: TrainState, step: Optional[int] = None, metrics: Optional[dict] = None):
        step = int(state.step) if step is None else step
        payload = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(payload),
            metrics=metrics,
        )
        return step

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure of `state` (template for sharding/dtype)."""
        step = self.latest_step() if step is None else step
        assert step is not None, "no checkpoint found"
        template = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )

    def close(self):
        self._mgr.close()


def save_params_only(path: str, params: Any, batch_stats: Any) -> None:
    """Lightweight weights-only export (inference deployment)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(path), {"params": params, "batch_stats": batch_stats}
    )
    ckptr.wait_until_finished()


def load_params_only(path: str, template: Optional[Any] = None):
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), template)
    return ckptr.restore(os.path.abspath(path))

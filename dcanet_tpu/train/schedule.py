"""Learning-rate schedules.

Parity with the reference's two schemes:
  * string-spec epoch decay "12,20,24,28:2" — divide the base LR by `gamma`
    at each listed epoch (util.py:89-107 / utils/experiment.py:91-109);
  * hardcoded piecewise 1e-3 / 1e-4 / 1e-5 at epochs 300 / 600
    (util.py:132-145, the KITTI fine-tune schedule).

Both are expressed as optax step-indexed schedules via `steps_per_epoch`.
"""

from __future__ import annotations

from typing import Sequence

import optax


def parse_lr_spec(spec: str):
    """'12,20,24,28:2' -> (epochs=[12,20,24,28], gamma=2.0)."""
    epochs_str, gamma_str = spec.split(":")
    epochs = [int(e) for e in epochs_str.split(",")]
    return epochs, float(gamma_str)


def epoch_decay_schedule(
    base_lr: float, spec: str, steps_per_epoch: int
) -> optax.Schedule:
    """The reference's `adjust_learning_rate` as an optax schedule."""
    epochs, gamma = parse_lr_spec(spec)
    boundaries_and_scales = {e * steps_per_epoch: 1.0 / gamma for e in epochs}
    return optax.piecewise_constant_schedule(base_lr, boundaries_and_scales)


def piecewise_lr_schedule(
    values: Sequence[float], boundaries_epochs: Sequence[int], steps_per_epoch: int
) -> optax.Schedule:
    """Explicit piecewise levels, e.g. ([1e-3,1e-4,1e-5], [300,600])."""
    assert len(values) == len(boundaries_epochs) + 1
    scales = {
        b * steps_per_epoch: values[i + 1] / values[i]
        for i, b in enumerate(boundaries_epochs)
    }
    return optax.piecewise_constant_schedule(values[0], scales)


def kitti_finetune_schedule(steps_per_epoch: int) -> optax.Schedule:
    """util.py:132-145: 1e-3 until epoch 300, 1e-4 until 600, then 1e-5."""
    return piecewise_lr_schedule([1e-3, 1e-4, 1e-5], [300, 600], steps_per_epoch)


def make_adam(lr_schedule) -> optax.GradientTransformation:
    """Adam(beta1=0.9, beta2=0.999), parity with main_dca.py:64."""
    return optax.adam(lr_schedule, b1=0.9, b2=0.999)

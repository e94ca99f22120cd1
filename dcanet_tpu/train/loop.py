"""Jitted train / eval steps.

Replaces the per-script torch loops (main_dca.py:122-141, train_kitti.py:
92-120, train_eth3d.py:89-105) with one configurable step. Loss presets
mirror each reference trainer:

  * sceneflow: focal(prob ladder, w=[0.5,0.7,1.0,1.2,1.5]) +
               smooth-L1(disparity ladder, w=[1.8,2.1])   (main_dca.py:132-133)
  * kitti:     5*focal(vol_0) + 10*focal(vol_1) + smooth-L1, sparse gt
               (train_kitti.py:110-113)
  * smooth_l1: smooth-L1 only (train_eth3d.py:97-99; Middlebury)

The step is a pure function jitted once; under a sharded batch it IS
data-parallel training (XLA inserts the gradient all-reduce over ICI).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from dcanet_tpu import losses
from dcanet_tpu.train.metrics import eval_metrics
from dcanet_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class LossConfig:
    max_disp: int = 192
    focal_coefficient: float = 5.0
    sparse: bool = False
    preset: str = "sceneflow"  # sceneflow | kitti | smooth_l1
    focal_weights: Optional[Tuple[float, ...]] = None
    disparity_weights: Optional[Tuple[float, ...]] = None


def compute_loss(out, disp_gt, mask, cfg: LossConfig):
    """Combine ladders per preset; returns (loss, dict of components)."""
    comps = {}
    total = 0.0
    if cfg.preset == "sceneflow":
        if out.prob_volumes:
            fl = losses.focal_loss_ladder(
                out.prob_volumes, disp_gt, cfg.max_disp, cfg.focal_coefficient,
                cfg.sparse, cfg.focal_weights,
            )
            comps["focal"] = fl
            total = total + fl
        sl = losses.model_loss(out.disparities, disp_gt, mask, cfg.disparity_weights)
        comps["smooth_l1"] = sl
        total = total + sl
    elif cfg.preset == "kitti":
        weights = cfg.focal_weights or (5.0, 10.0)
        vols = out.prob_volumes[: len(weights)]
        fl = 0.0
        for vol, w in zip(vols, weights):
            fl = fl + w * losses.stereo_focal_loss(
                vol, disp_gt, cfg.max_disp, cfg.focal_coefficient, sparse=True
            )
        comps["focal"] = fl
        sl = losses.model_loss(out.disparities, disp_gt, mask, cfg.disparity_weights)
        comps["smooth_l1"] = sl
        total = fl + sl
    elif cfg.preset == "smooth_l1":
        sl = losses.model_loss(out.disparities, disp_gt, mask, cfg.disparity_weights)
        comps["smooth_l1"] = sl
        total = sl
    else:
        raise ValueError(cfg.preset)
    comps["total"] = total
    return total, comps


def valid_mask(disp_gt: jnp.ndarray, max_disp: int) -> jnp.ndarray:
    """0 < gt < maxdisp (main_dca.py:127)."""
    return (disp_gt > 0.0) & (disp_gt < max_disp)


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_step(
    state: TrainState, batch: Dict[str, jnp.ndarray], cfg: LossConfig
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimization step. batch: left/right (B,H,W,3), disparity (B,H,W)."""
    disp_gt = batch["disparity"]
    mask = valid_mask(disp_gt, cfg.max_disp)

    def loss_fn(params):
        out, updates = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["left"], batch["right"], train=True,
            mutable=["batch_stats"],
        )
        loss, comps = compute_loss(out, disp_gt, mask, cfg)
        return loss, (updates["batch_stats"], comps, out.disparities[-1])

    grads, (new_stats, comps, disp_est) = jax.grad(loss_fn, has_aux=True)(
        state.params
    )
    new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
    metrics = dict(comps)
    # grad-norm scalar: the debug/observability hook the reference lacks
    # (SURVEY §5 race-detection row); pairs with config.debug_nans.
    metrics["grad_norm"] = optax.global_norm(grads)
    metrics["epe"] = jnp.sum(jnp.abs(disp_est - disp_gt) * mask) / jnp.maximum(
        jnp.sum(mask), 1.0
    )
    return new_state, metrics


@partial(jax.jit, static_argnames=("cfg",))
def eval_step(
    state: TrainState, batch: Dict[str, jnp.ndarray], cfg: LossConfig
) -> Dict[str, jnp.ndarray]:
    """Eval forward + standard metric dict (EPE/D1/>1,2,3px)."""
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["left"], batch["right"], train=False,
    )
    disp_gt = batch["disparity"]
    mask = valid_mask(disp_gt, cfg.max_disp)
    return eval_metrics(out.disparity, disp_gt, mask)

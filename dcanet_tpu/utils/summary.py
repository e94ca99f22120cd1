"""Model summary (the reference vendors a torchsummary clone,
models/lib/torchsummary.py; here flax's tabulate does the work)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def summarize(model, input_hw=(64, 128), train: bool = True, depth: int = 2) -> str:
    """Layer table + parameter counts for a stereo model taking (left, right)."""
    h, w = input_hw
    left = jnp.zeros((1, h, w, 3), jnp.float32)
    return model.tabulate(
        jax.random.PRNGKey(0), left, left, train=train,
        depth=depth, console_kwargs={"width": 120},
    )

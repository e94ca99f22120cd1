"""Multi-host initialization + cross-host utilities.

The reference is single-process (nn.DataParallel); its only distributed
artifact is an unused vendored DistributedSampler
(models/lib/utils/data/distributed.py:7-57). TPU-native multi-host:

  * `initialize()` — `jax.distributed.initialize` wrapper (coordinator from
    env or args); after it, `jax.devices()` spans all hosts and the same
    jit-SPMD train step scales across the pod slice.
  * per-host input sharding lives in data/loader.py (`shard_for_host`).
  * `sync_hosts()` — a psum barrier, useful around checkpoint save/restore.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX's multi-host runtime. No-op for single-process runs
    (num_processes absent/1)."""
    coordinator_address = coordinator_address or os.environ.get("DCANET_COORDINATOR")
    if num_processes is None:
        env = os.environ.get("DCANET_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("DCANET_PROCESS_ID")
        process_id = int(env) if env else None
    if not coordinator_address or not num_processes or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def sync_hosts() -> None:
    """Barrier across all processes (one tiny all-reduce)."""
    if jax.process_count() == 1:
        return
    x = jnp.ones((jax.local_device_count(),))
    y = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
    np.asarray(y)  # host fetch = barrier

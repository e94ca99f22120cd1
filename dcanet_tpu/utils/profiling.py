"""Tracing / profiling harness.

Replaces the reference's ad-hoc `time.time()` prints (my_img.py:97-103,
models/gwcnet_dca_g.py:211) with:
  * `trace()` — context manager around `jax.profiler` producing a TensorBoard
    trace directory (per-kernel device timings from XLA).
  * `StepTimer` — wall-clock step-time / pairs-per-sec counters for the train
    loop, tunnel-safe (measures dispatch-to-dispatch time; call `sync()` with
    a device scalar to close the async gap on remote backends).
  * `device_time()` — honest device timing on backends whose
    `block_until_ready` does not truly block (the axon TPU tunnel): chains n
    dependent dispatches and synchronizes once via a host fetch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn: Callable, *args, iters: int = 10, salt_arg: int = 0):
    """Amortized per-call device time of `fn(*args)` in seconds.

    `fn` must accept a scalar addition to its `salt_arg`-th argument (used to
    chain iterations into a serial dependency so one host fetch at the end
    covers all of them).
    """
    out = fn(*args)
    first = jax.tree.leaves(out)[0]
    _ = float(jnp.asarray(first).ravel()[0])  # warm + sync
    salt = jnp.asarray(0.0, first.dtype)
    t0 = time.perf_counter()
    for _ in range(iters):
        chained = list(args)
        chained[salt_arg] = chained[salt_arg] + salt
        out = fn(*chained)
        first = jax.tree.leaves(out)[0]
        salt = first.ravel()[0] * 1e-12
    _ = float(salt)
    return (time.perf_counter() - t0) / iters


class StepTimer:
    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1):
        self._steps += n

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0

    @property
    def pairs_per_sec(self) -> float:
        return self.steps_per_sec * self.batch_size

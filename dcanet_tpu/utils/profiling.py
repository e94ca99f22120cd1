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
    """Per-call device time of `fn(*args)` in seconds, robust to tunnel
    backends: the iteration loop runs INSIDE one jit dispatch (lax.scan with
    a serial data dependency through `salt_arg`), and per-dispatch overhead
    is removed by differencing two iteration counts.
    """

    # ONE compiled program with a *dynamic* trip count (fori_loop lowers to a
    # While whose bound is a runtime argument): both iteration counts reuse
    # the same executable. The previous two-scan form compiled the model
    # graph twice, which doubled cold-bench time past the driver's budget.
    @jax.jit
    def run(n, *a):
        def body(_, salt):
            chained = list(a)
            chained[salt_arg] = (
                chained[salt_arg] + salt.astype(chained[salt_arg].dtype)
            )
            out = fn(*chained)
            first = jax.tree.leaves(out)[0]
            # full reduction: reading ONE element would let XLA's
            # slice-narrowing DCE shrink the whole computation to a
            # receptive-field window (observed: a lone conv3d "ran" in
            # 0 ms). The sum's bandwidth cost is per-iteration but small
            # and identical across the two differenced iteration counts.
            return (jnp.sum(first) * 1e-12).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    lo, hi = max(1, iters // 4), iters
    n_lo, n_hi = jnp.int32(lo), jnp.int32(hi)
    _ = float(run(n_lo, *args))  # compile + warm
    _ = float(run(n_hi, *args))

    def timed(n):
        t0 = time.perf_counter()
        _ = float(run(n, *args))
        return time.perf_counter() - t0

    # tunnel round-trip time is noisy: take the min difference over trials
    # (min-of-diffs of mins is the standard noise-robust estimator here).
    t_lo = min(timed(n_lo) for _ in range(3))
    t_hi = min(timed(n_hi) for _ in range(3))
    return max(t_hi - t_lo, 1e-9) / (hi - lo)


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

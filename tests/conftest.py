"""Test configuration: run everything on a virtual 8-device CPU mesh.

The ambient environment pins JAX_PLATFORMS=axon (one real TPU) and
pre-imports jax via sitecustomize, so env vars alone are too late; the
backend is still uninitialized at conftest time, so `jax.config.update`
re-targets it to CPU before the first device query.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Device mesh construction and data-parallel sharding helpers.

The reference's only multi-device mechanism is single-process
`nn.DataParallel` + thread-queue SyncBN (models/lib/nn/modules/comm.py,
batchnorm.py). Here multi-chip execution is pure SPMD: a `(data, disp)` mesh,
batch sharded over `data` (gradient psum inserted by XLA over ICI), and the
cost-volume disparity axis optionally sharded over `disp` for full-resolution
pairs (see parallel/sharding.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DISP_AXIS = "disp"


def make_mesh(
    n_data: Optional[int] = None,
    n_disp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, disp) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        assert len(devices) % n_disp == 0, (len(devices), n_disp)
        n_data = len(devices) // n_disp
    n = n_data * n_disp
    assert n <= len(devices), (n_data, n_disp, len(devices))
    grid = np.asarray(devices[:n]).reshape(n_data, n_disp)
    return Mesh(grid, (DATA_AXIS, DISP_AXIS))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict with the leading axis sharded over `data`."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. TrainState arrays) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x, tree
    )

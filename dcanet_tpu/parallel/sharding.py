"""Disparity-axis (D) sharding of the 5-D cost volume.

The analog of sequence parallelism for stereo: for full-resolution
Middlebury/ETH3D pairs the (B, D, H, W, C) volume dominates memory, so its D
axis is sharded over the mesh's `disp` axis. Under jit-SPMD a
`with_sharding_constraint` at volume-producing points is enough: XLA's SPMD
partitioner inserts the halo exchanges for kernel-3 3D convolutions and the
two-pass psum reductions for softmax-over-D / soft-argmin automatically
(the hand-scheduled Pallas halo pipeline is a later optimization).

Usage:
    mesh = make_mesh(n_data=2, n_disp=4)
    model = DCANet(..., constrain_volume=make_disp_constraint(mesh))
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dcanet_tpu.parallel.mesh import DATA_AXIS, DISP_AXIS


def make_disp_constraint(mesh: Mesh) -> Callable:
    """Returns f(volume) pinning (B, D, H, W, C) to (data, disp, ...)."""

    n_disp = mesh.shape[DISP_AXIS]

    def constrain(x):
        # Pin only the D axis; the batch placement propagates from the input
        # sharding (constraining it here would break B=1 init traces).
        if x.ndim >= 2 and x.shape[1] % n_disp == 0:
            spec = P(None, DISP_AXIS, *([None] * (x.ndim - 2)))
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
        return x

    return constrain

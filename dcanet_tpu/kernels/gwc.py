"""Pallas TPU kernel: grouped-correlation cost volume.

Replaces the D-stage slice/pad/stack graph of `ops.cost_volume.
build_gwc_volume` (itself the XLA re-expression of the reference's Python
store-loop, models/submodule.py:157-167) with ONE kernel.

Design (v5e-tuned):
  grid = (B, H, D // DBLK). Each program reads one left row (W, C) and an
  8-aligned chunk (W + DBLK - 1, C) of the left-zero-padded right row, and
  emits a (DBLK, W, G) slab. Splitting D across the grid keeps the output
  block ~1.6 MB so Mosaic can double-buffer inside the 16 MB VMEM (the
  full-D block was 7.6 MB lane-padded -> serialized and ~450x slower).
  The input row blocks' index maps ignore the d-block index, so Pallas keeps
  them resident across consecutive d-blocks: each feature row is fetched from
  HBM exactly once.

  The per-group mean is a (C, G) block-diagonal matmul on the MXU. Measured
  on v5e at 96x312x320, D=48, G=40 (honest tunnel-synced timing):
    Precision.DEFAULT  4.2 ms  (max diff vs XLA op ~8e-3: bf16 product round)
    Precision.HIGHEST 67 ms    (bit-exact, 6-pass f32)
    XLA slice/stack op 7.7 ms  (re-reads each feature row D times)
  DEFAULT is the default (the volume feeds BN+convs; bf16-rounded products
  are inconsequential for training and shift EPE by <0.01px); pass
  precision=HIGHEST or use_pallas=False on the model for bit-parity runs.
  The occluded left margin is exactly zero via the zero pad.

Constraints: requires maxdisp % 8 == 0 (sublane alignment of the chunk
start); callers fall back to the XLA op otherwise (e.g. Middlebury
maxdisp=240 -> D=60).

Backward is custom_vjp with the XLA formulation (correlation grads are
themselves shifted correlations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DBLK = 8  # d-planes per program; multiple of 8 (f32 sublane alignment)


def supports_pallas(maxdisp: int) -> bool:
    return maxdisp % DBLK == 0 and maxdisp >= DBLK


def _gwc_kernel(
    left_ref, right_ref, out_ref, *, maxdisp: int, num_groups: int, precision
):
    # left_ref:  (1, 1, W, C)
    # right_ref: (1, 1, W + D - 1, C)   (first D-1 cols are zeros)
    # out_ref:   (1, DBLK, 1, W, G)
    w = left_ref.shape[2]
    c = left_ref.shape[3]
    cpg = c // num_groups

    l = left_ref[0, 0, :, :]  # (W, C)

    # Group-mean as a (C, G) matmul: M[ch, g] = 1/cpg if ch // cpg == g.
    # Keeps the reduction on the MXU and avoids reshaping the lane dim.
    ch_group = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cpg
    g_idx = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    m = jnp.where(ch_group == g_idx, 1.0 / cpg, 0.0).astype(l.dtype)

    dblk = pl.program_id(2)
    # chunk covers shifts d in [dblk*DBLK, (dblk+1)*DBLK); start is a multiple
    # of DBLK (8-aligned for f32), so the dynamic slice is provably aligned.
    start = pl.multiple_of((pl.num_programs(2) - 1 - dblk) * DBLK, DBLK)
    chunk = right_ref[0, 0, pl.ds(start, w + DBLK - 1), :]  # (W+DBLK-1, C)

    for j in range(DBLK):
        # d = dblk*DBLK + j; row r[w'] = right[w' - d] = chunk[DBLK-1-j + w']
        r = chunk[DBLK - 1 - j : DBLK - 1 - j + w, :]
        out_ref[0, j, 0, :, :] = jnp.dot(
            l * r, m,
            preferred_element_type=jnp.float32,
            precision=precision,
        ).astype(out_ref.dtype)


def _gwc_forward(left, right, maxdisp: int, num_groups: int, precision=None):
    b, h, w, c = left.shape
    assert c % num_groups == 0
    assert supports_pallas(maxdisp), (maxdisp, "use ops.build_gwc_volume")
    if precision is None:
        precision = jax.lax.Precision.DEFAULT
    # left-pad right with D-1 zero columns so shift-d is a contiguous slice;
    # one extra zero col keeps the chunk read (start + W + DBLK - 1) in bounds
    # for the d=0 block.
    right_padded = jnp.pad(right, ((0, 0), (0, 0), (maxdisp - 1, 1), (0, 0)))

    kernel = functools.partial(
        _gwc_kernel, maxdisp=maxdisp, num_groups=num_groups, precision=precision
    )
    wp = w + maxdisp  # padded width
    return pl.pallas_call(
        kernel,
        grid=(b, h, maxdisp // DBLK),
        in_specs=[
            pl.BlockSpec(
                (1, 1, w, c), lambda bi, hi, di: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, wp, c), lambda bi, hi, di: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, DBLK, 1, w, num_groups),
            lambda bi, hi, di: (bi, di, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, maxdisp, h, w, num_groups), left.dtype),
    )(left, right_padded)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def build_gwc_volume_pallas(left, right, maxdisp: int, num_groups: int):
    """Drop-in replacement for ops.build_gwc_volume (same layout/semantics):
    (B, H, W, C) x2 -> (B, D, H, W, G)."""
    return _gwc_forward(left, right, maxdisp, num_groups)


def _fwd(left, right, maxdisp, num_groups):
    return _gwc_forward(left, right, maxdisp, num_groups), (left, right)


def _bwd(maxdisp, num_groups, res, g):
    """Backward = the linear transposes of the XLA-vectorized volume builder
    (ops/cost_volume.build_gwc_volume). The correlation is bilinear, so for
    fixed `right` it is linear in `left` (and vice versa);
    jax.linear_transpose hands the cotangent to XLA's own transpose rules
    WITHOUT recomputing the forward. Measured at the train feature shape
    (2, 64, 128, 320, D=48): this form's fwd+bwd is 2.93 ms vs 5.12 ms for
    the r3 hand-vectorized diagonal-gather/einsum backward (kept in git
    history) — XLA's transpose HLO beats the explicit gather form."""
    from dcanet_tpu.ops.cost_volume import build_gwc_volume

    left, right = res
    (dl,) = jax.linear_transpose(
        lambda l: build_gwc_volume(l, right, maxdisp, num_groups), left
    )(g)
    (dr,) = jax.linear_transpose(
        lambda r: build_gwc_volume(left, r, maxdisp, num_groups), right
    )(g)
    return dl.astype(left.dtype), dr.astype(right.dtype)


build_gwc_volume_pallas.defvjp(_fwd, _bwd)

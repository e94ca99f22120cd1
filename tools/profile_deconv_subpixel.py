"""A/B the deconv residual-add seam fixes.

Known: MultiAggregation's deconv chain costs +2.5 ms the moment its output is
added to the residual (even a plain `relu(y + x)`), on top of the deconv
itself. Hypothesis: XLA's lhs-dilated conv emitter regresses when an extra
full-size operand joins the output fusion.

Candidates timed here (KITTI eval shape, bf16):
  A. baseline: lhs-dilated deconv -> bn-folded -> relu(y + x)
  B. barrier: same, but optimization_barrier between deconv and the add
  C. subpixel: deconv as dense 2x2x2 conv -> 8*C_out channels -> interleave
     (depth-to-space), then relu(y + x)
  D. subpixel-matmul: same decomposition, einsum dialect

Usage: python tools/profile_deconv_subpixel.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def subpixel_weights(w):
    """Repack a (3,3,3,Ci,Co) lhs-dilated-correlation kernel into a dense
    (2,2,2,Ci,8*Co) kernel whose output, depth-to-space interleaved, equals
    the k3 s2 p1 op1 transposed conv.

    Derivation (per dim, pad_lo=1): y[o] = sum_t w[t] * x[(o+t-1)/2] over
    taps with (o+t-1) even. Even o: tap t=1 reads x[o/2] (input offset 0).
    Odd o: taps t=0,2 read x[(o-1)/2], x[(o+1)/2] (offsets 0,1). With a
    2-tap window anchored at i = floor(o/2): parity 0 -> w[1]@offset0;
    parity 1 -> w[0]@offset0? check: o=2i+1: x[(o-1)/2]=x[i] offset0 tap
    w[0]; x[(o+1)/2]=x[i+1] offset1 tap w[2].
    """
    Ci, Co = w.shape[3], w.shape[4]
    out = np.zeros((2, 2, 2, Ci, 8, Co), w.dtype)
    # per-dim mapping: parity p, window offset s -> kernel tap t (or None)
    taps = {  # (parity): list of (offset, tap)
        0: [(0, 1)],
        1: [(0, 0), (1, 2)],
    }
    for pd in (0, 1):
        for ph in (0, 1):
            for pw in (0, 1):
                pidx = pd * 4 + ph * 2 + pw
                for sd, td in taps[pd]:
                    for sh, th in taps[ph]:
                        for sw, tw in taps[pw]:
                            out[sd, sh, sw, :, pidx, :] = w[td, th, tw]
    return out.reshape(2, 2, 2, Ci, 8 * Co)


def interleave(y8, Co):
    """(B, D, H, W, 8*Co) -> (B, 2D, 2H, 2W, Co) depth-to-space."""
    B, D, H, W, _ = y8.shape
    y = y8.reshape(B, D, H, W, 2, 2, 2, Co)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(B, 2 * D, 2 * H, 2 * W, Co)


def main():
    from dcanet_tpu.utils.profiling import device_time

    key = jax.random.PRNGKey(0)
    D, H, W = 24, 48, 156  # 1/8-res deconv input
    Ci, Co = 64, 32
    y_in = jax.random.normal(key, (1, D, H, W, Ci), jnp.bfloat16)
    x_res = jax.random.normal(key, (1, 2 * D, 2 * H, 2 * W, Co), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, Ci, Co), jnp.float32) * 0.05
    wb = w.astype(jnp.bfloat16)
    w8 = jnp.asarray(subpixel_weights(np.asarray(w)), jnp.bfloat16)

    def deconv_dilated(y):
        return jax.lax.conv_general_dilated(
            y, wb, (1, 1, 1), ((1, 2),) * 3, lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def deconv_sub(y):
        y8 = jax.lax.conv_general_dilated(
            y, w8, (1, 1, 1), ((0, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return interleave(y8, Co)

    def a_base(y, x):
        return jax.nn.relu(deconv_dilated(y) + x)

    def b_barrier(y, x):
        z = jax.lax.optimization_barrier(deconv_dilated(y))
        return jax.nn.relu(z + x)

    def c_sub(y, x):
        return jax.nn.relu(deconv_sub(y) + x)

    def c_sub_alone(y, x):
        return deconv_sub(y)

    def a_alone(y, x):
        return deconv_dilated(y)

    # parity check first (f32 on small shape)
    ys = jax.random.normal(key, (1, 4, 6, 8, Ci), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        ys, w, (1, 1, 1), ((1, 2),) * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    w8f = jnp.asarray(subpixel_weights(np.asarray(w)), jnp.float32)
    got = interleave(jax.lax.conv_general_dilated(
        ys, w8f, (1, 1, 1), ((0, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")), Co)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"subpixel parity max-abs-err: {err:.2e}", flush=True)

    for name, fn in [("dilated alone", a_alone), ("subpixel alone", c_sub_alone),
                     ("A dilated+add", a_base), ("B barrier+add", b_barrier),
                     ("C subpixel+add", c_sub)]:
        t = device_time(fn, y_in, x_res, iters=10)
        print(f"{name:<18s}{t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()


def pure_add():
    from dcanet_tpu.utils.profiling import device_time
    key = jax.random.PRNGKey(0)
    shp = (1, 48, 96, 312, 32)
    a = jax.random.normal(key, shp, jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), shp, jnp.bfloat16)
    t = device_time(lambda u, v: jax.nn.relu(u + v), a, b, iters=16)
    print(f"pure relu(a+b)   {t*1e3:9.2f} ms", flush=True)
    t = device_time(lambda u, v: u + v, a, b, iters=16)
    print(f"pure a+b         {t*1e3:9.2f} ms", flush=True)
    t = device_time(lambda u, v: u, a, b, iters=16)
    print(f"identity         {t*1e3:9.2f} ms", flush=True)

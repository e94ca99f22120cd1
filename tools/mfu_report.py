"""MFU ledger (VERDICT r4 #9): FLOP counts from XLA's compiled cost analysis
+ measured device times -> achieved TFLOPS / MFU per surface, written as the
table for MFU.md.

FLOPs come from `jit(fn).lower(args).compile().cost_analysis()['flops']` —
the compiler's own count for the optimized HLO (so algebraic rewrites, folded
BN, and the packed dialect are all reflected; wasted FLOPs in selection convs
COUNT, which is the honest accounting for MFU).

Peak: v5e ~394 TFLOPS bf16 (197 f32). Usage:
  python tools/mfu_report.py            # eval fwd @ 384x1248 + train @ b2
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK_BF16 = 394e12  # v5e


def flops_of(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def main():
    import optax

    from dcanet_tpu.models import DCANet
    from dcanet_tpu.train.loop import LossConfig, train_step
    from dcanet_tpu.train.state import create_train_state
    from dcanet_tpu.utils.profiling import device_time

    key = jax.random.PRNGKey(0)
    rows = []

    # ---- eval forward @ bench shape ----
    H, W, MAXD = 384, 1248, 192
    model = DCANet(maxdisp=MAXD, num_cva=3, dtype=jnp.bfloat16)
    small = jnp.zeros((1, 64, 256, 3), jnp.float32)
    variables = jax.jit(lambda k, l, r: model.init(k, l, r, train=False))(
        key, small, small
    )
    left = jax.random.normal(key, (1, H, W, 3), jnp.float32)

    def fwd(l, r):
        return model.apply(variables, l, r, train=False).disparity

    fe = flops_of(fwd, left, left)
    te = device_time(fwd, left, left, iters=6)
    rows.append(("eval fwd 384x1248 b1", fe, te))

    # ---- train step @ b2 256x512 ----
    b, h, w = 2, 256, 512
    batch = {
        "left": jax.random.normal(key, (b, h, w, 3), jnp.float32),
        "right": jax.random.normal(key, (b, h, w, 3), jnp.float32),
        "disparity": jax.random.uniform(key, (b, h, w), jnp.float32, 1.0, MAXD - 2.0),
    }
    state = create_train_state(
        model, key, batch["left"][:1], batch["right"][:1], optax.adam(1e-3)
    )
    cfg = LossConfig(max_disp=MAXD, preset="sceneflow")

    def step(l, r, d):
        _, m = train_step.__wrapped__(
            state, {"left": l, "right": r, "disparity": d}, cfg
        )
        return m["total"] + m["grad_norm"]

    ft = flops_of(step, batch["left"], batch["right"], batch["disparity"])
    tt = device_time(step, batch["left"], batch["right"], batch["disparity"], iters=6)
    rows.append(("train step b2 256x512", ft, tt))

    print(f"# measured {time.strftime('%Y-%m-%d')} on v5e (bf16 peak ~394 TFLOPS)")
    print(f"| surface | GFLOP | ms | TFLOPS | MFU |")
    print(f"|---|---|---|---|---|")
    for name, f, t in rows:
        tf = f / t / 1e12
        print(
            f"| {name} | {f/1e9:.1f} | {t*1e3:.1f} | {tf:.1f} | "
            f"{100*tf*1e12/PEAK_BF16:.1f}% |"
        )


if __name__ == "__main__":
    main()

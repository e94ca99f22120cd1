"""Per-stage fwd vs fwd+bwd train timings + batch sweep (VERDICT r2 #4).

Stages at the train shape (256x512 crops -> 1/4-res volume (D=48, 64x128)),
bf16 compute: feature extractor, dres chain, one CVA, full train step.
Then a batch sweep (2/4/8) of the full train step for pairs/sec/chip.

Usage: python tools/profile_train_stages.py [--sweep-only]
Recorded results live in TODO.md / BENCH_TRAIN.json.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dcanet_tpu.utils.profiling import device_time

B, H, W = 2, 256, 512
DT = jnp.bfloat16


def stage_timings():
    import optax

    from dcanet_tpu.models import DCANet
    from dcanet_tpu.nn.aggregation import MultiAggregation
    from dcanet_tpu.nn.cva import CVA
    from dcanet_tpu.nn.feature import FeatureExtractor
    from dcanet_tpu.nn.layers import ConvBN, ConvBNAct
    from flax import linen as nn

    key = jax.random.PRNGKey(0)

    def fwd_bwd(label, mod, x, extra=()):
        v = jax.jit(lambda k, xx: mod.init(k, xx, *extra, True))(
            key, x[(slice(None), slice(0, 8), slice(0, 8))]
            if x.ndim == 4
            else x[:, :8, :8, :16]
        )

        def f(xx):
            out, _ = mod.apply(v, xx, *extra, True, mutable=["batch_stats"])
            first = jax.tree.leaves(out)[0].astype(jnp.float32)
            return 0.5 * jnp.sum(first * first) * 1e-6

        tf = device_time(jax.jit(f), x, iters=8)
        tg = device_time(jax.jit(jax.grad(f)), x, iters=8)
        print(f"{label:<26s} fwd {tf*1e3:7.2f} ms   fwd+bwd {tg*1e3:7.2f} ms",
              flush=True)

    img = jax.random.normal(key, (2 * B, H, W, 3), jnp.float32)
    fwd_bwd("features (stacked pair)", FeatureExtractor(dtype=DT), img)

    class Dres(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            c0 = ConvBNAct(32, 3, 1, 1, dims=3, dtype=DT)(x, train)
            c0 = ConvBNAct(32, 3, 1, 1, dims=3, dtype=DT)(c0, train)
            y = ConvBNAct(32, 3, 1, 1, dims=3, dtype=DT)(c0, train)
            return ConvBN(32, 3, 1, 1, dims=3, dtype=DT)(y, train, residual=c0)

    vol = jax.random.normal(key, (B, 48, H // 4, W // 4, 64), DT)
    fwd_bwd("dres0+dres1 (on 64ch)", Dres(), vol)

    cvol = jax.random.normal(key, (B, 48, H // 4, W // 4, 32), DT)
    fwd_bwd("one CVA block", CVA(32, dtype=DT), cvol)
    fwd_bwd("MultiAggregation", MultiAggregation(32, dtype=DT), cvol)


def tail_timings():
    """The r4 'remainder ~25 ms' bucket, split (VERDICT r4 #1): propagation
    head (guidance-consuming mask conv + convex upsample at full res), the
    focal ladder, the smooth-L1 ladder's up8+soft-argmin leg, and the concat
    volume — each fwd and fwd+bwd."""
    from flax import linen as nn

    from dcanet_tpu import losses
    from dcanet_tpu.nn.guidance import Guidance
    from dcanet_tpu.nn.propagation import PropagationNet
    from dcanet_tpu.ops.cost_volume import build_concat_volume
    from dcanet_tpu.ops.regression import disparity_regression
    from dcanet_tpu.ops.upsample import resize_trilinear

    key = jax.random.PRNGKey(0)

    def fb(label, f, *args):
        tf = device_time(jax.jit(f), *args, iters=8)
        tg = device_time(
            jax.jit(
                lambda *a: sum(
                    jnp.sum(g.astype(jnp.float32) ** 2)
                    for g in jax.tree.leaves(jax.grad(f)(*a))
                )
            ),
            *args, iters=8,
        )
        print(f"{label:<28s} fwd {tf*1e3:7.2f} ms   fwd+bwd {tg*1e3:7.2f} ms",
              flush=True)

    gt = jax.random.uniform(key, (B, H, W), jnp.float32, 1.0, 190.0)
    mask = (gt > 0.0) & (gt < 192.0)

    vols = jnp.stack(
        [
            jax.nn.softmax(
                jax.random.normal(jax.random.PRNGKey(i), (B, 48, H // 4, W // 4)),
                axis=1,
            )
            for i in range(5)
        ]
    )  # stacked: device_time salts array args, not lists
    fb(
        "focal ladder x5 (1/4 res)",
        lambda vs: losses.focal_loss_ladder(list(vs), gt, 192),
        vols,
    )

    logits8 = jax.random.normal(key, (B, 24, H // 8, W // 8), jnp.float32)

    def disp_ladder(lg):
        p = jax.nn.softmax(resize_trilinear(lg, 8), axis=1)
        d = disparity_regression(p, 192)
        return losses.model_loss([d, d], gt, mask)

    fb("up8+softargmin+smoothL1", disp_ladder, logits8)

    class PropHead(nn.Module):
        @nn.compact
        def __call__(self, img, disp, train=True):
            g = Guidance(64, dtype=DT)(img, train)["g"]
            return PropagationNet(64, scale=4, dtype=DT)(g, disp, train)

    img = jax.random.normal(key, (B, H, W, 3), jnp.float32)
    disp4 = jax.random.uniform(key, (B, H // 4, W // 4), jnp.float32, 0.0, 48.0)
    ph = PropHead()
    pv = jax.jit(lambda k, i, d: ph.init(k, i, d, True))(key, img[:1], disp4[:1])

    def propf(i):
        out, _ = ph.apply(pv, i, disp4, True, mutable=["batch_stats"])
        return 1e-6 * jnp.sum(out.astype(jnp.float32) ** 2)

    fb("guidance+prop+convex-up", propf, img)

    feat = jax.random.normal(key, (2 * B, H // 4, W // 4, 12), DT)

    def cat(f):
        v = build_concat_volume(f[:B], f[B:], 48)
        return 1e-6 * jnp.sum(v.astype(jnp.float32) ** 2)

    fb("concat volume", cat, feat)


def sweep():
    import optax

    from dcanet_tpu.models import DCANet
    from dcanet_tpu.train.loop import LossConfig, train_step
    from dcanet_tpu.train.state import create_train_state

    cfg = LossConfig(max_disp=192, preset="sceneflow")
    for b in (2, 4, 8):
        key = jax.random.PRNGKey(0)
        model = DCANet(maxdisp=192, num_cva=3, dtype=DT)
        batch = {
            "left": jax.random.normal(key, (b, H, W, 3), jnp.float32),
            "right": jax.random.normal(key, (b, H, W, 3), jnp.float32),
            "disparity": jax.random.uniform(key, (b, H, W), jnp.float32, 1.0, 190.0),
        }
        try:
            state = create_train_state(
                model, key, batch["left"][:1], batch["right"][:1],
                optax.adam(1e-3),
            )
            # grad_norm keeps the backward live; the Adam update itself is
            # DCE'd (+~0.1 ms on 5M params) — same protocol as bench.py's
            # BENCH_TRAIN so numbers are comparable. (Summing every updated
            # param leaf instead costs 368 per-leaf reductions PER SCAN
            # ITERATION and inflated the step 3.3x — measured artifact.)
            def f(l):
                _, m = train_step(state, {**batch, "left": l}, cfg)
                return m["total"] + m["grad_norm"]

            t = device_time(jax.jit(f), batch["left"], iters=6)
            print(
                f"batch {b}: step {t*1e3:7.2f} ms  "
                f"{b/t:7.2f} pairs/sec/chip", flush=True,
            )
        except Exception as e:  # OOM etc.
            print(f"batch {b}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)


if __name__ == "__main__":
    if "--tail-only" in sys.argv:
        tail_timings()
    elif "--sweep-only" in sys.argv:
        sweep()
    else:
        stage_timings()
        tail_timings()
        sweep()

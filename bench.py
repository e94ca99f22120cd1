"""Benchmark: DCANet eval-forward throughput at the KITTI submission shape.

Mirrors the reference's measurement (my_img.py:89-111: per-image wall time on
384x1248 pads, maxdisp 192). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Timing notes for the axon TPU tunnel: `block_until_ready` does not actually
block and each dispatch costs seconds of round trip, so the iteration loop
runs INSIDE one jit (lax.scan with a serial data dependency), and dispatch
overhead is removed by differencing two iteration counts
(utils/profiling.device_time). This measures true device throughput.

`vs_baseline` compares against the first TPU measurement pinned in
BENCH_BASELINE.json (the reference repo publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: repeated bench/driver runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_dcanet")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W = 384, 1248
MAXDISP = 192
ITERS = int(os.environ.get("BENCH_ITERS", "10"))
BASELINE_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
)


def bench_train_step(dtype):
    """Training throughput at the reference's SceneFlow configuration
    (512x256 crop, main_dca.py:25-30; batch 2 fits one chip with headroom).
    bf16 compute / f32 params+optimizer. Written to BENCH_TRAIN.json; the
    headline JSON line below stays the eval metric."""
    import optax

    from dcanet_tpu.models import DCANet
    from dcanet_tpu.train.loop import LossConfig, train_step
    from dcanet_tpu.train.state import create_train_state
    from dcanet_tpu.utils.profiling import device_time

    b, h, w = 2, 256, 512
    model = DCANet(maxdisp=MAXDISP, num_cva=3, dtype=dtype)
    key = jax.random.PRNGKey(0)
    kl, kr, kd, ki = jax.random.split(key, 4)
    batch = {
        "left": jax.random.normal(kl, (b, h, w, 3), jnp.float32),
        "right": jax.random.normal(kr, (b, h, w, 3), jnp.float32),
        "disparity": jax.random.uniform(kd, (b, h, w), jnp.float32, 1.0, MAXDISP - 2.0),
    }
    state = create_train_state(
        model, ki, batch["left"][:1], batch["right"][:1], optax.adam(1e-3)
    )
    cfg = LossConfig(max_disp=MAXDISP, preset="sceneflow")

    # time the full step (fwd+bwd+adam) WITHOUT donation (device_time reuses
    # the same args across iterations; salt chains through `left`)
    def step(left, right, disparity):
        _, metrics = train_step.__wrapped__(
            state, {"left": left, "right": right, "disparity": disparity}, cfg
        )
        return metrics["total"]

    t0 = time.perf_counter()
    dt = device_time(
        step, batch["left"], batch["right"], batch["disparity"], iters=6
    )
    pairs = b / dt
    print(
        f"# train_step: {dt*1e3:.1f} ms @ batch {b} ({pairs:.2f} pairs/sec/chip, "
        f"256x512, measure incl. compile: {time.perf_counter() - t0:.1f}s)",
        flush=True,
    )
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_TRAIN.json")
    with open(out, "w") as f:
        json.dump(
            {
                "metric": "dcanet_train_pairs_per_sec_256x512_b2",
                "value": round(pairs, 4),
                "unit": "pairs/sec/chip",
                "step_ms": round(dt * 1e3, 2),
            },
            f,
            indent=2,
        )


def main():
    from dcanet_tpu.models import DCANet

    # bf16 compute (f32 params, f32 soft-argmin) is the TPU-native inference
    # configuration: the cost-volume 3D convs run on the MXU's bf16 path.
    # Accuracy parity vs f32 must be validated on trained weights (random
    # weights give a near-uniform softmax whose soft-argmin is chaotic, so no
    # meaningful drift number exists pre-training). BENCH_DTYPE=f32 gives the
    # f32 run.
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else None
    model = DCANet(maxdisp=MAXDISP, num_cva=3, dtype=dtype)

    small = jnp.zeros((1, 64, 256, 3), jnp.float32)
    init = jax.jit(lambda k, l, r: model.init(k, l, r, train=False))
    t0 = time.perf_counter()
    variables = init(jax.random.PRNGKey(0), small, small)
    jax.tree.map(lambda x: x.block_until_ready(), variables)
    print(f"# init: {time.perf_counter() - t0:.1f}s", flush=True)

    from dcanet_tpu.utils.profiling import device_time

    def fwd(left, right):
        out = model.apply(variables, left, right, train=False)
        return out.disparity

    key = jax.random.PRNGKey(1)
    left = jax.random.normal(key, (1, H, W, 3), jnp.float32)
    right = jax.random.normal(key, (1, H, W, 3), jnp.float32)

    t0 = time.perf_counter()
    dt = device_time(fwd, left, right, iters=ITERS)
    print(
        f"# device/iter: {dt*1e3:.1f} ms (measure incl. compile: "
        f"{time.perf_counter() - t0:.1f}s)",
        flush=True,
    )
    pairs_per_sec = 1.0 / dt

    # Train-step throughput is measured separately (BENCH_TRAIN=1 python
    # bench.py): its first compile is ~10 min, too slow for the driver's
    # per-round run. The measured number is pinned in BENCH_TRAIN.json.
    if os.environ.get("BENCH_TRAIN", "0") == "1":
        bench_train_step(dtype)

    vs_baseline = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        if base.get("pairs_per_sec"):
            vs_baseline = pairs_per_sec / base["pairs_per_sec"]
    else:
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {
                    "pairs_per_sec": pairs_per_sec,
                    "shape": [H, W],
                    "note": "first TPU measurement (round 1); later rounds compare against this",
                },
                f,
                indent=2,
            )

    print(
        json.dumps(
            {
                "metric": f"dcanet_eval_pairs_per_sec_{H}x{W}",
                "value": round(pairs_per_sec, 4),
                "unit": "pairs/sec/chip",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Benchmark: DCANet eval-forward throughput at the KITTI submission shape.

Mirrors the reference's measurement (my_img.py:89-111: per-image wall time on
384x1248 pads, maxdisp 192). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Timing notes for the axon TPU tunnel: `block_until_ready` does not actually
block and each dispatch costs seconds of round trip, so the iteration loop
runs INSIDE one jit (dynamic-trip-count fori_loop with a serial data
dependency), and dispatch overhead is removed by differencing two iteration
counts (utils/profiling.device_time).

Driver-budget safety: the measurement runs in a child process under a time
budget (BENCH_BUDGET_S, default 240 s). The persistent compilation cache is
repo-local (`.jax_cache/`, pre-warmed by the builder session) so the normal
path measures fresh in well under the budget; if the cache was wiped and cold
compile cannot fit, the parent prints the last good committed measurement
(BENCH_LAST.json, marked "note": "cached") so the driver always gets a
parseable line.

`vs_baseline` compares against the first TPU measurement pinned in
BENCH_BASELINE.json (the reference repo publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))


def _git_sha() -> str:
    try:
        return subprocess.run(
            ["git", "-C", _HERE, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"



H, W = 384, 1248
MAXDISP = 192
BASELINE_FILE = os.path.join(_HERE, "BENCH_BASELINE.json")
LAST_FILE = os.path.join(_HERE, "BENCH_LAST.json")


def _measure():
    """Child-process body: the actual TPU measurement."""
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: repeated bench/driver runs skip
    # recompiles. Repo-local (NOT /tmp, which is wiped between sessions) so
    # the driver's end-of-round run hits the cache the builder pre-warmed.
    jax.config.update("jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dcanet_tpu.models import DCANet
    from dcanet_tpu.utils.profiling import device_time

    iters = int(os.environ.get("BENCH_ITERS", "6"))

    # bf16 compute (f32 params, f32 soft-argmin) is the TPU-native inference
    # configuration: the cost-volume 3D convs run on the MXU's bf16 path.
    # Accuracy vs f32 is pinned on trained weights by
    # tests/test_fold_eval.py::test_eval_dialect_accuracy_on_trained_weights.
    # BENCH_DTYPE=f32 gives the f32 run.
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else None
    model = DCANet(maxdisp=MAXDISP, num_cva=3, dtype=dtype)

    small = jnp.zeros((1, 64, 256, 3), jnp.float32)
    init = jax.jit(lambda k, l, r: model.init(k, l, r, train=False))
    t0 = time.perf_counter()
    variables = init(jax.random.PRNGKey(0), small, small)
    jax.tree.map(lambda x: x.block_until_ready(), variables)
    print(f"# init: {time.perf_counter() - t0:.1f}s", flush=True)

    def fwd(left, right):
        out = model.apply(variables, left, right, train=False)
        return out.disparity

    key = jax.random.PRNGKey(1)
    left = jax.random.normal(key, (1, H, W, 3), jnp.float32)
    right = jax.random.normal(key, (1, H, W, 3), jnp.float32)

    t0 = time.perf_counter()
    dt = device_time(fwd, left, right, iters=iters)
    print(
        f"# device/iter: {dt*1e3:.1f} ms (measure incl. compile: "
        f"{time.perf_counter() - t0:.1f}s)",
        flush=True,
    )
    pairs_per_sec = 1.0 / dt

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

    record = {
        "metric": f"dcanet_eval_pairs_per_sec_{H}x{W}",
        "value": round(pairs_per_sec, 4),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(vs_baseline, 4),
    }
    # stamp provenance into the pin so a cached-fallback consumer can tell a
    # stale measurement from a current one (ADVICE r4)
    stamped = dict(record, commit=_git_sha(), measured_at=time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()))
    with open(LAST_FILE, "w") as f:
        json.dump(stamped, f, indent=2)
    print(json.dumps(record), flush=True)

    # Train-step throughput is measured separately (BENCH_TRAIN=1 python
    # bench.py): its first compile is minutes, too slow for the driver's
    # per-round run. The measured number is pinned in BENCH_TRAIN.json.
    # Runs AFTER the headline JSON line so a timeout cannot eat it.
    if os.environ.get("BENCH_TRAIN", "0") == "1":
        bench_train_step(dtype)


def bench_train_step(dtype):
    """Training throughput at the reference's SceneFlow configuration
    (512x256 crop, main_dca.py:25-30; batch 2 fits one chip with headroom).
    bf16 compute / f32 params+optimizer. Written to BENCH_TRAIN.json; the
    headline JSON line stays the eval metric."""
    import jax
    import jax.numpy as jnp
    import optax

    from dcanet_tpu.models import DCANet
    from dcanet_tpu.train.loop import LossConfig, train_step
    from dcanet_tpu.train.state import create_train_state
    from dcanet_tpu.utils.profiling import device_time

    b, h, w = int(os.environ.get("BENCH_TRAIN_BATCH", "2")), 256, 512
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

    # time the full step WITHOUT donation (device_time reuses the same args
    # across iterations; salt chains through `left`). Returning ONLY the loss
    # let XLA DCE the whole backward — the r2/r3 pins (71.75 ms, 27.9
    # pairs/sec) were forward-only measurements. grad_norm keeps the
    # backward live (the Adam update itself is still DCE'd: +~0.1 ms on 5M
    # params, same protocol as tools/profile_train_stages.py).
    def step(left, right, disparity):
        _, metrics = train_step.__wrapped__(
            state, {"left": left, "right": right, "disparity": disparity}, cfg
        )
        return metrics["total"] + metrics["grad_norm"]

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
    out = os.path.join(_HERE, "BENCH_TRAIN.json")
    with open(out, "w") as f:
        json.dump(
            {
                "metric": f"dcanet_train_pairs_per_sec_256x512_b{b}",
                "value": round(pairs, 4),
                "unit": "pairs/sec/chip",
                "step_ms": round(dt * 1e3, 2),
                "commit": _git_sha(),
                "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "note": "fwd+bwd (grad_norm keeps backward live; Adam "
                "update DCE'd, +~0.1 ms). Pins before 2026-08-21 (71.75 ms "
                "/ 27.9 p/s) were forward-only: the step returned just the "
                "loss and XLA eliminated the backward.",
            },
            f,
            indent=2,
        )


def main():
    if os.environ.get("BENCH_INNER") == "1":
        _measure()
        return

    budget = float(os.environ.get("BENCH_BUDGET_S", "240"))
    env = dict(os.environ, BENCH_INNER="1")
    t_start = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env, timeout=budget
        )
        ok = proc.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok and os.path.exists(LAST_FILE) and os.path.getmtime(LAST_FILE) > t_start:
        # the headline eval measure SUCCEEDED (the child wrote a fresh pin
        # and printed its JSON line) before a later opt-in stage (e.g.
        # BENCH_TRAIN) failed — do not shadow the fresh line with a stale
        # cached reprint.
        ok = True
    if not ok and os.path.exists(LAST_FILE):
        # fresh measure missed the budget (cold compile cache): report the
        # last good committed measurement, honestly marked.
        with open(LAST_FILE) as f:
            record = json.load(f)
        record["note"] = (
            "cached (fresh measure exceeded BENCH_BUDGET_S; see BENCH_LAST.json; "
            f"pinned at commit {record.pop('commit', 'unknown')} "
            f"{record.pop('measured_at', '?')})"
        )
        print(json.dumps(record), flush=True)
    elif not ok:
        print(
            json.dumps(
                {
                    "metric": f"dcanet_eval_pairs_per_sec_{H}x{W}",
                    "value": None,
                    "unit": "pairs/sec/chip",
                    "vs_baseline": None,
                    "note": "measure failed and no cached record exists",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

"""2-process multi-host smoke: execute the REAL multi-host train path.

Each child process gets 4 virtual CPU devices
(--xla_force_host_platform_device_count=4) and joins a 2-process
jax.distributed cluster (8 global devices). One train step runs through the
exact cmd_train machinery — parallel.distributed.initialize, Loader with
shard_for_host (per-host index sharding), device_prefetch with
jax.make_array_from_process_local_data (global batch assembly), replicate()
of the TrainState onto the global mesh, and the jitted train_step on a
(data=8, disp=1) mesh. A third run with num_processes=1 (4 devices, same
global batch) is the reference; losses must agree.

The reference repo has no multi-host analog at all (its DistributedSampler,
models/lib/utils/data/distributed.py:7-57, is vendored dead code); this is
the §2.9 "multi-host init + comm backend" row executed for real.

Usage:
  python tools/multihost_smoke.py            # parent: spawns the runs
  python tools/multihost_smoke.py --child I N PORT OUT   # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_SAMPLES = 8
GLOBAL_BATCH = 8
H, W, MAXDISP = 32, 64, 32


class SynthDataset:
    """Deterministic per-index synthetic stereo samples."""

    def __len__(self):
        return N_SAMPLES

    def __getitem__(self, i):
        import numpy as np

        rng = np.random.default_rng(1000 + int(i))
        return {
            "left": rng.standard_normal((H, W, 3)).astype(np.float32),
            "right": rng.standard_normal((H, W, 3)).astype(np.float32),
            "disparity": (rng.random((H, W)) * (MAXDISP - 2) + 0.5).astype(
                np.float32
            ),
        }


def child(process_id: int, num_processes: int, port: int, out_path: str):
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from dcanet_tpu.data.loader import Loader, device_prefetch
    from dcanet_tpu.models import make_model
    from dcanet_tpu.parallel import make_mesh, replicate
    from dcanet_tpu.parallel.distributed import initialize, sync_hosts
    from dcanet_tpu.train.loop import LossConfig, train_step
    from dcanet_tpu.train.state import create_train_state

    os.environ["DCANET_COORDINATOR"] = f"localhost:{port}"
    os.environ["DCANET_NUM_PROCESSES"] = str(num_processes)
    os.environ["DCANET_PROCESS_ID"] = str(process_id)
    initialize()  # the cmd_train entry call (cli.py:100)

    assert jax.process_count() == num_processes, jax.process_count()
    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=n_dev, n_disp=1)

    import optax

    model = make_model("dcanet-cva0", maxdisp=MAXDISP)
    import jax.numpy as jnp

    sample = jnp.zeros((1, H, W, 3), jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), sample, sample, optax.adam(1e-3)
    )
    state = replicate(state, mesh)

    loader = Loader(
        SynthDataset(),
        batch_size=GLOBAL_BATCH // num_processes,
        seed=0,
        num_workers=2,
        drop_last=True,
        per_host=True,
    )
    loader.set_epoch(0)
    data_sharding = NamedSharding(mesh, P("data"))
    loss_cfg = LossConfig(max_disp=MAXDISP, preset="smooth_l1")

    with jax.sharding.set_mesh(mesh):
        batch = next(iter(device_prefetch(loader, sharding=data_sharding)))
        assert batch["left"].shape[0] == GLOBAL_BATCH, batch["left"].shape
        state, metrics = train_step(state, batch, loss_cfg)
        loss = float(metrics["total"])
        epe = float(metrics["epe"])
        gnorm = float(metrics["grad_norm"])
    sync_hosts()

    with open(out_path, "w") as f:
        json.dump(
            {
                "process_id": process_id,
                "num_processes": num_processes,
                "devices": n_dev,
                "loss": loss,
                "epe": epe,
                "grad_norm": gnorm,
            },
            f,
        )
    print(f"child {process_id}/{num_processes}: loss={loss:.6f} epe={epe:.4f}")


def _spawn(args, extra_env):
    env = dict(os.environ)
    env.update(extra_env)
    # drop any inherited device-count flag (e.g. the test conftest's =8)
    kept = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(
        kept + ["--xla_force_host_platform_device_count=4"]
    )
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", *map(str, args)],
        env=env,
        cwd=REPO,
    )


def main():
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    tmp = tempfile.mkdtemp(prefix="multihost_smoke_")
    outs = [os.path.join(tmp, f"p{i}.json") for i in range(2)]
    ref_out = os.path.join(tmp, "ref.json")

    procs = [_spawn((i, 2, port, outs[i]), {}) for i in range(2)]
    rcs = [p.wait(timeout=1200) for p in procs]
    assert rcs == [0, 0], rcs

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port2 = s.getsockname()[1]
    ref = _spawn((0, 1, port2, ref_out), {})
    assert ref.wait(timeout=1200) == 0

    results = []
    for p in outs + [ref_out]:
        with open(p) as f:
            results.append(json.load(f))
    l0, l1, lref = (r["loss"] for r in results)
    assert abs(l0 - l1) < 1e-6, (l0, l1)
    rel = abs(l0 - lref) / max(abs(lref), 1e-9)
    assert rel < 1e-4, (l0, lref, rel)
    print(
        f"multihost ok: 2-proc loss {l0:.6f} == 1-proc loss {lref:.6f} "
        f"(rel {rel:.2e}); grad_norm {results[0]['grad_norm']:.4f}"
    )
    return results


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
    else:
        main()

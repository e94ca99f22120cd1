"""One CLI replacing the reference's per-workload scripts:

  python -m dcanet_tpu.cli train --preset sceneflow --data-root ...
  python -m dcanet_tpu.cli eval  --preset kitti --data-root ... --ckpt ...
  python -m dcanet_tpu.cli infer --left a.png --right b.png --out disp.png
  python -m dcanet_tpu.cli export --ckpt ... --out weights/

train  ~ main_dca.py / train_kitti.py / train_eth3d.py (+ the uncommitted
         train_middlebury.py) via --preset.
eval   ~ the per-epoch `mytest` loops (EPE/D1/>1,2,3px + DCA class mPA/mIoU).
infer  ~ my_img.py benchmark-submission inference (uint16 PNG x256, timing).
export ~ weights-only checkpoint for deployment.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _build_dataset(cfg, training: bool):
    from dcanet_tpu.data import (
        StereoDataset,
        scan_eth3d,
        scan_kitti2012,
        scan_kitti2015,
        scan_middlebury,
        scan_sceneflow,
    )

    if cfg.dataset == "sceneflow":
        train, test = scan_sceneflow(cfg.data_root)
        return StereoDataset(train if training else test, training, "sceneflow")
    if cfg.dataset == "kitti2012":
        samples = scan_kitti2012(cfg.data_root)
    elif cfg.dataset == "kitti2015":
        samples = scan_kitti2015(cfg.data_root)
    elif cfg.dataset == "kitti_mix":
        samples = scan_kitti2012(cfg.data_root) + (
            scan_kitti2015(cfg.data_root2) if cfg.data_root2 else []
        )
    elif cfg.dataset == "eth3d":
        samples = scan_eth3d(cfg.data_root)
        return StereoDataset(samples, training, "eth3d")
    elif cfg.dataset == "middlebury":
        samples = scan_middlebury(cfg.data_root)
        return StereoDataset(samples, training, "middlebury", half_res=cfg.half_res)
    else:
        raise ValueError(cfg.dataset)
    return StereoDataset(samples, training, "kitti")


def _make_state(cfg, steps_per_epoch: int, mesh=None):
    import optax

    from dcanet_tpu.models import make_model
    from dcanet_tpu.train.schedule import (
        epoch_decay_schedule,
        kitti_finetune_schedule,
        make_adam,
    )
    from dcanet_tpu.train.state import create_train_state

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
    kw = {}
    if mesh is not None and mesh.shape.get("disp", 1) > 1:
        from dcanet_tpu.parallel import make_disp_constraint

        kw["constrain_volume"] = make_disp_constraint(mesh)
    if cfg.remat:
        kw["remat"] = True  # DCANet-family only (others reject it loudly)
    model = make_model(cfg.model, maxdisp=cfg.maxdisp, dtype=dtype, **kw)
    if cfg.lr_spec:
        sched = epoch_decay_schedule(cfg.base_lr, cfg.lr_spec, steps_per_epoch)
    else:
        sched = kitti_finetune_schedule(steps_per_epoch)
    tx = make_adam(sched)
    sample = jnp.zeros((1, 64, 4 * cfg.maxdisp, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(cfg.seed), sample, sample, tx)
    return model, state


def cmd_train(cfg):
    from dcanet_tpu.data.loader import Loader
    from dcanet_tpu.parallel import make_mesh, replicate
    from dcanet_tpu.parallel.distributed import initialize
    from dcanet_tpu.train.checkpoint import CheckpointManager
    from dcanet_tpu.train.loop import LossConfig, eval_step, train_step
    from dcanet_tpu.utils import AverageMeterDict, MetricLogger

    # Multi-chip SPMD: multi-host runtime init (no-op single-process), then a
    # (data, disp) mesh over all devices. The same jitted train_step runs
    # 1-chip and pod-slice; XLA inserts the gradient psum over ICI. This is
    # the end-to-end replacement for the reference's nn.DataParallel wrap
    # (main_dca.py:53-55).
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    initialize()
    n_avail = len(jax.devices()) // cfg.n_disp_shards
    if cfg.n_data_shards is not None:
        n_data = cfg.n_data_shards
        if cfg.batch_size % n_data != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by "
                f"n_data_shards {n_data}"
            )
    else:
        import math

        n_data = math.gcd(cfg.batch_size, n_avail)
        if n_data < n_avail:
            print(
                f"NOTE: using {n_data}/{n_avail} devices on the data axis "
                f"(largest divisor of batch_size {cfg.batch_size}); raise "
                f"--batch-size to use the full slice"
            )
    mesh = make_mesh(n_data=n_data, n_disp=cfg.n_disp_shards)

    train_ds = _build_dataset(cfg, training=True)
    print(f"train samples: {len(train_ds)}")
    loader = Loader(
        train_ds, cfg.batch_size, seed=cfg.seed, num_workers=cfg.num_workers
    )
    steps_per_epoch = max(len(loader), 1)
    model, state = _make_state(cfg, steps_per_epoch, mesh=mesh)
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(state.params))
    print(f"model params: {n_params / 1e6:.2f}M")
    print(f"mesh: data={n_data} disp={mesh.shape['disp']}")

    ckpt = CheckpointManager(cfg.logdir + "/ckpt")
    if cfg.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {int(state.step)}")
    elif cfg.loadckpt:
        # fine-tune init: pretrained params + BN stats, fresh optimizer/step
        from dcanet_tpu.train.checkpoint import load_params_only

        restored = load_params_only(
            cfg.loadckpt,
            {"params": state.params, "batch_stats": state.batch_stats},
        )
        state = state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )
        print(f"loaded pretrained weights from {cfg.loadckpt}")

    loss_cfg = LossConfig(
        max_disp=cfg.maxdisp,
        focal_coefficient=cfg.focal_coefficient,
        sparse=cfg.sparse_gt,
        preset=cfg.loss_preset,
    )
    logger = MetricLogger(cfg.logdir, use_tensorboard=cfg.use_tensorboard)
    meters = AverageMeterDict()

    from jax.sharding import NamedSharding, PartitionSpec

    from dcanet_tpu.data.loader import device_prefetch

    state = replicate(state, mesh)
    data_sharding = NamedSharding(mesh, PartitionSpec("data"))

    start_epoch = int(state.step) // steps_per_epoch
    with jax.sharding.set_mesh(mesh):
        for epoch in range(start_epoch, cfg.epochs):
            loader.set_epoch(epoch)
            t0 = time.time()
            pending = []  # device-side metric dicts; fetched only at print
            # time so per-step host syncs don't stall the dispatch pipeline
            for bi, batch in enumerate(
                device_prefetch(loader, sharding=data_sharding)
            ):
                state, metrics = train_step(state, batch, loss_cfg)
                pending.append(metrics)
                if (bi + 1) % cfg.print_freq == 0:
                    for p in pending:
                        meters.update({k: float(v) for k, v in p.items()})
                    pending = []
                    m = meters.mean()
                    rate = cfg.batch_size * (bi + 1) / (time.time() - t0)
                    print(
                        f"epoch {epoch} step {bi+1}/{steps_per_epoch} "
                        f"loss {m['total']:.3f} epe {m['epe']:.3f} "
                        f"({rate:.2f} pairs/s)"
                    )
                    logger.log(int(state.step), m, prefix="train/")
                    meters.reset()
            for p in pending:
                meters.update({k: float(v) for k, v in p.items()})
            if epoch >= cfg.save_after_epoch and (epoch + 1) % cfg.save_every_epochs == 0:
                ckpt.save(state)
    ckpt.wait()
    print("training done")


def _protocol_preset(cfg) -> str:
    """cfg.dataset -> eval-protocol family (data/eval_protocol.py)."""
    if cfg.dataset.startswith("kitti"):
        return "kitti"
    if cfg.dataset in ("eth3d", "middlebury", "sceneflow"):
        return cfg.dataset
    return "generic"


def _parse_vis_band(spec: str):
    """'lo:hi' (full-resolution disparity band, floats) -> (lo, hi).
    Validated ONCE at eval entry so a malformed flag fails fast instead of
    crashing mid-eval with an opaque unpack error."""
    parts = spec.split(":")
    try:
        if len(parts) != 2:
            raise ValueError
        lo, hi = float(parts[0]), float(parts[1])
    except ValueError:
        raise SystemExit(
            f"--vis-band must be 'lo:hi' with lo/hi full-resolution "
            f"disparities (e.g. '39:50'), got {spec!r}"
        )
    if not lo < hi:
        raise SystemExit(f"--vis-band needs lo < hi, got {spec!r}")
    return lo, hi


def cmd_eval(cfg, ckpt_path=None):
    from dcanet_tpu.data.eval_protocol import eval_transform
    from dcanet_tpu.train.checkpoint import CheckpointManager
    from dcanet_tpu.train.metrics import (
        disparity_class_confusion,
        per_image_metrics,
        segmentation_scores,
    )
    from dcanet_tpu.utils import AverageMeterDict

    from dcanet_tpu.utils import MetricLogger
    from dcanet_tpu.utils.visualization import disp_error_image

    ds = _build_dataset(cfg, training=False)
    print(f"eval samples: {len(ds)}")

    # Optional disparity-axis sharding for full-resolution pairs (the memory
    # bound case: ETH3D 768x1024 / Middlebury maxdisp 240): a (1, n_disp)
    # mesh + volume constraints; XLA SPMD inserts the halo exchanges.
    mesh = None
    if cfg.n_disp_shards > 1:
        from dcanet_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=1, n_disp=cfg.n_disp_shards)
        print(f"eval mesh: disp={cfg.n_disp_shards}")
    model, state = _make_state(cfg, steps_per_epoch=1, mesh=mesh)
    ckpt = CheckpointManager(ckpt_path or (cfg.logdir + "/ckpt"))
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"evaluating step {int(state.step)}")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    import contextlib

    mesh_ctx = jax.sharding.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
    fwd = jax.jit(lambda l, r: model.apply(variables, l, r, train=False))

    meters = AverageMeterDict()
    confusions = None  # one confusion matrix per DCA prob volume
    logger = MetricLogger(cfg.logdir, use_tensorboard=cfg.use_tensorboard)
    protocol = _protocol_preset(cfg)
    vis_band = _parse_vis_band(cfg.vis_band) if cfg.vis_band else None
    with mesh_ctx:
        for i in range(len(ds)):
            # reference test-time geometry per dataset (KITTI bottom-right
            # 1232x368 crop, ETH3D fixed 768x1024 pad, Middlebury /64
            # replicate buckets, SceneFlow pad-to-16) — one or few static
            # shapes per dataset, so `fwd` compiles O(1) times.
            left, right, gt, pads = eval_transform(ds[i], protocol)
            out = fwd(left[None], right[None])
            _eval_one(cfg, i, out, gt, left, pads, meters, logger, state, vis_band)
            if out.class_logits:
                # score EVERY DCA volume like the reference's metric_1/
                # metric_2 loop (main_dca.py:209-244), not just the last
                gt_model = (
                    np.pad(gt, [(pads[0], 0), (0, pads[1])])
                    if any(pads) else gt
                )
                if confusions is None:
                    confusions = [None] * len(out.class_logits)
                for vi, lg in enumerate(out.class_logits):
                    c = disparity_class_confusion(
                        lg, jnp.asarray(gt_model[None]), lg.shape[1]
                    )
                    confusions[vi] = c if confusions[vi] is None else confusions[vi] + c
    results = meters.mean()
    if confusions is not None:
        for vi, conf in enumerate(confusions):
            results.update(
                {
                    f"vol{vi + 1}/{k}": float(v)
                    for k, v in segmentation_scores(conf).items()
                }
            )
        # aggregate keys keep reporting the final volume (previous behavior)
        results.update(
            {k: float(v) for k, v in segmentation_scores(confusions[-1]).items()}
        )
    print({k: round(v, 4) for k, v in results.items()})
    return results


def _eval_one(cfg, i, out, gt, left, pads, meters, logger, state, vis_band=None):
    from dcanet_tpu.data.loader import unpad
    from dcanet_tpu.train.metrics import per_image_metrics
    from dcanet_tpu.utils.visualization import disp_error_image

    disp = unpad(np.asarray(out.disparity[0]), pads)
    if i < cfg.log_images:
        # input / est / gt / KITTI error-map panel (the reference's
        # save_images capability, utils/experiment.py:73-88)
        hi = max(float(gt.max()), 1.0)
        rgb = lambda g: np.repeat(np.clip(g / hi, 0, 1)[..., None], 3, -1)
        raw = unpad(left, pads)
        raw = (raw - raw.min()) / max(float(raw.max() - raw.min()), 1e-6)
        panel = np.concatenate(
            [raw, rgb(disp), rgb(gt), disp_error_image(disp, gt)], axis=0
        )
        logger.log_image(int(state.step), f"eval/sample{i}", panel)
        # disparity-band probability-mass heatmaps, one per DCA volume: the
        # generalized counterpart of the reference's vis_weight rebuttal hook
        # (gwcnet_dca_g.py:189-207 — fixed band 39:50, hard-coded image
        # crops). --vis-band lo:hi selects a full-res disparity band; default
        # is +-1 class around the per-pixel argmax (prob-mass sharpness).
        for vi, lg in enumerate(getattr(out, "class_logits", ()) or ()):
            prob = np.asarray(jax.nn.softmax(lg[0], axis=0), np.float32)
            dcls = np.arange(prob.shape[0])[:, None, None]
            if vis_band is not None:
                # class index -> full-res disparity scale, derived from this
                # volume's own class count (maxdisp/8 classes at the flagship's
                # 1/8-res CVA logits; stays correct for other logit resolutions)
                scale = cfg.maxdisp / prob.shape[0]
                lo, hi_d = vis_band
                band = (dcls >= lo / scale) & (dcls < hi_d / scale)
            else:
                band = np.abs(dcls - np.argmax(prob, axis=0)[None]) <= 1
            mass = (prob * band).sum(0)
            mass = mass / max(mass.max(), 1e-6)
            logger.log_image(
                int(state.step), f"eval/sample{i}_probmass_vol{vi + 1}",
                np.repeat(mass[..., None], 3, -1),
            )
    mask = (gt > 0) & (gt < cfg.maxdisp)
    # reference eval protocol: per-image metrics with the <10%-valid skip
    # (utils/metrics.py:22-41); skipped images contribute n=0.
    m = per_image_metrics(
        jnp.asarray(disp)[None], jnp.asarray(gt)[None], jnp.asarray(mask)[None]
    )
    n_valid = int(m.pop("n_valid_images"))
    if n_valid:
        meters.update({k: float(v) for k, v in m.items()}, n=n_valid)


def cmd_infer_list(cfg, data_path, list_path, save_path):
    """Batch-submission loop over a KITTI test list (my_img.py:113-131
    parity): each line names a file under image_2/ and image_3/; builds the
    model once, writes uint16 PNGs x256 under save_path, prints per-image and
    total wall time. The fixed 384x1248 transform keeps ONE compiled shape."""
    import os

    from dcanet_tpu.data.io import read_image, write_kitti_submission_png
    from dcanet_tpu.data.submission import (
        from_submission_shape,
        to_submission_shape,
        whiten_per_channel,
    )
    from dcanet_tpu.train.checkpoint import CheckpointManager

    with open(list_path) as f:
        names = [ln.strip() for ln in f if ln.strip()]
    os.makedirs(save_path, exist_ok=True)

    model, state = _make_state(cfg, steps_per_epoch=1)
    ckpt = CheckpointManager(cfg.logdir + "/ckpt")
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = jax.jit(lambda l, r: model.apply(variables, l, r, train=False).disparity)

    t0 = time.time()
    for name in names:
        lp, orig_hw = to_submission_shape(
            whiten_per_channel(read_image(os.path.join(data_path, "image_2", name)))
        )
        rp, _ = to_submission_shape(
            whiten_per_channel(read_image(os.path.join(data_path, "image_3", name)))
        )
        t1 = time.time()
        disp = np.asarray(fwd(lp[None].astype(np.float32), rp[None].astype(np.float32)))[0]
        print(f"{name}: {time.time() - t1:.4f} s")
        write_kitti_submission_png(
            os.path.join(save_path, name), from_submission_shape(disp, orig_hw)
        )
    print(f"full inference time = {time.time() - t0:.2f} seconds")


def cmd_infer(cfg, left_path, right_path, out_path, submission: bool = False):
    """Single-pair inference -> uint16 PNG x256.

    --submission reproduces the reference's benchmark-submission protocol
    (my_img.py:47-111): per-image per-channel whitening + fixed 384x1248
    pad/crop + per-image wall-time print. Default path uses the training
    normalization (ImageNet stats) and pad-to-16.
    """
    from dcanet_tpu.data.io import normalize_imagenet, read_image, write_kitti_submission_png
    from dcanet_tpu.data.loader import pad_to_multiple, unpad
    from dcanet_tpu.train.checkpoint import CheckpointManager

    model, state = _make_state(cfg, steps_per_epoch=1)
    ckpt = CheckpointManager(cfg.logdir + "/ckpt")
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = jax.jit(lambda l, r: model.apply(variables, l, r, train=False).disparity)

    if submission:
        from dcanet_tpu.data.submission import (
            from_submission_shape,
            to_submission_shape,
            whiten_per_channel,
        )

        left_p, orig_hw = to_submission_shape(whiten_per_channel(read_image(left_path)))
        right_p, _ = to_submission_shape(whiten_per_channel(read_image(right_path)))
        t0 = time.time()
        disp = np.asarray(
            fwd(left_p[None].astype(np.float32), right_p[None].astype(np.float32))
        )[0]
        # per-image timing print, my_img.py:103 protocol
        print(f"full inference time = {time.time() - t0:.4f} seconds")
        disp = from_submission_shape(disp, orig_hw)
    else:
        left = normalize_imagenet(read_image(left_path))
        right = normalize_imagenet(read_image(right_path))
        left_p, pads = pad_to_multiple(left, 16)
        right_p, _ = pad_to_multiple(right, 16)
        t0 = time.time()
        disp = fwd(left_p[None].astype(np.float32), right_p[None].astype(np.float32))
        disp = np.asarray(disp)[0]
        print(f"inference time: {time.time() - t0:.3f}s (incl. compile on first call)")
        disp = unpad(disp, pads)
    write_kitti_submission_png(out_path, disp)
    print(f"wrote {out_path}")


def cmd_export(cfg, out_path):
    from dcanet_tpu.train.checkpoint import CheckpointManager, save_params_only

    model, state = _make_state(cfg, steps_per_epoch=1)
    ckpt = CheckpointManager(cfg.logdir + "/ckpt")
    assert ckpt.latest_step() is not None, "no checkpoint to export"
    state = ckpt.restore(state)
    save_params_only(out_path, state.params, state.batch_stats)
    print(f"exported weights to {out_path}")


def main(argv=None):
    from dcanet_tpu.config import PRESETS, preset

    p = argparse.ArgumentParser(prog="dcanet_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    common = dict(
        preset=lambda sp: sp.add_argument(
            "--preset", default="sceneflow", choices=sorted(PRESETS)
        ),
    )

    def add_common(sp):
        common["preset"](sp)
        sp.add_argument("--data-root", default=None)
        sp.add_argument("--data-root2", default=None)
        sp.add_argument("--model", default=None)
        sp.add_argument("--maxdisp", type=int, default=None)
        sp.add_argument("--batch-size", type=int, default=None)
        sp.add_argument("--epochs", type=int, default=None)
        sp.add_argument("--logdir", default=None)
        sp.add_argument("--dtype", default=None)
        sp.add_argument("--resume", action="store_true", default=None)
        sp.add_argument(
            "--loadckpt", default=None,
            help="weights-only init for fine-tuning: a `cli export` file; "
            "params+BN stats are loaded, optimizer/step start fresh "
            "(reference train_kitti.py:63-66 --loadckpt semantics)",
        )
        sp.add_argument("--remat", action="store_true", default=None)
        sp.add_argument("--n-disp-shards", type=int, default=None)
        sp.add_argument("--n-data-shards", type=int, default=None)
        sp.add_argument("--log-images", type=int, default=None)
        sp.add_argument(
            "--vis-band", default=None,
            help="full-res disparity band 'lo:hi' for the per-volume "
            "probability-mass eval panels (vis_weight counterpart)",
        )

    sp_train = sub.add_parser("train")
    add_common(sp_train)
    sp_eval = sub.add_parser("eval")
    add_common(sp_eval)
    sp_eval.add_argument("--ckpt", default=None)
    sp_infer = sub.add_parser("infer")
    add_common(sp_infer)
    sp_infer.add_argument("--left")
    sp_infer.add_argument("--right")
    sp_infer.add_argument("--out")
    sp_infer.add_argument(
        "--submission", action="store_true",
        help="my_img.py protocol: per-channel whitening + 384x1248 pad/crop",
    )
    sp_infer.add_argument(
        "--list", dest="test_list",
        help="KITTI test list file: one image name per line, read from "
        "<data-root>/image_{2,3}/<name>, written to --save-path (my_img.py)",
    )
    sp_infer.add_argument("--save-path", default="./submission")
    sp_export = sub.add_parser("export")
    add_common(sp_export)
    sp_export.add_argument("--out", required=True)

    args = p.parse_args(argv)
    overrides = {
        k.replace("-", "_"): v
        for k, v in vars(args).items()
        if k not in (
            "cmd", "preset", "ckpt", "left", "right", "out", "submission",
            "test_list", "save_path",
        ) and v is not None
    }
    cfg = preset(args.preset, **overrides)

    if args.cmd == "train":
        cmd_train(cfg)
    elif args.cmd == "eval":
        cmd_eval(cfg, args.ckpt)
    elif args.cmd == "infer":
        if args.test_list:
            cmd_infer_list(cfg, cfg.data_root, args.test_list, args.save_path)
        else:
            assert args.left and args.right and args.out, "--left/--right/--out or --list"
            cmd_infer(cfg, args.left, args.right, args.out, submission=args.submission)
    elif args.cmd == "export":
        cmd_export(cfg, args.out)


if __name__ == "__main__":
    main()

"""KITTI fine-tune demo: the reference's pretrain->finetune workflow
(train_kitti.py) end-to-end through the CLI on KITTI-layout synthetic data.

  1. export weights-only from a SceneFlow-pretrained run (`cli export`)
  2. eval on held-out KITTI-2015-layout scenes BEFORE fine-tuning
  3. `cli train` on kitti_mix (2012+2015 roots, sparse GT, photometric +
     occlusion augmentation, 5x/10x focal preset, piecewise LR) initialized
     via --loadckpt (params + BN stats, fresh optimizer — the reference's
     --loadckpt semantics)
  4. eval AFTER; writes FINETUNE.json

Usage (after tools/gen_synthetic_sceneflow.py --layout kitti2012/kitti2015):
  python tools/finetune_kitti.py --pretrain /tmp/traincurve_run/ckpt \
      --k12 /tmp/synth_k12 --k15 /tmp/synth_k15 --val /tmp/synth_k15_val \
      --epochs 8 --batch 4 --out FINETUNE.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain", required=True, help="sceneflow run ckpt dir")
    ap.add_argument("--k12", required=True)
    ap.add_argument("--k15", required=True)
    ap.add_argument("--val", required=True, help="held-out kitti2015-layout root")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--logdir", default="/tmp/finetune_kitti_run")
    ap.add_argument("--out", default="FINETUNE.json")
    args = ap.parse_args()

    from dcanet_tpu import cli
    from dcanet_tpu.config import preset

    weights = os.path.join(args.logdir, "pretrained_export")
    cli.cmd_export(
        preset("sceneflow", dtype=args.dtype, logdir=os.path.dirname(
            os.path.abspath(args.pretrain))),
        weights,
    )

    def val_cfg():
        return preset(
            "kitti", dataset="kitti2015", data_root=args.val,
            dtype=args.dtype, logdir=args.logdir, batch_size=1,
        )

    def point(tag, ckpt_dir):
        t0 = time.time()
        r = cli.cmd_eval(val_cfg(), ckpt_dir)
        return {
            "tag": tag,
            "val_epe": float(r.get("epe", float("nan"))),
            "val_d1": float(r.get("d1", float("nan"))),
            "eval_s": round(time.time() - t0, 1),
        }

    curve = [point("pretrained (sceneflow weights, domain gap)", args.pretrain)]
    print("CURVE", json.dumps(curve[-1]), flush=True)

    t0 = time.time()
    cli.cmd_train(
        preset(
            "kitti", data_root=args.k12, data_root2=args.k15,
            batch_size=args.batch, dtype=args.dtype, logdir=args.logdir,
            epochs=args.epochs, loadckpt=weights, save_after_epoch=0,
            print_freq=20,
        )
    )
    print(f"finetune wall: {time.time() - t0:.0f}s", flush=True)

    curve.append(point(f"finetuned {args.epochs} epochs", args.logdir + "/ckpt"))
    print("CURVE", json.dumps(curve[-1]), flush=True)

    out = {
        "workflow": "sceneflow-pretrain -> kitti_mix finetune (--loadckpt)",
        "preset": "kitti (sparse gt, photometric+occlusion aug, 5x/10x focal)",
        "batch": args.batch,
        "curve": curve,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(curve))


if __name__ == "__main__":
    main()

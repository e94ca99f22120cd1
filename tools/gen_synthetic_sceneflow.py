"""Procedural textured-scene stereo generator (SceneFlow disk layout).

Real SceneFlow is not mountable in this environment, so the training-curve
evidence (the per-epoch train+eval capability of reference main_dca.py:122-141
and :283-335) runs on procedurally generated scenes with EXACT ground-truth
disparity — thousands of unique samples, NOT a one-pair overfit:

  * multi-octave value-noise textures (matchable local structure at several
    frequencies, random per-channel colorization);
  * layered fronto-parallel planes composed back-to-front in BOTH views in
    disparity order (nearer = larger disparity), so occlusion geometry is
    consistent: a foreground object hides different background columns in the
    two views exactly as real stereo does;
  * fractional disparities rendered by subpixel linear column interpolation
    (sub-pixel EPE is meaningful);
  * the background shifts with wraparound so the right view has no invalid
    band; foreground layers shift with zero-fill alpha.

Disk layout matches scan_sceneflow's flyingthings branch
(dcanet_tpu/data/datasets.py:81-92):
  <root>/frames_finalpass/{TRAIN,TEST}/A/<seq>/left/<n>.png   (+ right/)
  <root>/frames_disparity/{TRAIN,TEST}/A/<seq>/left/<n>.pfm

Usage: python tools/gen_synthetic_sceneflow.py --root /tmp/synth_sf \
          --train 1600 --test 40 [--height 320 --width 640] [--workers 16]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dcanet_tpu.data.io import write_pfm  # noqa: E402


def _resize_bilinear(a: np.ndarray, h: int, w: int) -> np.ndarray:
    gh, gw = a.shape[:2]
    ys = np.linspace(0, gh - 1, h, dtype=np.float32)
    xs = np.linspace(0, gw - 1, w, dtype=np.float32)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, gh - 1)
    x1 = np.minimum(x0 + 1, gw - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    top = a[y0][:, x0] * (1 - fx) + a[y0][:, x1] * fx
    bot = a[y1][:, x0] * (1 - fx) + a[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


def _value_noise(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Multi-octave value noise, (h, w, 3) in [0, 1]."""
    img = np.zeros((h, w, 3), np.float32)
    amp = 1.0
    for g in (4, 8, 16, 32, 64):
        grid = rng.random((g, g, 3), dtype=np.float32)
        img += amp * _resize_bilinear(grid, h, w)
        amp *= 0.55
    img -= img.min()
    img /= max(float(img.max()), 1e-6)
    # random colorization: channel mix keeps texture correlated across RGB
    mix = 0.5 * np.eye(3, dtype=np.float32) + 0.5 * rng.random(
        (3, 3), dtype=np.float32
    )
    img = np.clip(img @ mix.T, 0.0, 1.0)
    return img


def _shift_x(img: np.ndarray, d: float, wrap: bool) -> np.ndarray:
    """Sample img at (x + d) along axis 1 (right-view rendering, d >= 0)."""
    i0 = int(np.floor(d))
    f = np.float32(d - i0)
    if wrap:
        a = np.roll(img, -i0, axis=1)
        b = np.roll(img, -(i0 + 1), axis=1)
    else:
        pad = [(0, 0)] * img.ndim
        pad[1] = (0, i0 + 1)
        padded = np.pad(img, pad)
        a = padded[:, i0 : i0 + img.shape[1]]
        b = padded[:, i0 + 1 : i0 + 1 + img.shape[1]]
    return a * (1 - f) + b * f


def _shape_mask(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Rotated ellipse or rectangle mask, (h, w) float 0/1."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy = rng.uniform(0.1 * h, 0.9 * h)
    cx = rng.uniform(0.1 * w, 0.9 * w)
    ry = rng.uniform(0.06 * h, 0.28 * h)
    rx = rng.uniform(0.04 * w, 0.22 * w)
    th = rng.uniform(0, np.pi)
    u = (xx - cx) * np.cos(th) + (yy - cy) * np.sin(th)
    v = -(xx - cx) * np.sin(th) + (yy - cy) * np.cos(th)
    if rng.random() < 0.5:
        m = (u / rx) ** 2 + (v / ry) ** 2 <= 1.0
    else:
        m = (np.abs(u) <= rx) & (np.abs(v) <= ry)
    return m.astype(np.float32)


def make_scene(seed: int, h: int, w: int, dmin=4.0, dmax=88.0):
    """Returns (left_u8, right_u8, disp_f32) for one procedural scene."""
    rng = np.random.default_rng(seed)
    d_bg = float(rng.uniform(dmin, dmin + 18.0))
    left = _value_noise(rng, h, w)
    right = _shift_x(left, d_bg, wrap=True)
    disp = np.full((h, w), d_bg, np.float32)
    n_obj = int(rng.integers(4, 9))
    # back-to-front: compose in increasing disparity so nearer layers win
    for d in np.sort(rng.uniform(dmin + 6.0, dmax, n_obj)):
        d = float(d)
        tex = _value_noise(rng, h, w)
        mask = _shape_mask(rng, h, w)
        m3 = mask[..., None]
        rm = _shift_x(m3, d, wrap=False)
        rt = _shift_x(tex, d, wrap=False)
        left = np.where(m3 > 0.5, tex, left)
        right = np.where(rm > 0.5, rt, right)
        disp = np.where(mask > 0.5, d, disp)
    to_u8 = lambda x: (np.clip(x, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    return to_u8(left), to_u8(right), disp


def _write_sample(args):
    root, split, idx, h, w, seed, layout = args
    from PIL import Image

    left, right, disp = make_scene(seed, h, w)
    if layout in ("kitti2012", "kitti2015"):
        # KITTI disk layout (*_10 frames, uint16 x256 sparse GT). Sparsity
        # approximates the lidar GT: ~20% random dropout + the left-edge
        # band where the match is out of view.
        rng = np.random.default_rng(seed + 777)
        xs = np.arange(w)[None, :]
        valid = (rng.random(disp.shape) > 0.2) & (xs >= disp)
        enc = np.where(valid, np.clip(disp * 256.0, 1, 65535), 0).astype(np.uint16)
        name = f"{idx:06d}_10.png"
        dirs = (
            ("colored_0", "colored_1", "disp_occ")
            if layout == "kitti2012"
            else ("image_2", "image_3", "disp_occ_0")
        )
        for d in dirs:
            os.makedirs(os.path.join(root, d), exist_ok=True)
        Image.fromarray(left).save(os.path.join(root, dirs[0], name))
        Image.fromarray(right).save(os.path.join(root, dirs[1], name))
        Image.fromarray(enc).save(os.path.join(root, dirs[2], name))
        return
    seq = f"{idx // 100:04d}"
    name = f"{idx % 100:04d}"
    img_dir = os.path.join(root, "frames_finalpass", split, "A", seq)
    dsp_dir = os.path.join(root, "frames_disparity", split, "A", seq)
    for d in (
        os.path.join(img_dir, "left"),
        os.path.join(img_dir, "right"),
        os.path.join(dsp_dir, "left"),
    ):
        os.makedirs(d, exist_ok=True)
    Image.fromarray(left).save(os.path.join(img_dir, "left", name + ".png"))
    Image.fromarray(right).save(os.path.join(img_dir, "right", name + ".png"))
    write_pfm(os.path.join(dsp_dir, "left", name + ".pfm"), disp)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--train", type=int, default=1600)
    ap.add_argument("--test", type=int, default=40)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workers", type=int, default=16)
    ap.add_argument(
        "--layout", default="sceneflow",
        choices=("sceneflow", "kitti2012", "kitti2015"),
        help="disk layout; kitti layouts write *_10 frames with uint16 x256 "
        "SPARSE ground truth (--test is ignored: KITTI has no split here)",
    )
    a = ap.parse_args()

    jobs = [
        (a.root, "TRAIN", i, a.height, a.width, a.seed * 1_000_000 + i, a.layout)
        for i in range(a.train)
    ] + [
        (a.root, "TEST", i, a.height, a.width, a.seed * 1_000_000 + 500_000 + i, a.layout)
        for i in range(a.test if a.layout == "sceneflow" else 0)
    ]
    if a.workers > 1:
        from multiprocessing import Pool

        with Pool(a.workers) as pool:
            for n, _ in enumerate(pool.imap_unordered(_write_sample, jobs, 16)):
                if (n + 1) % 200 == 0:
                    print(f"{n + 1}/{len(jobs)}", flush=True)
    else:
        for j in jobs:
            _write_sample(j)
    n_test = a.test if a.layout == "sceneflow" else 0
    print(f"wrote {a.train} TRAIN + {n_test} TEST samples under {a.root}")


if __name__ == "__main__":
    main()

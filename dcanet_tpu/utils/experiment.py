"""Experiment utilities: meters + structured metric logging.

Parity: reference utils/experiment.py:112-151 (AverageMeter/AverageMeterDict)
plus a CSV/TensorBoard-compatible MetricLogger replacing the reference's
`print()`-everywhere observability (TensorBoard helpers existed but the
SummaryWriter was never instantiated in committed scripts — SURVEY §5).
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Dict, Optional


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class AverageMeterDict:
    def __init__(self):
        self.meters: Dict[str, AverageMeter] = {}

    def update(self, values: Dict[str, float], n: int = 1):
        for k, v in values.items():
            self.meters.setdefault(k, AverageMeter()).update(float(v), n)

    def mean(self) -> Dict[str, float]:
        return {k: m.avg for k, m in self.meters.items()}

    def reset(self):
        for m in self.meters.values():
            m.reset()


class MetricLogger:
    """Appends scalar dicts to JSONL + CSV; optional TensorBoard if available."""

    def __init__(self, logdir: str, use_tensorboard: bool = False):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._csv_path = os.path.join(logdir, "metrics.csv")
        self._csv_writer = None
        self._csv_file = None
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def log_image(self, step: int, tag: str, image) -> str:
        """Write an (H, W, 3) float [0,1] or uint8 image panel as a PNG under
        logdir/images (and to TensorBoard when enabled). Replaces the
        reference's save_images/make_grid TB helper
        (utils/experiment.py:73-88), which was never wired into a committed
        script. Returns the written path."""
        import numpy as np

        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
        imgdir = os.path.join(self.logdir, "images")
        os.makedirs(imgdir, exist_ok=True)
        path = os.path.join(imgdir, f"{tag.replace('/', '_')}_{step:08d}.png")
        from PIL import Image

        Image.fromarray(arr).save(path)
        if self._tb is not None:
            self._tb.add_image(tag, arr, step, dataformats="HWC")
        return path

    def log(self, step: int, scalars: Dict[str, float], prefix: str = ""):
        row = {"step": step, "time": time.time()}
        for k, v in scalars.items():
            row[(prefix + k) if prefix else k] = float(v)
        self._jsonl.write(json.dumps(row) + "\n")
        self._jsonl.flush()
        if self._csv_writer is None:
            self._csv_file = open(self._csv_path, "a", newline="")
            self._csv_writer = csv.DictWriter(self._csv_file, fieldnames=list(row))
            if self._csv_file.tell() == 0:
                self._csv_writer.writeheader()
        try:
            self._csv_writer.writerow(row)
            self._csv_file.flush()
        except ValueError:
            pass  # changed fieldnames; JSONL remains authoritative
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar((prefix + k) if prefix else k, float(v), step)

    def close(self):
        self._jsonl.close()
        if self._csv_file:
            self._csv_file.close()
        if self._tb is not None:
            self._tb.close()

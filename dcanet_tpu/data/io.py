"""Image / disparity IO.

Covers the reference's readers (dataloader/readpfm.py, dataloader/data_io.py:
193-230, datasets/data_io.py) with a spec-compliant PFM header parser (no
chardet sniffing) and the KITTI uint16x256 submission writer (my_img.py:
105-110).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Tuple, Union

import numpy as np

PathLike = Union[str, Path]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def read_pfm(path: PathLike) -> Tuple[np.ndarray, float]:
    """Spec-compliant PFM reader. Returns (data, scale); data is float32
    (H, W) or (H, W, 3), top row first (PFM stores bottom-up)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"not a PFM file: {path}")
        dims = f.readline()
        while dims.startswith(b"#"):  # comments permitted by spec
            dims = f.readline()
        m = re.match(rb"^\s*(\d+)\s+(\d+)\s*$", dims)
        if not m:
            raise ValueError(f"malformed PFM dims in {path}: {dims!r}")
        width, height = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.frombuffer(f.read(), endian + "f4")
    shape = (height, width, 3) if color else (height, width)
    data = data.reshape(shape)
    return np.ascontiguousarray(np.flipud(data)), abs(scale)


def write_pfm(path: PathLike, data: np.ndarray, scale: float = 1.0) -> None:
    data = np.asarray(data, np.float32)
    color = data.ndim == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        f.write(f"{-scale}\n".encode())  # little-endian
        np.flipud(data).astype("<f4").tofile(f)


def read_image(path: PathLike) -> np.ndarray:
    """RGB image as float32 (H, W, 3) in [0, 255]. Uses the native C++
    decoder (data/native.py) when built; PIL otherwise."""
    from dcanet_tpu.data import native

    if native.available():
        try:
            img = native.read_image_f32(str(path))
            if img.ndim == 3 and img.shape[-1] == 3 and img.max() <= 255.0:
                return img
        except OSError:
            pass
    from PIL import Image

    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"), np.float32)


def normalize_imagenet(img255: np.ndarray) -> np.ndarray:
    """[0,255] uint-range -> ImageNet-normalized float32 (the reference's
    ToTensor+Normalize, dataloader/data_io.py:11-12, 27-35)."""
    return (img255 / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def read_disparity(path: PathLike) -> np.ndarray:
    """Disparity as float32 (H, W). Dispatches on extension:
    .pfm -> PFM; .png -> uint16/256 KITTI convention (dataloader/
    datasets.py:308); inf values cleaned to 0 (Middlebury, datasets.py:459)."""
    path = str(path)
    from dcanet_tpu.data import native

    if native.available():
        try:
            disp = native.read_image_f32(path)
            if disp.ndim == 3:
                disp = disp[..., 0]
            if not path.endswith(".pfm") and disp.max() > 1024:
                disp = disp / 256.0  # uint16-encoded KITTI PNG
            return np.ascontiguousarray(
                np.where(np.isinf(disp), 0.0, disp), np.float32
            )
        except OSError:
            pass
    if path.endswith(".pfm"):
        disp, _ = read_pfm(path)
    else:
        from PIL import Image

        with Image.open(path) as img:
            disp = np.asarray(img, np.float32)
        if disp.max() > 1024:  # uint16-encoded
            disp = disp / 256.0
    disp = np.where(np.isinf(disp), 0.0, disp)
    return np.ascontiguousarray(disp, np.float32)


def write_kitti_submission_png(path: PathLike, disp: np.ndarray) -> None:
    """uint16 PNG x256, the KITTI benchmark server format (my_img.py:105-110)."""
    from PIL import Image

    enc = np.clip(disp * 256.0, 0, 65535).astype(np.uint16)
    Image.fromarray(enc).save(path)

"""Data layer: PFM round-trip, PNG disparity conventions, augmentation
semantics, scanner layouts, loader batching/sharding."""

import os

import numpy as np
import pytest

from dcanet_tpu.data import (
    Loader,
    StereoDataset,
    StereoSample,
    pad_to_multiple,
    read_disparity,
    read_pfm,
    scan_kitti2015,
    write_kitti_submission_png,
    write_pfm,
)
from dcanet_tpu.data.augment import adjust_contrast, occlusion_patch, photometric_pair
from dcanet_tpu.data.loader import shard_for_host, unpad


def test_pfm_roundtrip(tmp_path, rng):
    data = rng.standard_normal((7, 9), dtype=np.float32)
    p = tmp_path / "x.pfm"
    write_pfm(p, data)
    back, scale = read_pfm(p)
    np.testing.assert_array_equal(back, data)


def test_pfm_matches_torch_reference_layout(tmp_path):
    """Row 0 of the array must be the TOP image row (PFM stores bottom-up)."""
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = tmp_path / "y.pfm"
    write_pfm(p, data)
    back, _ = read_pfm(p)
    assert back[0, 0] == 0.0 and back[2, 3] == 11.0


def test_kitti_png_roundtrip(tmp_path, rng):
    disp = (rng.random((5, 6), dtype=np.float32) * 100).astype(np.float32)
    p = tmp_path / "d.png"
    write_kitti_submission_png(p, disp)
    back = read_disparity(p)
    np.testing.assert_allclose(back, disp, atol=1 / 256.0)


def test_adjust_contrast_properties(rng):
    """torchvision semantics: blend towards the grayscale mean
    (torchvision not installed here; verify the defining properties)."""
    img = (rng.random((8, 10, 3)) * 200 + 20).astype(np.float32)
    np.testing.assert_allclose(adjust_contrast(img, 1.0), img, rtol=1e-6)
    gray_mean = (
        img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    ).mean()
    np.testing.assert_allclose(adjust_contrast(img, 0.0), gray_mean, rtol=1e-5)
    # linear in factor between the two endpoints
    got = adjust_contrast(img, 0.5)
    np.testing.assert_allclose(got, 0.5 * img + 0.5 * gray_mean, rtol=1e-5)


def test_occlusion_patch_fills_mean(rng):
    g = np.random.default_rng(3)
    img = (np.random.default_rng(1).random((300, 400, 3)) * 255).astype(np.float32)
    out = occlusion_patch(img, g, prob=1.0)
    assert not np.allclose(out, img)
    # the filled region equals the per-channel image mean
    diff = np.any(out != img, axis=-1)
    filled = out[diff]
    want = np.broadcast_to(img.mean(axis=(0, 1)), filled.shape)
    np.testing.assert_allclose(filled, want, rtol=1e-5)


def _make_kitti_tree(tmp_path, n=4):
    from PIL import Image

    rng = np.random.default_rng(0)
    for sub in ["image_2", "image_3", "disp_occ_0"]:
        os.makedirs(tmp_path / sub, exist_ok=True)
    for i in range(n):
        name = f"{i:06d}_10.png"
        for sub in ["image_2", "image_3"]:
            arr = (rng.random((370, 1226, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / sub / name)
        disp = (rng.random((370, 1226)) * 80 * 256).astype(np.uint16)
        Image.fromarray(disp).save(tmp_path / "disp_occ_0" / name)
    return tmp_path


def test_kitti2015_scan_and_dataset(tmp_path):
    root = _make_kitti_tree(tmp_path)
    samples = scan_kitti2015(str(root))
    assert len(samples) == 4
    ds = StereoDataset(samples, training=True, preset="kitti")
    item = ds[0]
    assert item["left"].shape == (256, 512, 3)
    assert item["disparity"].shape == (256, 512)
    assert np.isfinite(item["left"]).all()


def test_loader_batching(tmp_path):
    root = _make_kitti_tree(tmp_path)
    ds = StereoDataset(scan_kitti2015(str(root)), training=True, preset="kitti")
    loader = Loader(ds, batch_size=2, num_workers=2, seed=1, per_host=False)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["left"].shape == (2, 256, 512, 3)


def test_shard_for_host_partitions():
    a = shard_for_host(10, process_index=0, process_count=2, shuffle=False)
    b = shard_for_host(10, process_index=1, process_count=2, shuffle=False)
    assert len(a) == len(b) == 5
    assert set(a.tolist()) | set(b.tolist()) == set(range(10))


def test_pad_unpad():
    img = np.ones((370, 1226, 3), np.float32)
    padded, pads = pad_to_multiple(img, 16)
    assert padded.shape[0] % 16 == 0 and padded.shape[1] % 16 == 0
    assert pads == (14, 6)
    disp = np.ones(padded.shape[:2], np.float32)
    out = unpad(disp, pads)
    assert out.shape == (370, 1226)
    rep, _ = pad_to_multiple(img, 16, mode="replicate")
    assert rep.shape == padded.shape

"""Native C++ IO (stereoio) vs PIL/numpy reference readers."""

import numpy as np
import pytest

from dcanet_tpu.data import native
from dcanet_tpu.data.io import IMAGENET_MEAN, IMAGENET_STD, write_pfm


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native stereoio not buildable here")
    return True


def test_native_pfm(lib_ok, tmp_path, rng):
    data = rng.standard_normal((7, 9), dtype=np.float32)
    p = tmp_path / "x.pfm"
    write_pfm(p, data)
    got = native.read_image_f32(str(p))
    np.testing.assert_array_equal(got, data)
    h, w, c, depth = native.image_info(str(p))
    assert (h, w, c, depth) == (7, 9, 1, 32)


def test_native_png8(lib_ok, tmp_path, rng):
    from PIL import Image

    arr = (rng.random((5, 6, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(arr).save(p)
    got = native.read_image_f32(str(p))
    np.testing.assert_array_equal(got, arr.astype(np.float32))


def test_native_png16(lib_ok, tmp_path, rng):
    from PIL import Image

    arr = (rng.random((5, 6)) * 60000).astype(np.uint16)
    p = tmp_path / "disp.png"
    Image.fromarray(arr).save(p)
    got = native.read_image_f32(str(p))
    np.testing.assert_array_equal(got, arr.astype(np.float32))


def test_native_normalize(lib_ok, rng):
    img = (rng.random((8, 10, 3)) * 255).astype(np.float32)
    got = native.normalize_imagenet(img)
    want = (img / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

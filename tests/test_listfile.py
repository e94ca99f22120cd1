"""List-file dataset catalog (the reference's alternate datasets/ package)."""

import numpy as np

from dcanet_tpu.data.listfile import __datasets__, read_list_file


def test_read_list_file(tmp_path):
    lst = tmp_path / "train.txt"
    lst.write_text(
        "a/l0.png a/r0.png a/d0.pfm\n"
        "b/l1.png b/r1.png\n"
        "\n"
    )
    samples = read_list_file(str(lst), "/data")
    assert len(samples) == 2
    assert samples[0].left == "/data/a/l0.png"
    assert samples[0].disparity == "/data/a/d0.pfm"
    assert samples[1].disparity is None


def test_registry(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for n in ["l.png", "r.png"]:
        Image.fromarray((rng.random((300, 520, 3)) * 255).astype(np.uint8)).save(
            tmp_path / n
        )
    disp = (rng.random((300, 520)) * 50 * 256).astype(np.uint16)
    Image.fromarray(disp).save(tmp_path / "d.png")
    lst = tmp_path / "list.txt"
    lst.write_text("l.png r.png d.png\n")
    ds = __datasets__["kitti"](str(lst), str(tmp_path), training=True)
    item = ds[0]
    assert item["left"].shape == (256, 512, 3)

"""List-file-driven dataset catalog (the reference's alternate `datasets/`
package: datasets/kitti_dataset.py, sceneflow_dataset.py, data_io.py —
GwcNet-original loaders reading `filenames/*.txt` lists of
"left right [disp]" triplets relative to a data root, with a `__datasets__`
registry)."""

from __future__ import annotations

import os
from typing import List

from dcanet_tpu.data.datasets import StereoDataset, StereoSample


def read_list_file(list_path: str, root: str) -> List[StereoSample]:
    """Each line: `left_rel right_rel [disp_rel]` (datasets/data_io.py:5-20)."""
    samples = []
    with open(list_path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            left = os.path.join(root, parts[0])
            right = os.path.join(root, parts[1])
            disp = os.path.join(root, parts[2]) if len(parts) > 2 else None
            samples.append(StereoSample(left=left, right=right, disparity=disp))
    return samples


def make_listfile_dataset(
    list_path: str, root: str, training: bool, preset: str = "sceneflow", **kw
) -> StereoDataset:
    return StereoDataset(read_list_file(list_path, root), training, preset, **kw)


# name registry, parity with datasets/__init__.py:4-7
__datasets__ = {
    "sceneflow": lambda list_path, root, training, **kw: make_listfile_dataset(
        list_path, root, training, "sceneflow", **kw
    ),
    "kitti": lambda list_path, root, training, **kw: make_listfile_dataset(
        list_path, root, training, "kitti", **kw
    ),
}

from dcanet_tpu.data.io import (
    read_disparity,
    read_image,
    read_pfm,
    write_kitti_submission_png,
    write_pfm,
)
from dcanet_tpu.data.datasets import (
    StereoDataset,
    StereoSample,
    scan_eth3d,
    scan_kitti2012,
    scan_kitti2015,
    scan_middlebury,
    scan_sceneflow,
)
from dcanet_tpu.data.loader import Loader, pad_to_multiple, shard_for_host

__all__ = [
    "read_disparity",
    "read_image",
    "read_pfm",
    "write_kitti_submission_png",
    "write_pfm",
    "StereoDataset",
    "StereoSample",
    "scan_eth3d",
    "scan_kitti2012",
    "scan_kitti2015",
    "scan_middlebury",
    "scan_sceneflow",
    "Loader",
    "pad_to_multiple",
    "shard_for_host",
]

from dcanet_tpu.ops.cost_volume import (
    build_concat_volume,
    build_gwc_volume,
    groupwise_correlation,
)
from dcanet_tpu.ops.regression import disparity_regression, softargmin_disparity
from dcanet_tpu.ops.slc import slc_pool
from dcanet_tpu.ops.upsample import (
    convex_upsample,
    resize_bilinear,
    resize_trilinear,
    unfold3x3,
)
from dcanet_tpu.ops.disp2prob import (
    gaussian_disp2prob,
    laplace_disp2prob,
    onehot_disp2prob,
)

__all__ = [
    "build_concat_volume",
    "build_gwc_volume",
    "groupwise_correlation",
    "disparity_regression",
    "softargmin_disparity",
    "slc_pool",
    "convex_upsample",
    "resize_bilinear",
    "resize_trilinear",
    "unfold3x3",
    "laplace_disp2prob",
    "gaussian_disp2prob",
    "onehot_disp2prob",
]

from dcanet_tpu.utils.experiment import AverageMeter, AverageMeterDict, MetricLogger
from dcanet_tpu.utils.visualization import disp_error_image, gen_error_colormap

__all__ = [
    "AverageMeter",
    "AverageMeterDict",
    "MetricLogger",
    "disp_error_image",
    "gen_error_colormap",
]

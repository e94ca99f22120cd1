from dcanet_tpu.models.dcanet import (
    DCANet,
    DCANetEvalOutput,
    DCANetTrainOutput,
    GwcNetBaseline,
)
from dcanet_tpu.models.ganet import GANetStereo
from dcanet_tpu.models.registry import MODELS, make_model

__all__ = [
    "DCANet",
    "DCANetEvalOutput",
    "DCANetTrainOutput",
    "GANetStereo",
    "GwcNetBaseline",
    "MODELS",
    "make_model",
]

from dcanet_tpu.nn.layers import (
    AvgPool3dTorch,
    BasicBlock,
    BasicConv,
    ConvBN,
    ConvBNAct,
    ResidualBlock,
    TorchConvTranspose,
    reference_conv_init,
)
from dcanet_tpu.nn.attention import DisparityAttentionBlock
from dcanet_tpu.nn.aggregation import Hourglass3D, MultiAggregation
from dcanet_tpu.nn.feature import FeatureExtractor
from dcanet_tpu.nn.guidance import Guidance
from dcanet_tpu.nn.propagation import PropagationNet
from dcanet_tpu.nn.cva import CVA, SemanticLevelContext

__all__ = [
    "AvgPool3dTorch",
    "BasicBlock",
    "BasicConv",
    "ConvBN",
    "ConvBNAct",
    "ResidualBlock",
    "TorchConvTranspose",
    "reference_conv_init",
    "DisparityAttentionBlock",
    "Hourglass3D",
    "MultiAggregation",
    "FeatureExtractor",
    "Guidance",
    "PropagationNet",
    "CVA",
    "SemanticLevelContext",
]

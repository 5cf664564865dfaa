from .mlp import MLP
from .encoders import (
    DiscardIthArg,
    MergeFlatInputs,
    RelativeSinusoidalEncodings,
    SinusoidalEncodings,
    discard_ith_arg,
    merge_flat_input,
)
from .attention import get_attender
from .selfattn import SelfAttention
from .probability import ProbabilityConverter, clamp
from .setconv import ExpRBF, MlpRBF, SetConv, UnsharedExpRBF
from .cnn import (
    CNN,
    AbsConv,
    ConvBlock,
    DepthSepConv,
    GaussianConv2d,
    ResConvBlock,
    ResNormalizedConvBlock,
    UnetCNN,
)

__all__ = [
    "MLP",
    "MergeFlatInputs",
    "DiscardIthArg",
    "merge_flat_input",
    "discard_ith_arg",
    "SinusoidalEncodings",
    "RelativeSinusoidalEncodings",
    "get_attender",
    "SelfAttention",
    "SetConv",
    "ProbabilityConverter",
    "clamp",
    "ExpRBF",
    "MlpRBF",
    "UnsharedExpRBF",
    "CNN",
    "UnetCNN",
    "AbsConv",
    "ConvBlock",
    "ResConvBlock",
    "ResNormalizedConvBlock",
    "DepthSepConv",
    "GaussianConv2d",
]

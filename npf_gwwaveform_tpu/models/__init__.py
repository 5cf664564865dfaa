from .base import NeuralProcessFamily
from .np import CNP, LNP
from .attnnp import AttnCNP, AttnLNP
from .convnp import ConvCNP, ConvLNP
from .gridconvnp import GridConvCNP, GridConvLNP

__all__ = [
    "NeuralProcessFamily",
    "CNP",
    "LNP",
    "AttnCNP",
    "AttnLNP",
    "ConvCNP",
    "ConvLNP",
    "GridConvCNP",
    "GridConvLNP",
]

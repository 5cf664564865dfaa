from . import helpers, init
from .helpers import (
    MaskedSet,
    logcumsumexp,
    masked_mean,
    masked_softmax,
    ratio_to_int,
    rescale_range,
    sum_from_nth_dim,
)

__all__ = [
    "helpers",
    "init",
    "MaskedSet",
    "logcumsumexp",
    "masked_mean",
    "masked_softmax",
    "ratio_to_int",
    "rescale_range",
    "sum_from_nth_dim",
]

from .gp import GPDataset, GPSampler, DatasetMerger, get_gp_datasets
from .datasplit import (
    CntxtTrgtSplitter,
    GetRandomIndcs,
    GridCntxtTrgtSplitter,
    get_all_indcs,
    get_range_indcs,
    half_masker,
    no_masker,
    RandomMasker,
)
from .gw import (
    GWParameterSpace,
    GWWaveformDataset,
    GWWaveformGenerator,
    match,
    mismatch,
)

__all__ = [
    "GPSampler",
    "GPDataset",
    "DatasetMerger",
    "get_gp_datasets",
    "CntxtTrgtSplitter",
    "GridCntxtTrgtSplitter",
    "GetRandomIndcs",
    "get_all_indcs",
    "get_range_indcs",
    "RandomMasker",
    "half_masker",
    "no_masker",
    "GWWaveformGenerator",
    "GWWaveformDataset",
    "GWParameterSpace",
    "match",
    "mismatch",
]

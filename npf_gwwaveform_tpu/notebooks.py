"""Notebook-glue helpers mirroring the reference's `utils/ntbks_helpers.py`:
dataset builders, fixed-context splitters, y-dim adaptation, pretty names,
and results aggregation (`load_all_results`, ref utils/helpers.py:22-32).
"""

from __future__ import annotations

import glob
import os
from typing import Dict

import numpy as np

from .data.datasplit import CntxtTrgtSplitter, GetRandomIndcs, get_all_indcs, get_range_indcs
from .data.gp import get_gp_datasets

__all__ = [
    "get_all_gp_datasets",
    "get_datasets_single_gp",
    "get_datasets_variable_hyp_gp",
    "get_datasets_variable_kernel_gp",
    "get_n_cntxt",
    "add_y_dim",
    "load_all_results",
    "PRETTY_RENAMER",
]

# display names (ref ntbks_helpers.py:217-258)
PRETTY_RENAMER = {
    "RBF_Kernel": "RBF Kernel",
    "Periodic_Kernel": "Periodic Kernel",
    "Noisy_Matern_Kernel": "Noisy Matern Kernel",
    "Matern_Kernel": "Matern Kernel",
    "Variable_Matern_Kernel": "Variable Matern Kernel",
    "All_Kernels": "All Kernels",
    "CNP": "CNP",
    "LNP": "LNP",
    "AttnCNP": "AttnCNP",
    "AttnLNP": "AttnLNP",
    "ConvCNP": "ConvCNP",
    "ConvLNP": "ConvLNP",
    "GridConvCNP": "GridConvCNP",
    "GridConvLNP": "GridConvLNP",
    "NllLNPF": "NPML",
    "ElboLNPF": "NPVI",
    "SUMOLNPF": "SUMO",
}


def get_datasets_single_gp(**kwargs):
    """RBF / Periodic / Noisy-Matern fixed-hyperparameter GPs
    (ref ntbks_helpers.py:80-98)."""
    return get_gp_datasets(
        names=("RBF_Kernel", "Periodic_Kernel", "Noisy_Matern_Kernel"), **kwargs
    )


def get_datasets_variable_hyp_gp(**kwargs):
    """Matern with length-scale sampled per function (ref :103-115)."""
    return get_gp_datasets(names=("Variable_Matern_Kernel",), **kwargs)


def get_all_gp_datasets(**kwargs):
    """All single GPs + variable-hyperparameter Matern (ref :61-77)."""
    train, test, valid = get_gp_datasets(
        names=(
            "RBF_Kernel",
            "Periodic_Kernel",
            "Noisy_Matern_Kernel",
            "Variable_Matern_Kernel",
        ),
        **kwargs,
    )
    return train, test, valid


def get_datasets_variable_kernel_gp(**kwargs):
    """All_Kernels: one dataset merging draws from every kernel
    (ref ntbks_helpers.py:118-126 via DatasetMerger)."""
    from .data.gp import DatasetMerger

    train, test, valid = get_datasets_single_gp(**kwargs)
    return (
        {"All_Kernels": DatasetMerger(train.values())},
        {"All_Kernels": DatasetMerger(test.values())},
        {"All_Kernels": DatasetMerger(valid.values())},
    )


def get_n_cntxt(n_cntxt: int, is_1d: bool = True, upscale_factor: float = 1.0):
    """Splitter with a FIXED number of context points — used at plot time
    (ref ntbks_helpers.py:272-287)."""
    from .data.datasplit import GridCntxtTrgtSplitter, RandomMasker

    if is_1d:
        return CntxtTrgtSplitter(
            contexts_getter=GetRandomIndcs(a=n_cntxt, b=n_cntxt),
            targets_getter=get_all_indcs,
        )
    return GridCntxtTrgtSplitter(
        context_masker=RandomMasker(a=n_cntxt, b=n_cntxt),
        upscale_factor=upscale_factor,
    )


def add_y_dim(models: Dict[str, object], datasets: Dict[str, object]):
    """Instantiate model templates with the y_dim of each dataset
    (ref ntbks_helpers.py:261-269)."""
    return {
        data_name: {
            model_name: model.clone(y_dim=getattr(dataset, "y_dim", 1))
            for model_name, model in models.items()
        }
        for data_name, dataset in datasets.items()
    }


def load_all_results(root: str = "results/", pattern: str = "**/eval.csv"):
    """Aggregate every eval.csv under root into a DataFrame with columns
    (data, model, run, mean_ll, n) — ref utils/helpers.py:22-32."""
    import pandas as pd

    rows = []
    for path in glob.glob(os.path.join(root, pattern), recursive=True):
        rel = os.path.relpath(path, root)
        parts = rel.split(os.sep)
        if len(parts) < 4:
            continue
        data_name, model_name, run = parts[-4], parts[-3], parts[-2]
        lls = np.loadtxt(path, delimiter=",")
        rows.append(
            dict(
                data=data_name,
                model=model_name,
                run=run,
                mean_ll=float(np.mean(lls)),
                n=int(np.size(lls)),
            )
        )
    return pd.DataFrame(rows)

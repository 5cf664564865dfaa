"""Dataset gallery — our equivalent of the reference's Datasets.ipynb
(jupyter/reproducibility/Datasets.ipynb): function draws from every 1-D GP
task family (single-GP kernels, the merged All_Kernels, the
variable-hyperparameter Matern) via `plot_dataset_samples_1d`
(ref visualize_1d.py:50-77) and image-dataset sample grids (digits + the
zsmms train/test construction) via `plot_dataset_samples_imgs`
(ref visualize_imgs.py:37-52). MNIST/SVHN/CelebA panels appear when their
local npz files exist (zero-egress environment).

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/datasets_viz.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/viz/datasets.png")
    ap.add_argument("--n-samples", type=int, default=3)
    args = ap.parse_args()

    from npf_gwwaveform_tpu.data.images import DigitsDataset, ZeroShotMultiDigits
    from npf_gwwaveform_tpu.notebooks import (
        get_all_gp_datasets,
        get_datasets_variable_kernel_gp,
    )
    from npf_gwwaveform_tpu.viz import (
        plot_dataset_samples_1d,
        plot_dataset_samples_imgs,
    )

    train, _, _ = get_all_gp_datasets()
    merged, _, _ = get_datasets_variable_kernel_gp()
    # (name, dataset, n_draws): All_Kernels gets 10 draws like the notebook
    gp_rows = [(k, ds, args.n_samples) for k, ds in train.items()]
    gp_rows += [(k, ds, 10) for k, ds in merged.items()]
    img_rows = [
        ("digits (train)", DigitsDataset(train=True)),
        ("zsmms train (translated single)", ZeroShotMultiDigits(train=True)),
        ("zsmms test (two digits, larger canvas)", ZeroShotMultiDigits(train=False)),
    ]

    ncols = 3
    n_gp_rows = (len(gp_rows) + ncols - 1) // ncols
    fig, axes = plt.subplots(
        n_gp_rows + 1, ncols, figsize=(4.8 * ncols, 3.2 * (n_gp_rows + 1)),
        squeeze=False,
    )
    for i, (name, ds, n) in enumerate(gp_rows):
        plot_dataset_samples_1d(ds, n_samples=n, ax=axes[i // ncols][i % ncols],
                                title=name.replace("_", " "))
    for i in range(len(gp_rows), n_gp_rows * ncols):
        axes[i // ncols][i % ncols].axis("off")
    for j, (title, ds) in enumerate(img_rows):
        plot_dataset_samples_imgs(ds, n_plots=4, ax=axes[n_gp_rows][j], title=title)
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()

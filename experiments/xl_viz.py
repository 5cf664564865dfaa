"""Qualitative demos for the ConvCNPXL large-image scale axis: in-painting
at sparse context fractions and 8x super-resolution on rgb_digits128 —
the counterpart of the reference's celeba128 ConvCNPXL demo cells
(jupyter/reproducibility/ConvCNP.ipynb: `multi_posterior_imgs_gif`
sweep_values=[0.005..0.1] and the `superres_gif` / "Upscaling 8x8 ->
128x128" figures).

Usage: python experiments/xl_viz.py [--run run_0] [--out results/viz]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="run_0")
    ap.add_argument("--out", default="results/viz")
    ap.add_argument("--n-imgs", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from experiments.reproduce_img import build_model
    from npf_gwwaveform_tpu.data import get_train_test_img_dataset
    from npf_gwwaveform_tpu.data.datasplit import RandomMasker, ResolutionMasker
    from npf_gwwaveform_tpu.viz.visualize_imgs import get_posterior_samples_imgs

    run_dir = os.path.join("results", "rgb_digits128", "GridConvCNPXL", args.run)
    model = build_model("GridConvCNPXL", y_dim=3)

    import flax.serialization

    with open(os.path.join(run_dir, "params.msgpack"), "rb") as f:
        params_bytes = f.read()
    with open(os.path.join(run_dir, "extra_vars.msgpack"), "rb") as f:
        extra_bytes = f.read()

    _, test_ds = get_train_test_img_dataset("rgb_digits128")
    y = jnp.asarray(test_ds.images[: args.n_imgs])
    B, H, W, _ = y.shape

    # init for the pytree skeleton, then overwrite with the trained weights
    mask0 = jnp.ones((B, H, W, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)},
        mask0, y, mask0, train=False,
    )
    params = flax.serialization.from_bytes(variables["params"], params_bytes)
    extra = flax.serialization.from_bytes(
        {k: v for k, v in variables.items() if k != "params"}, extra_bytes
    )
    variables = {"params": params, **extra}

    key = jax.random.PRNGKey(3)
    regimes = [
        ("5% ctx", RandomMasker(a=0.05, b=0.05)(key, B, (H, W))),
        ("10% ctx", RandomMasker(a=0.10, b=0.10)(jax.random.fold_in(key, 1), B, (H, W))),
        ("16x16 superres", ResolutionMasker(8)(jax.random.fold_in(key, 2), B, (H, W))),
    ]

    fig, axes = plt.subplots(B, 1 + 2 * len(regimes),
                             figsize=(2.1 * (1 + 2 * len(regimes)), 2.1 * B))
    axes = np.atleast_2d(axes)

    def show(ax, img, title=None):
        ax.imshow(np.clip(np.asarray(img), 0, 1))
        ax.set_xticks([]); ax.set_yticks([])
        if title:
            ax.set_title(title, fontsize=9)

    for b in range(B):
        show(axes[b, 0], y[b], "target" if b == 0 else None)
    for j, (name, mask) in enumerate(regimes):
        m4 = jnp.asarray(mask)[..., None].astype(jnp.float32)
        loc, _ = get_posterior_samples_imgs(model, variables, m4, y, n_samples=1)
        for b in range(B):
            ctx = np.asarray(y[b]) * np.asarray(m4[b]) + 0.5 * (1 - np.asarray(m4[b]))
            show(axes[b, 1 + 2 * j], ctx, name if b == 0 else None)
            show(axes[b, 2 + 2 * j], loc[0, b], "recon" if b == 0 else None)

    os.makedirs(args.out, exist_ok=True)
    out = os.path.join(args.out, "xl_rgb128_demo.png")
    fig.tight_layout()
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print(json.dumps({"figure": out}))


if __name__ == "__main__":
    main()

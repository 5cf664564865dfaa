"""Translation-equivariance illustration figures (GP posterior vs shifted context).

Our equivalent of the reference's standalone stheno/wbml figure script
(reference utils/visualize/gp_te.py:1-67): sample one Matern-5/2 GP function
on a dense grid, pick 6 context points, and plot (a) the original context set,
(b) the tau-shifted context set, (c) the analytic GP posterior given the
original context, (d) the posterior given the shifted context — the posterior
shifts rigidly with the data, which is the translation-equivariance property
ConvCNP bakes in. The reference script is imported by nothing (SURVEY.md #39);
ours reuses GPSampler's on-device covariance + analytic posterior
(npf_gwwaveform_tpu/data/gp.py) instead of stheno, and drops the usetex /
wbml.plot.tweak styling (neither is in this image).

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/gp_te.py \
           [--outdir results/viz/gp_te]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import jax
import jax.numpy as jnp

from npf_gwwaveform_tpu.data.gp import GPSampler, rescale_range

XLIM = (-2.0, 2.0)
YLIM = (-2.2, 2.5)
TAU = 0.7  # reference gp_te.py:24


def _panel(ax):
    ax.set_xlim(*XLIM)
    ax.set_ylim(*YLIM)
    ax.spines["top"].set_visible(False)
    ax.spines["right"].set_visible(False)


def _arrow(ax):
    ax.arrow(x=-1.5, y=0.75, dx=0.5, dy=0, width=0.05, color="black")
    ax.text(x=-1.25, y=0.85, s=r"$\tau$", fontsize=32)


def make_figures(outdir: str, n_grid: int = 500, seed: int = 1111):
    os.makedirs(outdir, exist_ok=True)
    # Matern-5/2, length scale 0.25 (reference gp_te.py:13 stheno
    # Matern52().stretch(0.25)); nu=2.5 selects matern25_cov.
    sampler = GPSampler(
        kernel="matern", nu=2.5, length_scale=0.25, min_max=XLIM, n_points=n_grid
    )
    x_all = np.linspace(XLIM[0], XLIM[1], n_grid)

    # one prior draw on the dense grid (Cholesky of the Matern cov, like
    # stheno's gp(x_all).sample(), reference gp_te.py:18)
    cov = sampler._cov(jnp.asarray(x_all)[:, None], jnp.asarray(0.25))
    chol = np.linalg.cholesky(np.asarray(cov, dtype=np.float64))
    rng = np.random.default_rng(seed)
    y_all = chol @ rng.standard_normal(n_grid)

    idx = rng.integers(0, int(n_grid * 0.8), 6)  # ref: randint(0, 400, 6)
    xc, yc = x_all[idx], y_all[idx]
    xc_shift = xc + TAU

    def save_scatter(name, x, y, arrow=False):
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.scatter(x, y, color="black")
        if arrow:
            _arrow(ax)
        _panel(ax)
        fig.savefig(os.path.join(outdir, name), bbox_inches="tight", dpi=120)
        plt.close(fig)

    def save_predictive(name, xctx, yctx, arrow=False):
        # GPSampler.posterior takes model-space [-1,1] coords (gp.py:183)
        to_model = lambda v: rescale_range(
            jnp.asarray(v, jnp.float32)[:, None], XLIM, (-1.0, 1.0)
        )
        mean, std = sampler.posterior(to_model(xctx), jnp.asarray(
            yctx, jnp.float32)[:, None], to_model(x_all))
        mean, std = np.asarray(mean), np.asarray(std)
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(x_all, mean, color="tab:blue")
        # stheno marginals() returns the central 95% band
        ax.fill_between(
            x_all, mean - 1.96 * std, mean + 1.96 * std, color="tab:blue", alpha=0.3
        )
        if arrow:
            _arrow(ax)
        _panel(ax)
        fig.savefig(os.path.join(outdir, name), bbox_inches="tight", dpi=120)
        plt.close(fig)

    save_scatter("original-context.png", xc, yc)
    save_scatter("shifted-context.png", xc_shift, yc, arrow=True)
    save_predictive("original-predictive.png", xc, yc)
    save_predictive("shifted-predictive.png", xc_shift, yc, arrow=True)
    return outdir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="results/viz/gp_te")
    p.add_argument("--n-grid", type=int, default=500)
    args = p.parse_args()
    out = make_figures(args.outdir, n_grid=args.n_grid)
    print(f"wrote 4 figures to {out}", flush=True)


if __name__ == "__main__":
    main()

"""Image visualization for Grid* models.

Parity target: /root/reference/utils/visualize/visualize_imgs.py —
`get_posterior_samples` (:58-113), `plot_posterior_samples` (:210-...),
the grid<->points converters (:564-578, :889), and (simplified) the
qualitative percentile plot `plot_qualitative_with_kde` (:467-770).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def points_to_grid(x, y, grid_shape, fill=0.0):
    """Scatter a padded point set back onto a grid (inverse of
    data.datasplit.grid_to_points; ref visualize_imgs.py:889)."""
    # x in [-1,1]^d -> integer pixel coords
    B = x.shape[0]
    ndim = len(grid_shape)
    canvas = np.full((B,) + tuple(grid_shape) + (y.shape[-1],), fill, np.float32)
    for b in range(B):
        idx = []
        for d in range(ndim):
            i = np.round(
                (np.asarray(x[b, :, d]) + 1.0) / 2.0 * (grid_shape[d] - 1)
            ).astype(int)
            idx.append(np.clip(i, 0, grid_shape[d] - 1))
        canvas[(b,) + tuple(idx)] = np.asarray(y[b])
    return canvas


def plot_img_marginal_pred(
    model, variables, mask_cntxt, y_grid, pixel=(0, 0), n_samples=64, key=None
):
    """Marginal predictive density at one pixel across latent samples — the
    multi-modality probe (ref visualize_imgs.py:117-207, simplified: KDE of
    per-sample predictive means + the mixture density curve)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    locs, scales = get_posterior_samples_imgs(
        model, variables, mask_cntxt, y_grid, n_samples, key
    )
    i, j = pixel
    mu = locs[:, 0, i, j, 0]
    sd = scales[:, 0, i, j, 0]
    grid = np.linspace(mu.min() - 3 * sd.max(), mu.max() + 3 * sd.max(), 200)
    dens = np.mean(
        [
            np.exp(-0.5 * ((grid - m) / s) ** 2) / (s * np.sqrt(2 * np.pi))
            for m, s in zip(mu, sd)
        ],
        axis=0,
    )
    fig, ax = plt.subplots(figsize=(5, 3))
    ax.plot(grid, dens)
    ax.axvline(float(np.asarray(y_grid)[0, i, j, 0]), color="r", ls=":", label="truth")
    ax.set_xlabel(f"pixel {pixel} value")
    ax.set_ylabel("marginal predictive density")
    ax.legend()
    return fig


def plot_qualitative_with_kde(
    model,
    variables,
    images,
    lls,
    percentiles=(1, 25, 50, 75, 99),
    context_fraction=0.3,
    key=None,
):
    """Qualitative panel keyed to the test-LL distribution
    (ref visualize_imgs.py:467-770, simplified): a KDE of per-image test
    log-likelihoods plus in-painting panels for the images sitting at the
    given LL percentiles."""
    key = key if key is not None else jax.random.PRNGKey(0)
    lls = np.asarray(lls)
    idx = [int(np.argsort(lls)[min(len(lls) - 1, int(p / 100 * len(lls)))]) for p in percentiles]

    fig = plt.figure(figsize=(3 * len(percentiles), 7))
    gs = fig.add_gridspec(2, 1, height_ratios=[1, 2])
    ax_kde = fig.add_subplot(gs[0])
    try:
        import seaborn as sns

        sns.kdeplot(lls, ax=ax_kde, fill=True)
    except ImportError:
        ax_kde.hist(lls, bins=50, density=True, alpha=0.5)
    for p, i in zip(percentiles, idx):
        ax_kde.axvline(lls[i], color="r", ls=":", alpha=0.6)
        ax_kde.text(lls[i], ax_kde.get_ylim()[1] * 0.9, f"{p}%", fontsize=7)
    ax_kde.set_xlabel("per-image test log-likelihood")

    sel = jnp.asarray(np.stack([np.asarray(images[i]) for i in idx]))
    mask = jax.random.bernoulli(key, context_fraction, sel.shape[:-1])[..., None]
    sub = fig.add_subfigure(gs[1])
    plot_posterior_samples_imgs(model, variables, mask, sel, n_samples=1, key=key, fig=sub)
    return fig


def get_posterior_samples_imgs(model, variables, mask_cntxt, y_grid, n_samples=3, key=None):
    """Predictive mean/std on the full grid given a context mask
    (ref visualize_imgs.py:58-113)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    if model.has_latent:
        model = model.clone(n_z_samples_test=n_samples)
    out = model.apply(
        variables,
        mask_cntxt.astype(jnp.float32),
        y_grid,
        jnp.ones_like(mask_cntxt, jnp.float32),
        train=False,
        rngs={"latent": key},
    )
    return np.asarray(out.p_yCc.loc), np.asarray(out.p_yCc.scale)


def plot_posterior_samples_imgs(
    model, variables, mask_cntxt, y_grid, n_samples=2, key=None, fig=None
):
    """Rows: [masked context | predictive means...] per image
    (ref visualize_imgs.py:210+)."""
    locs, _ = get_posterior_samples_imgs(
        model, variables, mask_cntxt, y_grid, n_samples, key
    )
    n_z = locs.shape[0]
    B = y_grid.shape[0]
    if fig is None:
        fig, axes = plt.subplots(B, n_z + 2, figsize=(2 * (n_z + 2), 2 * B))
    else:
        axes = fig.subplots(B, n_z + 2)
    axes = np.atleast_2d(axes)

    def show(ax, img):
        img = np.asarray(img)
        if img.shape[-1] == 1:
            ax.imshow(img[..., 0], cmap="gray", vmin=0, vmax=1)
        else:
            ax.imshow(np.clip(img, 0, 1))
        ax.set_xticks([])
        ax.set_yticks([])

    mask = np.asarray(mask_cntxt).astype(np.float32)
    for b in range(B):
        show(axes[b, 0], np.asarray(y_grid[b]))
        axes[b, 0].set_title("target" if b == 0 else "")
        show(axes[b, 1], np.asarray(y_grid[b]) * mask[b] + 0.5 * (1 - mask[b]))
        axes[b, 1].set_title("context" if b == 0 else "")
        for z in range(n_z):
            show(axes[b, z + 2], locs[z, b])
            if b == 0:
                axes[b, z + 2].set_title(f"sample {z}")
    return fig

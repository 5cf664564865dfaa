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


def plot_dataset_samples_imgs(
    dataset, n_plots=4, ax=None, pad_value=1.0, seed=123, title=None
):
    """Tile n random dataset images into a 2-wide grid (Datasets.ipynb's
    image panels; ref visualize_imgs.py:37-52 with torchvision make_grid
    replaced by a numpy tiler)."""
    rng = np.random.default_rng(seed)
    imgs = np.asarray(dataset.images)[rng.integers(0, len(dataset), n_plots)]
    n, h, w, c = imgs.shape
    ncol, pad = 2, 2
    nrow = int(np.ceil(n / ncol))
    grid = np.full(
        (nrow * (h + pad) + pad, ncol * (w + pad) + pad, c), pad_value, np.float32
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        top, left = pad + r * (h + pad), pad + col * (w + pad)
        grid[top : top + h, left : left + w] = imgs[i]
    if ax is None:
        _, ax = plt.subplots(figsize=(5, 5))
    ax.imshow(grid.squeeze(-1) if c == 1 else grid, cmap="gray" if c == 1 else None)
    if title is not None:
        ax.set_title(title)
    ax.axis("off")
    return ax


def sarle(out, axis=0):
    """Sarle's bimodality coefficient (ref visualize_imgs.py:850-856,
    reproduced exactly including its n = out.shape[1] convention): lower
    denominator / higher value = more bimodal."""
    from scipy import stats

    k = stats.kurtosis(out, axis=axis, fisher=True)
    g = stats.skew(out, axis=axis)
    n = out.shape[1]
    denom = k + 3 * (n - 1) ** 2 / ((n - 2) * (n - 2))
    return (g**2 + 1) / denom


def plot_img_marginal_pred(
    model,
    variables,
    mask_cntxt,
    y_grid,
    n_samples=64,
    n_marginals=5,
    pixel=None,
    key=None,
):
    """Mixture marginal predictive density over pixel intensity, for the
    pixels Sarle's bimodality coefficient ranks most multi-modal — the
    reference's multi-modality probe (ref visualize_imgs.py:117-207: mixture
    marginal on a 1000-point intensity grid, sarle-sorted pixel pick :169-183).
    Pass `pixel=(i, j)` to probe one pixel instead."""
    key = key if key is not None else jax.random.PRNGKey(0)
    locs, scales = get_posterior_samples_imgs(
        model, variables, mask_cntxt, y_grid, n_samples, key
    )
    n_z = locs.shape[0]
    H, W = y_grid.shape[1], y_grid.shape[2]
    if pixel is not None:
        flat_idx = [pixel[0] * W + pixel[1]]
    else:
        flat_idx = None
    mu = locs[:, 0, ..., 0].reshape(n_z, -1)  # image 0, channel 0: [n_z, P]
    sd = np.maximum(scales[:, 0, ..., 0].reshape(n_z, -1), 1e-6)
    arange = np.linspace(0.0, 1.0, 1000)
    # log N(a; mu, sd) on the intensity grid -> logsumexp over z = mixture
    z2 = ((arange[:, None, None] - mu[None]) / sd[None]) ** 2  # [1000, n_z, P]
    log_p = -0.5 * z2 - np.log(sd[None]) - 0.5 * np.log(2 * np.pi)
    from scipy.special import logsumexp

    out = np.exp(logsumexp(log_p, axis=1) - np.log(n_z))  # [1000, P]
    if flat_idx is None:
        flat_idx = np.argsort(sarle(out))[:n_marginals]

    fig, ax = plt.subplots(figsize=(5, 3))
    ax.plot(arange, out[:, flat_idx], alpha=0.7)
    ax.set_yticks([])
    ax.set_ylabel("Marginal Predictive")
    ax.set_xlabel("Pixel Intensity")
    ax.set_xlim(-0.1, 1)
    ax.set_xticks([0, 0.5, 1])
    return fig


def plot_qualitative_with_kde(
    model,
    variables,
    images,
    lls,
    percentiles=(1, 25, 50, 75, 99),
    context_fraction=0.3,
    model_compare=None,
    variables_compare=None,
    lls_compare=None,
    name="model",
    name_compare="compare",
    key=None,
):
    """Qualitative panel keyed to the test-LL distribution
    (ref visualize_imgs.py:467-770): a KDE of per-image test log-likelihoods
    with percentile markers, plus in-painting panels for the images whose LL
    sits nearest each percentile (np.percentile 'nearest' pick, ref :518-523).
    Pass a second (model, variables[, lls]) to overlay its KDE and render its
    reconstructions of the SAME selected images (ref named_trainer_compare)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    lls = np.asarray(lls)
    # reference pick: value closest to the percentile, then its index
    idx = []
    for p in percentiles:
        v = np.percentile(lls, p, method="nearest")
        idx.append(int(np.argmin(np.abs(lls - v))))

    n_panel_rows = 2 if model_compare is None else 3
    fig = plt.figure(figsize=(3 * len(percentiles), 4 + 2 * n_panel_rows))
    gs = fig.add_gridspec(2, 1, height_ratios=[1, n_panel_rows])
    ax_kde = fig.add_subplot(gs[0])

    def _kde(vals, label):
        try:
            import seaborn as sns

            sns.kdeplot(np.asarray(vals), ax=ax_kde, fill=True, label=label, cut=0)
        except ImportError:
            ax_kde.hist(np.asarray(vals), bins=50, density=True, alpha=0.5, label=label)

    _kde(lls, name)
    if lls_compare is not None:
        left = ax_kde.get_xlim()[0]
        _kde(lls_compare, name_compare)
        ax_kde.set_xlim(left=left)  # left bound by first model (ref :666)
    for p, i in zip(percentiles, idx):
        ax_kde.axvline(lls[i], color="tab:green", ls=":", alpha=0.7)
        ax_kde.text(lls[i], ax_kde.get_ylim()[1] * 0.9, f"{p}%", fontsize=7)
    ax_kde.set_xlabel("Test Log-Likelihood")
    ax_kde.set_ylabel("Density")
    ax_kde.legend(loc="upper left")

    sel = jnp.asarray(np.stack([np.asarray(images[i]) for i in idx]))
    mask = jax.random.bernoulli(key, context_fraction, sel.shape[:-1])[..., None]
    sub = fig.add_subfigure(gs[1])
    if model_compare is None:
        plot_posterior_samples_imgs(
            model, variables, mask, sel, n_samples=1, key=key, fig=sub
        )
    else:
        # same images + same context mask through both models
        locs, _ = get_posterior_samples_imgs(model, variables, mask, sel, 1, key)
        locs_c, _ = get_posterior_samples_imgs(
            model_compare, variables_compare, mask, sel, 1, key
        )
        axes = sub.subplots(3, len(idx), squeeze=False)
        maskf = np.asarray(mask).astype(np.float32)
        for b in range(len(idx)):
            imgs_rows = [
                np.asarray(sel[b]) * maskf[b] + 0.5 * (1 - maskf[b]),
                locs[0, b],
                locs_c[0, b],
            ]
            for r, img in enumerate(imgs_rows):
                img = np.asarray(img)
                if img.shape[-1] == 1:
                    axes[r, b].imshow(img[..., 0], cmap="gray", vmin=0, vmax=1)
                else:
                    axes[r, b].imshow(np.clip(img, 0, 1))
                axes[r, b].set_xticks([])
                axes[r, b].set_yticks([])
                if b == 0:
                    axes[r, 0].set_ylabel(["Context", name, name_compare][r])
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

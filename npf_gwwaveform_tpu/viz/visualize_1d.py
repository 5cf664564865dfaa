"""1-D visualization: posterior bands vs the oracle GP, dataset/prior draws,
loss curves.

Parity target: /root/reference/utils/visualize/visualize_1d.py —
`plot_dataset_samples_1d` (:50), `plot_prior_samples_1d` (:80),
`plot_posterior_samples_1d` (:99-253) with the oracle-GP overlay (:205-223)
and extrapolation boundary lines (:499-514), `gen_p_y_pred` (:280-306:
latent-sample sweep for LNPFs / observation-noise sampling for CNPFs),
`plot_losses` (:24-47).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def gen_p_y_pred(model, variables, batch, n_samples: int = 1, key=None):
    """Sample predictive curves: for latent models, n_samples z-draws; for
    deterministic ones with n_samples > 1, draws from the observation noise
    (ref visualize_1d.py:280-306). Returns (locs [S,B,Nt,y], scales, samples)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k_lat, k_obs = jax.random.split(key)

    if model.has_latent:
        model = model.clone(n_z_samples_test=n_samples)
    out = model.apply(
        variables,
        batch["X_cntxt"],
        batch["Y_cntxt"],
        batch["X_trgt"],
        mask_cntxt=batch.get("mask_cntxt"),
        mask_trgt=batch.get("mask_trgt"),
        train=False,
        rngs={"latent": k_lat},
    )
    loc, scale = out.p_yCc.loc, out.p_yCc.scale
    if not model.has_latent and n_samples > 1:
        eps = jax.random.normal(k_obs, (n_samples,) + loc.shape[1:])
        samples = loc[0][None] + scale[0][None] * eps
    else:
        samples = out.p_yCc.sample(k_obs) if model.has_latent else loc
    return np.asarray(loc), np.asarray(scale), np.asarray(samples)


def plot_dataset_samples_1d(dataset, n_samples: int = 4, ax=None, title=None):
    """A few function draws from a dataset (ref visualize_1d.py:50-77)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(7, 4))
    x, y = dataset.get_samples(n_samples)
    for i in range(n_samples):
        ax.plot(np.asarray(x[i, :, 0]), np.asarray(y[i, :, 0]), alpha=0.7)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    if title:
        ax.set_title(title)
    return ax


def plot_prior_samples_1d(model, variables, x_trgt=None, n_samples=5, ax=None, key=None):
    """Prior draws: predictions given an EMPTY context (ref :80-97)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(7, 4))
    if x_trgt is None:
        x_trgt = jnp.linspace(-1, 1, 128)[None, :, None]
    B, NT = x_trgt.shape[0], x_trgt.shape[1]
    batch = dict(
        X_cntxt=jnp.zeros((B, 1, x_trgt.shape[-1])),
        Y_cntxt=jnp.zeros((B, 1, model.y_dim)),
        X_trgt=x_trgt,
        mask_cntxt=jnp.zeros((B, 1), bool),
        mask_trgt=jnp.ones((B, NT), bool),
    )
    locs, scales, samples = gen_p_y_pred(model, variables, batch, n_samples, key)
    xs = np.asarray(x_trgt[0, :, 0])
    for s in range(samples.shape[0]):
        ax.plot(xs, samples[s, 0, :, 0], alpha=0.6)
    ax.set_title("prior samples")
    return ax


def plot_posterior_samples_1d(
    batch,
    model,
    variables,
    gp_sampler=None,
    n_samples: int = 3,
    train_min_max=(-1.0, 1.0),
    ax=None,
    key=None,
    title=None,
):
    """Posterior predictive: mean +/- std band per sample, context scatter,
    optional oracle-GP overlay, extrapolation boundaries
    (ref visualize_1d.py:99-253, 309-523)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(8, 4.5))

    locs, scales, _ = gen_p_y_pred(model, variables, batch, n_samples, key)
    xs = np.asarray(batch["X_trgt"][0, :, 0])
    order = np.argsort(xs)
    xs_o = xs[order]

    for s in range(locs.shape[0]):
        mu = locs[s, 0, :, 0][order]
        sd = scales[s, 0, :, 0][order]
        (line,) = ax.plot(xs_o, mu, alpha=0.8, label="model" if s == 0 else None)
        ax.fill_between(xs_o, mu - sd, mu + sd, alpha=0.15, color=line.get_color())

    # context points
    mask_c = np.asarray(batch.get("mask_cntxt"))
    xc = np.asarray(batch["X_cntxt"][0, :, 0])
    yc = np.asarray(batch["Y_cntxt"][0, :, 0])
    if mask_c is not None:
        sel = mask_c[0].astype(bool)
        xc, yc = xc[sel], yc[sel]
    ax.scatter(xc, yc, c="k", zorder=3, s=18, label="context")

    # oracle GP posterior overlay (ref :205-223)
    if gp_sampler is not None and len(xc) > 0:
        mean, std = gp_sampler.posterior(
            jnp.asarray(xc)[:, None], jnp.asarray(yc)[:, None], jnp.asarray(xs_o)[:, None]
        )
        mean, std = np.asarray(mean), np.asarray(std)
        ax.plot(xs_o, mean, "k--", lw=1, alpha=0.7, label="oracle GP")
        ax.fill_between(xs_o, mean - std, mean + std, color="k", alpha=0.08)

    # extrapolation boundaries (ref :499-514)
    if xs_o.min() < train_min_max[0] or xs_o.max() > train_min_max[1]:
        for b in train_min_max:
            ax.axvline(b, color="r", ls=":", alpha=0.5)

    ax.legend(loc="upper right", fontsize=8)
    if title:
        ax.set_title(title)
    return ax


def plot_losses(histories: dict, ax=None, y="train_loss"):
    """Loss curves from history dicts (ref visualize_1d.py:24-47)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(7, 4))
    for name, hist in histories.items():
        ax.plot([h["epoch"] for h in hist], [h[y] for h in hist], label=name)
    ax.set_xlabel("epoch")
    ax.set_ylabel(y)
    ax.legend()
    return ax

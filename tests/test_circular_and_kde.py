"""Circular padding (full translation equivariance on the grid) + the
qualitative-KDE image panel."""

import jax
import jax.numpy as jnp
import numpy as np

from npf_gwwaveform_tpu import GridConvCNP
from npf_gwwaveform_tpu.viz import plot_qualitative_with_kde


def test_circular_gridconvcnp_translation_equivariance(key):
    """With periodic boundaries, rolling the input must roll the prediction
    (exact equivariance) — the reference's CircularPad2d extrapolation config."""
    model = GridConvCNP(
        y_dim=1, x_dim=1, r_dim=16, cnn_n_blocks=2, cnn_kernel_size=5,
        conv_kernel_size=5, conv_padding="CIRCULAR",
    )
    H = W = 12
    mask = jax.random.bernoulli(key, 0.4, (1, H, W, 1)).astype(jnp.float32)
    img = jax.random.normal(key, (1, H, W, 1))
    v = model.init({"params": key, "latent": key}, mask, img, jnp.ones_like(mask))
    out = model.apply(v, mask, img, jnp.ones_like(mask), train=False,
                      rngs={"latent": key})
    shift = 3
    mask_r = jnp.roll(mask, shift, axis=1)
    img_r = jnp.roll(img, shift, axis=1)
    out_r = model.apply(v, mask_r, img_r, jnp.ones_like(mask), train=False,
                        rngs={"latent": key})
    np.testing.assert_allclose(
        np.asarray(jnp.roll(out.p_yCc.loc, shift, axis=2)),
        np.asarray(out_r.p_yCc.loc),
        atol=1e-4,
    )


def test_plot_qualitative_with_kde(key):
    model = GridConvCNP(
        y_dim=1, x_dim=1, r_dim=8, cnn_n_blocks=2, cnn_kernel_size=3,
        conv_kernel_size=3,
    )
    imgs = jax.random.uniform(key, (20, 8, 8, 1))
    v = model.init(
        {"params": key, "latent": key},
        jnp.ones((1, 8, 8, 1)), imgs[:1], jnp.ones((1, 8, 8, 1)),
    )
    lls = np.random.default_rng(0).normal(size=20)
    fig = plot_qualitative_with_kde(model, v, imgs, lls, percentiles=(1, 50, 99))
    assert fig is not None


def test_plot_qualitative_with_kde_compare(key):
    """Compare mode (ref named_trainer_compare): second model's KDE overlays
    and its reconstructions of the SAME selected images render as a row."""
    model = GridConvCNP(
        y_dim=1, x_dim=1, r_dim=8, cnn_n_blocks=2, cnn_kernel_size=3,
        conv_kernel_size=3,
    )
    imgs = jax.random.uniform(key, (20, 8, 8, 1))
    v = model.init(
        {"params": key, "latent": key},
        jnp.ones((1, 8, 8, 1)), imgs[:1], jnp.ones((1, 8, 8, 1)),
    )
    rng = np.random.default_rng(0)
    fig = plot_qualitative_with_kde(
        model, v, imgs, rng.normal(size=20), percentiles=(1, 50, 99),
        model_compare=model, variables_compare=v,
        lls_compare=rng.normal(size=20) + 1.0,
        name="A", name_compare="B",
    )
    assert fig is not None


def test_plot_qualitative_with_kde_compare_single_percentile(key):
    """Regression: compare mode with ONE percentile used to crash on axes
    indexing (sub.subplots(3, 1) returned a (3,)-shaped array that
    np.atleast_2d turned into (1, 3))."""
    model = GridConvCNP(
        y_dim=1, x_dim=1, r_dim=8, cnn_n_blocks=2, cnn_kernel_size=3,
        conv_kernel_size=3,
    )
    imgs = jax.random.uniform(key, (20, 8, 8, 1))
    v = model.init(
        {"params": key, "latent": key},
        jnp.ones((1, 8, 8, 1)), imgs[:1], jnp.ones((1, 8, 8, 1)),
    )
    rng = np.random.default_rng(0)
    fig = plot_qualitative_with_kde(
        model, v, imgs, rng.normal(size=20), percentiles=(50,),
        model_compare=model, variables_compare=v,
        lls_compare=rng.normal(size=20) + 1.0,
        name="A", name_compare="B",
    )
    assert fig is not None


def test_sarle_picks_bimodal_density_before_unimodal():
    """Sarle coefficient as the reference applies it (visualize_imgs.py:
    850-856, :169-183): computed on DENSITY CURVES over the intensity grid,
    ascending argsort — a two-component mixture marginal must sort before a
    peaked unimodal one (lower coefficient = flatter/multi-modal curve)."""
    from npf_gwwaveform_tpu.viz.visualize_imgs import sarle

    a = np.linspace(0, 1, 1000)

    def gauss(m, s):
        return np.exp(-0.5 * ((a - m) / s) ** 2) / (s * np.sqrt(2 * np.pi))

    uni = gauss(0.5, 0.08)
    bi = 0.5 * gauss(0.25, 0.05) + 0.5 * gauss(0.75, 0.05)
    sharp = gauss(0.2, 0.02)
    out = np.stack([sharp, bi, uni], axis=1)
    s = sarle(out)
    assert s[1] < s[2] < s[0]  # bimodal first, sharp unimodal last

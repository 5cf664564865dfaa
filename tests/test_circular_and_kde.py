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

"""Forward-pass shape/contract tests for every model family.

Checks the four-tuple output contract of NeuralProcessFamily.forward
(reference base.py:199-210) and mask correctness: padded context points must
not change predictions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npf_gwwaveform_tpu import (
    CNP,
    LNP,
    AttnCNP,
    AttnLNP,
    ConvCNP,
    ConvLNP,
    GridConvCNP,
    GridConvLNP,
)

B, NC, NT, XD, YD, R = 2, 10, 16, 1, 1, 32


def _batch(key, nc=NC):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x_c = jax.random.uniform(k1, (B, nc, XD), minval=-1, maxval=1)
    y_c = jax.random.normal(k2, (B, nc, YD))
    x_t = jax.random.uniform(k3, (B, NT, XD), minval=-1, maxval=1)
    y_t = jax.random.normal(k4, (B, NT, YD))
    return x_c, y_c, x_t, y_t


def _init_and_apply(model, key, inputs, n_z=None, **kwargs):
    params = model.init(
        {"params": key, "latent": jax.random.PRNGKey(1)}, *inputs, **kwargs
    )
    out = model.apply(
        params, *inputs, rngs={"latent": jax.random.PRNGKey(2)}, **kwargs
    )
    return params, out


MODELS_1D = [
    (CNP, dict(r_dim=R), 1),
    (LNP, dict(r_dim=R, n_z_samples_train=4), 4),
    (AttnCNP, dict(r_dim=R), 1),
    (AttnCNP, dict(r_dim=R, attention="multihead"), 1),
    (AttnLNP, dict(r_dim=R, n_z_samples_train=4), 4),
    (ConvCNP, dict(r_dim=R, density_induced=16, cnn_n_blocks=2, cnn_kernel_size=5), 1),
    (
        ConvLNP,
        dict(
            r_dim=R,
            density_induced=16,
            cnn_n_blocks=2,
            cnn_kernel_size=5,
            n_z_samples_train=3,
        ),
        3,
    ),
]


@pytest.mark.parametrize("cls,kwargs,n_z", MODELS_1D)
def test_forward_shapes(key, cls, kwargs, n_z):
    model = cls(y_dim=YD, x_dim=XD, **kwargs)
    inputs = _batch(key)
    _, out = _init_and_apply(model, key, inputs)
    assert out.p_yCc.loc.shape == (n_z, B, NT, YD)
    assert out.p_yCc.scale.shape == (n_z, B, NT, YD)
    assert np.all(np.asarray(out.p_yCc.scale) > 0.0)
    assert np.all(np.isfinite(np.asarray(out.p_yCc.loc)))
    if model.has_latent:
        assert out.z_samples is not None and out.q_zCc is not None
    else:
        assert out.z_samples is None and out.q_zCc is None


@pytest.mark.parametrize(
    "cls,kwargs",
    [
        (CNP, dict(r_dim=R)),
        (AttnCNP, dict(r_dim=R)),
        (ConvCNP, dict(r_dim=R, density_induced=16, cnn_n_blocks=2, cnn_kernel_size=5)),
    ],
)
def test_mask_invariance(key, cls, kwargs):
    """Prediction from (Nc real points, padding masked out) must equal the
    prediction from the same Nc points without padding."""
    model = cls(y_dim=YD, x_dim=XD, **kwargs)
    x_c, y_c, x_t, y_t = _batch(key, nc=6)

    # padded version: 6 real + 4 junk
    pad_x = jnp.full((B, 4, XD), 0.77)
    pad_y = jnp.full((B, 4, YD), -3.3)
    x_c_pad = jnp.concatenate([x_c, pad_x], axis=1)
    y_c_pad = jnp.concatenate([y_c, pad_y], axis=1)
    mask = jnp.concatenate(
        [jnp.ones((B, 6), bool), jnp.zeros((B, 4), bool)], axis=1
    )

    params, out_ref = _init_and_apply(model, key, (x_c, y_c, x_t))
    out_pad = model.apply(
        params,
        x_c_pad,
        y_c_pad,
        x_t,
        mask_cntxt=mask,
        rngs={"latent": jax.random.PRNGKey(2)},
    )
    np.testing.assert_allclose(
        np.asarray(out_ref.p_yCc.loc), np.asarray(out_pad.p_yCc.loc), atol=1e-5
    )


def test_empty_context_is_finite(key):
    """All-padding context must give finite predictions (the reference's
    empty-context conventions, np.py:97-99 / attnnp.py:108-116)."""
    for cls, kwargs in [
        (CNP, dict(r_dim=R)),
        (AttnCNP, dict(r_dim=R)),
        (ConvCNP, dict(r_dim=R, density_induced=16, cnn_n_blocks=2, cnn_kernel_size=5)),
    ]:
        model = cls(y_dim=YD, x_dim=XD, **kwargs)
        x_c, y_c, x_t, _ = _batch(key)
        mask = jnp.zeros((B, NC), bool)
        _, out = _init_and_apply(model, key, (x_c, y_c, x_t), mask_cntxt=mask)
        assert np.all(np.isfinite(np.asarray(out.p_yCc.loc)))
        assert np.all(np.isfinite(np.asarray(out.p_yCc.scale)))


def test_grid_models(key):
    H = W = 8
    mask_grid = jax.random.bernoulli(key, 0.3, (B, H, W, 1))
    y_grid = jax.random.normal(key, (B, H, W, YD))
    for cls, kwargs, n_z in [
        (GridConvCNP, dict(r_dim=R, cnn_n_blocks=2, cnn_kernel_size=5, conv_kernel_size=5), 1),
        (
            GridConvLNP,
            dict(
                r_dim=R,
                cnn_n_blocks=2,
                cnn_kernel_size=5,
                conv_kernel_size=5,
                n_z_samples_train=2,
            ),
            2,
        ),
    ]:
        model = cls(y_dim=YD, x_dim=1, **kwargs)
        inputs = (mask_grid, y_grid, jnp.ones_like(mask_grid), y_grid)
        _, out = _init_and_apply(model, key, inputs)
        assert out.p_yCc.loc.shape == (n_z, B, H, W, YD)
        assert np.all(np.isfinite(np.asarray(out.p_yCc.loc)))


def test_latent_paths_lnp_both(key):
    model = LNP(y_dim=YD, x_dim=XD, r_dim=R, encoded_path="both", n_z_samples_train=3)
    inputs = _batch(key)
    _, out = _init_and_apply(model, key, inputs)
    assert out.p_yCc.loc.shape == (3, B, NT, YD)


def test_q_zCct_npvi_path(key):
    """is_q_zCct=True must produce q_zCct during training (base.py:501-509)."""
    model = LNP(y_dim=YD, x_dim=XD, r_dim=R, is_q_zCct=True, n_z_samples_train=3)
    x_c, y_c, x_t, y_t = _batch(key)
    _, out = _init_and_apply(model, key, (x_c, y_c, x_t, y_t))
    assert out.q_zCct is not None
    # eval / no y_trgt -> no q_zCct
    params = model.init(
        {"params": key, "latent": jax.random.PRNGKey(1)}, x_c, y_c, x_t, y_t
    )
    out_eval = model.apply(
        params, x_c, y_c, x_t, rngs={"latent": jax.random.PRNGKey(2)}, train=False
    )
    assert out_eval.q_zCct is None

"""Multi-channel (y_dim=3) image path — the reference's CelebA32 axis.

The reference's only RGB benchmark trains `model_2d` with y_dim=3 on
CelebA32; its context embedding is explicitly grouped per channel
(/root/reference/npf/neuralproc/gridconvnp.py:83-90, `make_abs_conv` with
groups=y_dim) and normalized channel-by-channel (:136-162). These tests
make that path regression-safe on this side:

* the abs conv is truly depthwise (channel k's output never sees channel j);
* the signal/density normalization reproduces a constant per-channel value
  exactly wherever any context exists (conv(c*mask)/conv(mask) == c);
* GridConvCNP / GridConvLNP / a point model take a real training step on an
  RGB batch with 3-channel heteroskedastic outputs and finite loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npf_gwwaveform_tpu import GridConvCNP, GridConvLNP
from npf_gwwaveform_tpu.data.images import RGBDigitsDataset
from npf_gwwaveform_tpu.data.datasplit import (
    GridCntxtTrgtSplitter,
    RandomMasker,
    no_masker,
)
from npf_gwwaveform_tpu.losses import CNPFLoss, NLLLossLNPF
from npf_gwwaveform_tpu.ops.cnn import AbsConv
from npf_gwwaveform_tpu.training import Trainer, create_train_state, make_optimizer


def test_rgb_digits_dataset():
    tr = RGBDigitsDataset(train=True)
    te = RGBDigitsDataset(train=False)
    assert tr.shape == (32, 32, 3) and te.shape == (32, 32, 3)
    imgs = np.asarray(tr.images)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # channels must differ (colorization worked): per-image channel spread
    ch_means = imgs.mean(axis=(1, 2))  # [N, 3]
    assert np.median(ch_means.std(axis=1)) > 0.01
    # deterministic construction (seeded colors, fixed folds)
    tr2 = RGBDigitsDataset(train=True)
    np.testing.assert_array_equal(imgs, np.asarray(tr2.images))
    # train/test folds are disjoint by label-count bookkeeping
    assert len(tr) + len(te) == 1797


def test_absconv_is_per_channel():
    """Channel k's output depends only on channel k (ref groups=y_dim,
    gridconvnp.py:83-90): perturbing channel 0 must not touch 1..2."""
    conv = AbsConv(kernel_size=5)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 12, 12, 3))
    params = conv.init(jax.random.PRNGKey(1), x)
    y0 = conv.apply(params, x)
    x_pert = x.at[..., 0].add(1.0)
    y1 = conv.apply(params, x_pert)
    assert not np.allclose(y0[..., 0], y1[..., 0])
    np.testing.assert_array_equal(np.asarray(y0[..., 1:]), np.asarray(y1[..., 1:]))


def test_gridconv_context_normalization_constant_rgb():
    """conv(c_k * mask) / conv(mask) == c_k per channel wherever the density
    is nonzero — the per-channel normalize semantics of gridconvnp.py:136-162.
    A channel-mixing conv would blend the three constants."""
    conv = AbsConv(kernel_size=5)
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 1)) < 0.3)
    c = jnp.asarray([0.2, 0.5, 0.9])
    y = jnp.broadcast_to(c, (1, 16, 16, 3)) * mask
    params = conv.init(jax.random.PRNGKey(3), y)
    signal = conv.apply(params, y)
    density = conv.apply(params, jnp.broadcast_to(mask, y.shape).astype(y.dtype))
    out = signal / jnp.maximum(density, 1e-5)
    covered = np.asarray(density[..., 0]) > 1e-4
    for k in range(3):
        np.testing.assert_allclose(
            np.asarray(out[..., k])[covered], float(c[k]), rtol=1e-4
        )


def _rgb_batch(batch=4, side=16):
    imgs = np.asarray(RGBDigitsDataset(train=True).images[:batch])
    # crop for test speed; content irrelevant to the mechanics under test
    return jnp.asarray(imgs[:, :side, :side, :])


@pytest.mark.parametrize("model_cls,crit", [
    (GridConvCNP, CNPFLoss()),
    (GridConvLNP, NLLLossLNPF()),
])
def test_gridconv_rgb_one_train_step(model_cls, crit):
    y = _rgb_batch()
    kw = dict(y_dim=3, x_dim=1, r_dim=16, cnn_n_blocks=1, cnn_kernel_size=3,
              conv_kernel_size=3)
    if model_cls is GridConvLNP:
        # is_global=True matches the real rgb_digits/zsmms config
        # (reproduce_img.py): global-latent pooling over a 2-D RGB grid
        kw.update(n_z_samples_train=2, n_z_samples_test=2, is_global=True)
    model = model_cls(**kw)
    splitter = GridCntxtTrgtSplitter(
        context_masker=RandomMasker(a=0.0, b=0.3), target_masker=no_masker
    )
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, crit, tx, splitter=splitter)
    batch = splitter(jax.random.PRNGKey(0), y, y)
    state = create_train_state(model, tx, batch, seed=0)
    # heteroskedastic RGB head: per-pixel loc and scale are 3-channel
    out, _ = trainer._apply(state.params, state.extra_vars, batch,
                            jax.random.PRNGKey(1), train=False)
    assert out.p_yCc.loc.shape[-1] == 3
    assert out.p_yCc.scale.shape[-1] == 3
    state, metrics = trainer._train_step(state, y, y)
    assert np.isfinite(float(metrics["loss"]))


def test_point_model_rgb_one_train_step():
    """x_dim=2 point models gain RGB via y_dim clone (ref ntbks add_y_dim)."""
    from npf_gwwaveform_tpu.configs import gp_model_1d
    from npf_gwwaveform_tpu.data.datasplit import PointsFromGridSplitter

    y = _rgb_batch(batch=2, side=8)
    model = gp_model_1d("CNP").clone(x_dim=2, y_dim=3, r_dim=16)
    splitter = PointsFromGridSplitter(context_masker=RandomMasker(a=0.0, b=0.3))
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, CNPFLoss(), tx, splitter=splitter)
    state = create_train_state(
        model, tx, splitter(jax.random.PRNGKey(0), y, y), seed=0
    )
    state, metrics = trainer._train_step(state, y, y)
    assert np.isfinite(float(metrics["loss"]))


def test_rgb_digits128_mosaic_dataset():
    """The celeba128 stand-in corpus (data/images.py RGBDigitsMosaicDataset):
    128x128x3, seeded, fold-separated from the digit pool."""
    from npf_gwwaveform_tpu.data import RGBDigitsMosaicDataset

    tr = RGBDigitsMosaicDataset(train=True, n_images=8)
    te = RGBDigitsMosaicDataset(train=False, n_images=4)
    assert tr.shape == (128, 128, 3) and te.shape == (128, 128, 3)
    imgs = np.asarray(tr.images)
    assert imgs.shape == (8, 128, 128, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # mosaic structure: the four 64x64 quadrants have different colors
    quads = np.stack(
        [imgs[:, :64, :64], imgs[:, :64, 64:], imgs[:, 64:, :64], imgs[:, 64:, 64:]],
        axis=1,
    )  # [N, 4, 64, 64, 3]
    qmeans = quads.mean(axis=(2, 3))  # [N, 4, 3]
    assert (np.ptp(qmeans, axis=1).max(-1) > 0.02).all()
    # deterministic regeneration
    tr2 = RGBDigitsMosaicDataset(train=True, n_images=8)
    np.testing.assert_array_equal(np.asarray(tr.images), np.asarray(tr2.images))


def test_gridconvcnpxl_param_count():
    """GridConvCNPXL (reproduce_img.build_model) must match the reference's
    model_2d_XL exactly: 12 blocks, k=9, y_dim=3 -> 722,417 params
    (ConvCNP.ipynb 'Number Parameters (2D XL)')."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from experiments.reproduce_img import build_model
    from npf_gwwaveform_tpu.data.datasplit import (
        GridCntxtTrgtSplitter, RandomMasker, no_masker,
    )

    m = build_model("GridConvCNPXL", y_dim=3)
    sp = GridCntxtTrgtSplitter(
        context_masker=RandomMasker(a=0.0, b=0.3), target_masker=no_masker
    )
    y0 = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 16, 16, 3)).astype(np.float32))
    batch = sp(jax.random.PRNGKey(0), y0, y0)
    variables = m.init(
        {"params": jax.random.PRNGKey(1), "latent": jax.random.PRNGKey(2)},
        batch["X_cntxt"], batch["Y_cntxt"], batch["X_trgt"], batch["Y_trgt"],
        mask_cntxt=batch["mask_cntxt"], mask_trgt=batch["mask_trgt"], train=True,
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    assert n == 722_417

"""Viz layer + image datasets + grid training end-to-end."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npf_gwwaveform_tpu import CNP, GridConvCNP
from npf_gwwaveform_tpu.data import GPSampler, GPDataset
from npf_gwwaveform_tpu.data.datasplit import (
    CntxtTrgtSplitter,
    GetRandomIndcs,
    GridCntxtTrgtSplitter,
    RandomMasker,
    get_all_indcs,
    grid_to_points,
)
from npf_gwwaveform_tpu.data.images import (
    DigitsDataset,
    ZeroShotMultiDigits,
    get_train_test_img_dataset,
)
from npf_gwwaveform_tpu.losses import CNPFLoss
from npf_gwwaveform_tpu.training import Trainer, create_train_state, make_optimizer
from npf_gwwaveform_tpu.utils.predict import SamplePredictor
from npf_gwwaveform_tpu.viz import (
    giffify,
    plot_dataset_samples_1d,
    plot_posterior_samples_1d,
    plot_posterior_samples_imgs,
)
from npf_gwwaveform_tpu.notebooks import add_y_dim, get_n_cntxt, load_all_results


def test_digits_datasets():
    tr, te = get_train_test_img_dataset("digits16")
    assert tr.shape == (16, 16, 1)
    x, y = next(tr.epoch_batches(8))
    assert y.shape == (8, 16, 16, 1)
    assert 0.0 <= float(y.min()) and float(y.max()) <= 1.0


def test_zsmm_train_vs_test_structure():
    """zsmms construction (ref imgs.py:191-394): train = ONE translated digit
    on a small canvas; test = TWO digits on a canvas of side 2x the digit —
    the zero-shot extrapolation is the LARGER test canvas."""
    tr = ZeroShotMultiDigits(train=True, upscale=2)
    te = ZeroShotMultiDigits(train=False, upscale=2, n_test=16)
    assert tr.shape == (20, 20, 1)  # 16px digit + 25% headroom
    assert te.shape == (32, 32, 1)  # 2x digit side
    # per-canvas lit mass: two digits on 32^2 vs one digit on 20^2
    tr_lit = float((np.asarray(tr.images) > 0.1).sum(axis=(1, 2, 3)).mean())
    te_lit = float((np.asarray(te.images) > 0.1).sum(axis=(1, 2, 3)).mean())
    assert te_lit > tr_lit * 1.5  # ~2 digits vs 1
    assert tr.test_upscale_factor == pytest.approx(1.6)


def test_points_from_grid_splitter_upscale():
    """Point-model zsmms protocol: test coords are normalized per-canvas
    then MULTIPLIED by the upscale factor (ref datasplit.py:447) — they
    extend beyond the train range [-1,1]."""
    from npf_gwwaveform_tpu.data.datasplit import PointsFromGridSplitter

    imgs = jnp.ones((2, 8, 8, 1), jnp.float32)
    sp = PointsFromGridSplitter(
        context_masker=RandomMasker(a=0.1, b=0.5), upscale_factor=1.6
    )
    batch = sp(jax.random.PRNGKey(0), imgs, imgs)
    assert batch["X_trgt"].shape == (2, 64, 2)
    assert batch["Y_trgt"].shape == (2, 64, 1)
    assert bool(batch["mask_trgt"].all())
    np.testing.assert_allclose(float(batch["X_trgt"].max()), 1.6, rtol=1e-6)
    np.testing.assert_allclose(float(batch["X_trgt"].min()), -1.6, rtol=1e-6)
    # context = subset of target pixels, mask counts within the masker range
    frac = batch["mask_cntxt"].mean()
    assert 0.05 <= float(frac) <= 0.55


def test_grid_training_end_to_end():
    """GridConvCNP on digits: a few steps of masked in-painting training."""
    ds = DigitsDataset(train=True, upscale=2)  # 16x16
    model = GridConvCNP(
        y_dim=1, x_dim=1, r_dim=16, cnn_n_blocks=2, cnn_kernel_size=5,
        conv_kernel_size=5,
    )
    splitter = GridCntxtTrgtSplitter(context_masker=RandomMasker(a=0.1, b=0.4))
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, CNPFLoss(), tx, splitter=splitter)
    x, y = next(ds.epoch_batches(8))
    batch = splitter(jax.random.PRNGKey(0), x, y)
    state = create_train_state(model, tx, batch, seed=0)
    losses = []
    for i, (x, y) in enumerate(ds.epoch_batches(8)):
        state, m = trainer.train_step(state, x, y)
        losses.append(float(m["loss"]))
        if i > 20:
            break
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_grid_to_points_roundtrip():
    imgs = jnp.arange(2 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 4, 1)
    mask = jnp.ones((2, 4, 4), bool)
    x, y, m = grid_to_points(imgs, mask, n_max=16)
    assert x.shape == (2, 16, 2) and y.shape == (2, 16, 1)
    assert bool(m.all())


def test_1d_plots_and_gif(tmp_path):
    sampler = GPSampler(kernel="rbf", length_scale=0.2, n_points=32)
    ds = GPDataset(sampler, 16, seed=0)
    model = CNP(y_dim=1, x_dim=1, r_dim=16)
    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=4, b=8), targets_getter=get_all_indcs
    )
    x, y = next(ds.epoch_batches(4))
    batch = splitter(jax.random.PRNGKey(0), x, y)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)},
        batch["X_cntxt"], batch["Y_cntxt"], batch["X_trgt"],
    )

    ax = plot_dataset_samples_1d(ds, n_samples=3)
    assert ax is not None

    ax = plot_posterior_samples_1d(batch, model, variables, gp_sampler=sampler)
    assert len(ax.lines) > 0

    # predictor wrapper
    pred = SamplePredictor(model, variables)
    mean = pred(batch)
    assert mean.shape[-2:] == (32, 1)

    # gif sweep over context sizes
    def gen_fig(n_cntxt):
        import matplotlib.pyplot as plt

        b = get_n_cntxt(n_cntxt)(jax.random.PRNGKey(1), x, y)
        fig, ax = plt.subplots(figsize=(4, 3))
        plot_posterior_samples_1d(b, model, variables, ax=ax)
        return fig

    gif_path = tmp_path / "sweep.gif"
    giffify(str(gif_path), gen_fig, "n_cntxt", [2, 6])
    assert gif_path.exists() and gif_path.stat().st_size > 0


def test_img_plot(tmp_path):
    ds = DigitsDataset(train=True, upscale=2)
    model = GridConvCNP(
        y_dim=1, x_dim=1, r_dim=16, cnn_n_blocks=2, cnn_kernel_size=5,
        conv_kernel_size=5,
    )
    x, y = next(ds.epoch_batches(2))
    mask = jax.random.bernoulli(jax.random.PRNGKey(0), 0.3, y.shape[:3])[..., None]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)},
        mask.astype(jnp.float32), y, jnp.ones_like(mask, jnp.float32),
    )
    fig = plot_posterior_samples_imgs(model, variables, mask, y, n_samples=1)
    assert fig is not None


def test_load_all_results(tmp_path):
    d = tmp_path / "D1" / "M1" / "run_0"
    os.makedirs(d)
    np.savetxt(d / "eval.csv", np.array([1.0, 2.0, 3.0]), delimiter=",")
    df = load_all_results(str(tmp_path))
    assert len(df) == 1
    assert abs(df.iloc[0].mean_ll - 2.0) < 1e-9


def test_add_y_dim():
    models = {"CNP": CNP(y_dim=1, r_dim=16)}

    class FakeDS:
        y_dim = 3

    out = add_y_dim(models, {"rgb": FakeDS()})
    assert out["rgb"]["CNP"].y_dim == 3


def test_make_viz_smoke(tmp_path, monkeypatch):
    """experiments/make_viz.py regenerates the posterior-sweep figures + GIF
    from a checked-in run dir (reference jupyter/gifs workflow); must rebuild
    the exact param tree (incl. init scheme and norm-eps) of the checkpoint."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from experiments.make_viz import viz_run

    run_dir = os.path.join(
        os.path.dirname(__file__), "..", "results", "RBF_Kernel", "CNP", "run_0"
    )
    if not os.path.exists(os.path.join(run_dir, "params.msgpack")):
        pytest.skip("no checked-in RBF CNP checkpoint")
    monkeypatch.chdir(os.path.join(os.path.dirname(__file__), ".."))
    viz_run("RBF_Kernel", "CNP", out_dir=str(tmp_path))
    assert (tmp_path / "RBF_Kernel_CNP_c10.png").exists()
    assert (tmp_path / "RBF_Kernel_CNP.gif").exists()


def test_gp_te_figures(tmp_path):
    """experiments/gp_te.py (our stheno-free rebuild of the reference's
    utils/visualize/gp_te.py translation-equivariance illustration) writes
    all four figures; the GP draw and posterior must be finite."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from experiments.gp_te import make_figures

    make_figures(str(tmp_path), n_grid=120)
    for name in (
        "original-context.png",
        "shifted-context.png",
        "original-predictive.png",
        "shifted-predictive.png",
    ):
        assert (tmp_path / name).stat().st_size > 0


def test_plot_dataset_samples_imgs(tmp_path):
    """Datasets.ipynb image panels (ref visualize_imgs.py:37-52): tile random
    dataset samples into a grid; must handle 1-channel and multi-row tiling."""
    from npf_gwwaveform_tpu.data.images import DigitsDataset
    from npf_gwwaveform_tpu.viz import plot_dataset_samples_imgs
    import matplotlib.pyplot as plt

    ds = DigitsDataset(train=True, upscale=2)
    ax = plot_dataset_samples_imgs(ds, n_plots=6, title="digits")
    ax.figure.savefig(tmp_path / "ds.png")
    plt.close(ax.figure)
    assert (tmp_path / "ds.png").stat().st_size > 0

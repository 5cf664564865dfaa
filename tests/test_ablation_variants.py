"""The Losses.ipynb objective-ablation variant configs build, train a step,
and evaluate (configs.gp_model_variant — the ELBO x LatLB x SigLB grid whose
run dirs mirror /root/reference/results/models/RBF_Kernel/*_ELBO*)."""

import jax
import numpy as np
import pytest

from npf_gwwaveform_tpu.configs import gp_model_variant, variant_name
from npf_gwwaveform_tpu.data import (
    CntxtTrgtSplitter,
    GetRandomIndcs,
    GPSampler,
    get_all_indcs,
)
from npf_gwwaveform_tpu.data.gp import KERNEL_CONFIGS
from npf_gwwaveform_tpu.losses import ELBOLossLNPF, NLLLossLNPF
from npf_gwwaveform_tpu.training import Trainer, create_train_state, make_optimizer


@pytest.mark.parametrize(
    "name,elbo,lat,sig",
    [
        ("LNP", False, True, True),      # recorded -42.77 (best LNP NPML)
        ("AttnLNP", False, True, False), # recorded 180.14
        ("ConvLNP", False, True, False), # recorded 268.93
        ("ConvLNP", True, True, True),   # recorded ~-181 (NPVI collapse)
        ("LNP", True, False, False),     # no-lower-bound NPVI corner
    ],
)
def test_variant_builds_and_steps(name, elbo, lat, sig):
    sampler = GPSampler(n_points=24, **KERNEL_CONFIGS["RBF_Kernel"])
    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=0.0, b=8), targets_getter=get_all_indcs
    )
    model = gp_model_variant(name, elbo, lat, sig, r_dim=16)
    criterion = ELBOLossLNPF() if elbo else NLLLossLNPF()
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, criterion, tx, splitter=splitter)
    key = jax.random.PRNGKey(0)
    x, y = sampler.sample(key, 4)
    state = create_train_state(model, tx, splitter(key, x, y), seed=0)
    state, metrics = trainer._train_step(state, x, y)
    assert np.isfinite(float(metrics["loss"]))
    nll = trainer._eval_step(state, x, y, key)
    assert np.all(np.isfinite(np.asarray(nll)))
    # run-dir naming parity with the reference's Losses.ipynb get_name
    assert variant_name(name, elbo, lat, sig) == (
        f"{name}_ELBO{elbo}_LatLB{lat}_SigLB{sig}"
    )


def test_headline_arch_variant():
    """headline_arch=True builds the architecture the reference's checked-in
    ablation checkpoints actually carry (z_dim=r_dim, global latent, default
    decoder — see eval_pretrained_ablation.py), with the variant's scale
    transforms; it must train a step and keep the variant's n_z=16."""
    model = gp_model_variant("ConvLNP", False, True, False, r_dim=16,
                             headline_arch=True)
    assert model.z_dim is None          # defaults to r_dim
    assert model.is_global
    assert model.n_z_samples_train == 16 and model.n_z_samples_test == 16
    assert model.min_sigma_pred == pytest.approx(1e-4)  # SigLB False

    sampler = GPSampler(n_points=24, **KERNEL_CONFIGS["RBF_Kernel"])
    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=0.0, b=8), targets_getter=get_all_indcs
    )
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, NLLLossLNPF(), tx, splitter=splitter)
    key = jax.random.PRNGKey(0)
    x, y = sampler.sample(key, 4)
    state = create_train_state(model, tx, splitter(key, x, y), seed=0)
    state, metrics = trainer._train_step(state, x, y)
    assert np.isfinite(float(metrics["loss"]))


def test_parse_variant_roundtrip():
    from experiments.eval_pretrained_ablation import parse_variant

    for name in ("LNP", "AttnLNP", "ConvLNP"):
        for elbo in (True, False):
            for lat in (True, False):
                for sig in (True, False):
                    v = variant_name(name, elbo, lat, sig)
                    base, flags = parse_variant(v)
                    assert base == name
                    assert flags == {"ELBO": elbo, "LatLB": lat, "SigLB": sig}


def test_gp_model_1d_cnn_kernel_size_reaches_conv():
    """gp_model_1d(cnn_kernel_size=...) must change the actual conv kernels.

    Regression: the notebook-parity configs build the CNN through a
    CNNFactory closure, so model.clone(cnn_kernel_size=...) after the fact is
    a silent no-op (caught when a k=37 GW run reproduced the k=19 run's
    metrics bit-for-bit under fixed seeds). reproduce_gw.py --cnn-kernel now
    rebuilds via gp_model_1d — this pins the plumbing."""
    from npf_gwwaveform_tpu.configs import gp_model_1d

    key = jax.random.PRNGKey(0)
    x = np.zeros((2, 16, 1), dtype=np.float32)
    y = np.zeros((2, 16, 1), dtype=np.float32)
    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=0.0, b=8), targets_getter=get_all_indcs
    )
    batch = splitter(key, x, y)
    for k_want in (7, 37):
        model = gp_model_1d("ConvCNP", cnn_kernel_size=k_want)
        variables = model.init(
            key, batch["X_cntxt"], batch["Y_cntxt"], batch["X_trgt"],
            mask_cntxt=batch["mask_cntxt"], mask_trgt=batch["mask_trgt"],
        )
        k_sizes = {
            leaf.shape[0]
            for path, leaf in jax.tree_util.tree_leaves_with_path(variables["params"])
            if leaf.ndim == 3 and "depthwise" in jax.tree_util.keystr(path)
        }
        assert k_want in k_sizes, (k_want, k_sizes)


def test_gp_model_1d_cnn_dilations_reach_conv():
    """gp_model_1d(cnn_dilations=...) must change the conv geometry.

    Dilation leaves parameter SHAPES unchanged, so the shape check used for
    cnn_kernel_size can't catch a silent no-op here; instead apply the same
    params under dilated and undilated models: all-ones dilation must match
    the default exactly, a real multi-scale dilation must differ."""
    from npf_gwwaveform_tpu.configs import gp_model_1d

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    x = np.sort(rng.uniform(-1, 1, (2, 16, 1)).astype(np.float32), axis=1)
    y = rng.randn(2, 16, 1).astype(np.float32)
    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=4.0, b=8), targets_getter=get_all_indcs
    )
    batch = splitter(key, x, y)

    def fwd(model, variables):
        out = model.apply(
            variables, batch["X_cntxt"], batch["Y_cntxt"], batch["X_trgt"],
            mask_cntxt=batch["mask_cntxt"], mask_trgt=batch["mask_trgt"],
            train=False, rngs={"sample": key},
        )
        return np.asarray(out[0].loc)

    base = gp_model_1d("ConvCNP", cnn_kernel_size=5)
    variables = base.init(
        key, batch["X_cntxt"], batch["Y_cntxt"], batch["X_trgt"],
        mask_cntxt=batch["mask_cntxt"], mask_trgt=batch["mask_trgt"],
    )
    ref = fwd(base, variables)
    ones = fwd(gp_model_1d("ConvCNP", cnn_kernel_size=5,
                           cnn_dilations=(1, 1, 1, 1, 1)), variables)
    np.testing.assert_allclose(ones, ref, rtol=1e-6, atol=1e-6)
    dil = fwd(gp_model_1d("ConvCNP", cnn_kernel_size=5,
                          cnn_dilations=(1, 1, 2, 4, 8)), variables)
    assert np.abs(dil - ref).max() > 1e-4


def test_gp_model_1d_cnn_arch_unet_reaches_model():
    """gp_model_1d(cnn_arch='unet') must swap the induced-grid CNN for
    UnetCNN (multi-scale skip architecture) — pinned by param structure:
    the U-Net doubles channels per down level (128 -> 256 at r_dim=128),
    which the flat CNN stack never does, and the forward pass must run."""
    from npf_gwwaveform_tpu.configs import gp_model_1d

    key = jax.random.PRNGKey(0)
    x = np.zeros((2, 16, 1), dtype=np.float32)
    y = np.zeros((2, 16, 1), dtype=np.float32)
    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=0.0, b=8), targets_getter=get_all_indcs
    )
    batch = splitter(key, x, y)
    model = gp_model_1d("ConvCNP", cnn_arch="unet")
    variables = model.init(
        key, batch["X_cntxt"], batch["Y_cntxt"], batch["X_trgt"],
        mask_cntxt=batch["mask_cntxt"], mask_trgt=batch["mask_trgt"],
    )
    widths = {
        leaf.shape[-1]
        for leaf in jax.tree_util.tree_leaves(variables["params"])
        if leaf.ndim >= 2
    }
    assert 256 in widths, widths  # U-Net channel doubling reached the model
    out = model.apply(
        variables, batch["X_cntxt"], batch["Y_cntxt"], batch["X_trgt"],
        mask_cntxt=batch["mask_cntxt"], mask_trgt=batch["mask_trgt"],
        train=False,
    )
    assert np.isfinite(np.asarray(out.p_yCc.loc, dtype=np.float32)).all()


def test_gp_model_1d_cnn_remat_numerics_unchanged():
    """gp_model_1d(cnn_remat=True) (jax.checkpoint on each grid-CNN block)
    must share the exact param tree with the plain model and produce
    identical forward outputs AND gradients — remat is a memory lever, not
    an architecture change. The jaxpr must actually contain the remat call
    (a silent no-op would pass the numeric check)."""
    from npf_gwwaveform_tpu.configs import gp_model_1d
    from npf_gwwaveform_tpu.losses import CNPFLoss

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    x = np.sort(rng.uniform(-1, 1, (2, 16, 1)).astype(np.float32), axis=1)
    y = rng.randn(2, 16, 1).astype(np.float32)
    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=4.0, b=8), targets_getter=get_all_indcs
    )
    batch = splitter(key, x, y)
    init_args = (batch["X_cntxt"], batch["Y_cntxt"], batch["X_trgt"])
    init_kwargs = dict(mask_cntxt=batch["mask_cntxt"], mask_trgt=batch["mask_trgt"])

    base = gp_model_1d("ConvCNP", cnn_kernel_size=5)
    remat = gp_model_1d("ConvCNP", cnn_kernel_size=5, cnn_remat=True)
    variables = base.init(key, *init_args, **init_kwargs)
    v2 = remat.init(key, *init_args, **init_kwargs)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)

    criterion = CNPFLoss()

    def loss_fn(model):
        def f(params):
            out, _ = model.apply(
                {**variables, "params": params}, *init_args,
                **init_kwargs, train=True, mutable=["batch_stats"],
            )
            return criterion(out, batch["Y_trgt"], batch["mask_trgt"], train=True)
        return f

    l0, g0 = jax.value_and_grad(loss_fn(base))(variables["params"])
    l1, g1 = jax.value_and_grad(loss_fn(remat))(variables["params"])
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    # grads agree to f32 reassociation noise (recompute reorders reductions;
    # measured max-abs ~1e-4 on O(1-10) grads)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=3e-4)
    assert "remat" in str(jax.make_jaxpr(loss_fn(remat))(variables["params"]))


def test_cnn_banded_depthwise_numerics_match():
    """ConvCNP(cnn_banded=True) — the MXU banded-matmul lowering of the
    grid CNN's depthwise convs (ops/cnn.py _BandedDepthwise) — must share
    the exact param tree with the grouped-conv model (checkpoints
    interchangeable) and produce the same forward/gradients to f32
    rounding: it is a throughput lever, not an architecture change."""
    from npf_gwwaveform_tpu import ConvCNP
    from npf_gwwaveform_tpu.losses import CNPFLoss

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    x = np.sort(rng.uniform(-1, 1, (2, 16, 1)).astype(np.float32), axis=1)
    y = rng.randn(2, 16, 1).astype(np.float32)
    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=4.0, b=8), targets_getter=get_all_indcs
    )
    batch = splitter(key, x, y)
    init_args = (batch["X_cntxt"], batch["Y_cntxt"], batch["X_trgt"])
    init_kwargs = dict(mask_cntxt=batch["mask_cntxt"], mask_trgt=batch["mask_trgt"])

    kw = dict(y_dim=1, x_dim=1, r_dim=16, density_induced=8,
              cnn_n_blocks=2, cnn_kernel_size=5)
    base = ConvCNP(**kw)
    banded = ConvCNP(**kw, cnn_banded=True)
    variables = base.init(key, *init_args, **init_kwargs)
    v2 = banded.init(key, *init_args, **init_kwargs)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(v2)):
        assert a.shape == b.shape

    criterion = CNPFLoss()

    def loss_fn(model):
        def f(params):
            out, _ = model.apply(
                {**variables, "params": params}, *init_args,
                **init_kwargs, train=True, mutable=["batch_stats"],
            )
            return criterion(out, batch["Y_trgt"], batch["mask_trgt"], train=True)
        return f

    l0, g0 = jax.value_and_grad(loss_fn(base))(variables["params"])
    l1, g1 = jax.value_and_grad(loss_fn(banded))(variables["params"])
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=3e-4)
    # the banded lowering must actually be in the program (einsum/dot), i.e.
    # no grouped conv left for the depthwise stages
    jaxpr = str(jax.make_jaxpr(loss_fn(banded))(variables["params"]))
    assert "feature_group_count=16" not in jaxpr


def test_banded_depthwise_matches_grouped_conv_with_dilation():
    """_BandedDepthwise must equal the grouped nn.Conv depthwise for
    dilated kernels too (the multi-scale GW configs)."""
    import flax.linen as nn

    from npf_gwwaveform_tpu.ops.cnn import DepthSepConv

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 24, 8))
    # Even kernel sizes exercise XLA's asymmetric SAME padding
    # (pad_low = ((k-1)*dil)//2 != (k//2)*dil), which the band must mirror.
    for k, dil in [(5, 1), (5, 2), (5, 4), (4, 1), (4, 2), (6, 3)]:
        a = DepthSepConv(8, k, dilation=dil)
        b = DepthSepConv(8, k, dilation=dil, banded=True)
        va = a.init(key, x)
        out_a = a.apply(va, x)
        out_b = b.apply(va, x)  # same params by construction
        np.testing.assert_allclose(
            np.asarray(out_b), np.asarray(out_a), rtol=2e-5, atol=2e-6,
            err_msg=f"k={k} dil={dil}",
        )

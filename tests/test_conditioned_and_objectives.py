"""Parameter-conditioned NPs (BASELINE config 5) + remaining objectives
(ELBO/NPVI with q_zCct, SUMO) exercised in real training steps."""

import jax
import jax.numpy as jnp
import numpy as np

from npf_gwwaveform_tpu import CNP, LNP, ConvCNP
from npf_gwwaveform_tpu.data import (
    CntxtTrgtSplitter,
    GetRandomIndcs,
    GPDataset,
    GPSampler,
    GWWaveformDataset,
    GWWaveformGenerator,
    get_all_indcs,
)
from npf_gwwaveform_tpu.losses import ELBOLossLNPF, NLLLossLNPF, SUMOLossLNPF
from npf_gwwaveform_tpu.training import Trainer, create_train_state, make_optimizer


def _splitter(a=3, b=12):
    return CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=a, b=b), targets_getter=get_all_indcs
    )


def test_conditioned_cnp_responds_to_condition(key):
    model = CNP(y_dim=2, x_dim=1, r_dim=32, cond_dim=4)
    B, N = 2, 16
    x = jax.random.uniform(key, (B, N, 1), minval=-1, maxval=1)
    y = jax.random.normal(key, (B, N, 2))
    cond1 = jnp.zeros((B, 4))
    cond2 = jnp.ones((B, 4))
    variables = model.init(
        {"params": key, "latent": key}, x, y, x, condition=cond1
    )
    out1 = model.apply(
        variables, x, y, x, condition=cond1, rngs={"latent": key}
    )
    out2 = model.apply(
        variables, x, y, x, condition=cond2, rngs={"latent": key}
    )
    diff = float(jnp.abs(out1.p_yCc.loc - out2.p_yCc.loc).max())
    assert diff > 1e-4  # conditioning visibly changes predictions


def test_conditioned_gw_dual_output_trains():
    """Config 5: dual-output (amplitude+phase) NP over frequency-domain
    waveforms conditioned on the mass/spin parameters."""
    gen = GWWaveformGenerator(duration=1.0, sample_rate=512.0)
    ds = GWWaveformDataset(gen, mode="freq_ap", n_points=64, n_samples=64)
    model = CNP(y_dim=2, x_dim=1, r_dim=32, cond_dim=4)
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    from npf_gwwaveform_tpu.losses import CNPFLoss

    trainer = Trainer(model, CNPFLoss(), tx, splitter=_splitter())
    x, y, p = next(ds.epoch_batches_conditioned(16))
    batch = _splitter()(jax.random.PRNGKey(0), x, y, condition=p)
    state = create_train_state(model, tx, batch, seed=0)
    losses = []
    for x, y, p in ds.epoch_batches_conditioned(16):
        state, m = trainer.train_step_cond(state, x, y, p)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()


def _tiny_gp():
    return GPDataset(
        GPSampler(kernel="rbf", length_scale=0.2, n_points=24), 48, seed=0
    )


def test_elbo_npvi_training():
    """NPVI requires q(z|C,T): is_q_zCct=True + ELBOLossLNPF
    (reference losses.py:126-150)."""
    ds = _tiny_gp()
    model = LNP(
        y_dim=1, x_dim=1, r_dim=24, is_q_zCct=True, n_z_samples_train=4,
        n_z_samples_test=4,
    )
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, ELBOLossLNPF(), tx, splitter=_splitter(b=8))
    x, y = next(ds.epoch_batches(16))
    batch = _splitter(b=8)(jax.random.PRNGKey(0), x, y)
    state = create_train_state(model, tx, batch, seed=0)
    for _ in range(3):
        for x, y in ds.epoch_batches(16):
            state, m = trainer.train_step(state, x, y)
    assert np.isfinite(float(m["loss"]))
    # eval forces NPML (losses.py:63-69): per-datapoint [B]
    per = trainer.eval_step(state, x, y, jax.random.PRNGKey(1))
    assert per.shape == (16,) and np.isfinite(np.asarray(per)).all()


def test_npml_importance_sampling_training():
    """NPML with q_zCct sampling -> importance weights (losses.py:184-194)."""
    ds = _tiny_gp()
    model = LNP(
        y_dim=1, x_dim=1, r_dim=24, is_q_zCct=True, n_z_samples_train=4
    )
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, NLLLossLNPF(), tx, splitter=_splitter(b=8))
    x, y = next(ds.epoch_batches(16))
    batch = _splitter(b=8)(jax.random.PRNGKey(0), x, y)
    state = create_train_state(model, tx, batch, seed=0)
    for x, y in ds.epoch_batches(16):
        state, m = trainer.train_step(state, x, y)
    assert np.isfinite(float(m["loss"]))


def test_sumo_inv_weights_match_reference():
    """The survival function P(K >= k) must match the reference's
    LightTailPareto(a=5).freeze(85) exactly (npf/utils/helpers.py:35-51):
    reverse-CDF = 1 - cdf(k-1), support lower bound m=5, tail shape 85."""
    import sys

    import pytest

    from npf_gwwaveform_tpu.losses import light_tail_pareto_inv_weights

    ours = light_tail_pareto_inv_weights(120, m=5, alpha=85)
    # hand-pinned values from the reference formula: sf=1 through k=m+1,
    # then 1/(k-m), then the 0.9-geometric tail past alpha-m
    np.testing.assert_allclose(ours[:9], [1, 1, 1, 1, 1, 1, 1 / 2, 1 / 3, 1 / 4])
    np.testing.assert_allclose(ours[84], 1 / 80)  # k=85, kk=80 = alpha' boundary
    np.testing.assert_allclose(ours[100], (1 / 80) * 0.9 ** (96 - 80))

    sys.path.insert(0, "/root/reference")
    try:
        helpers = pytest.importorskip("npf.utils.helpers")
    finally:
        sys.path.remove("/root/reference")
    dist = helpers.LightTailPareto(a=5).freeze(85)
    ks = np.arange(1, 121)[:, None]
    ref = (1 - dist.cdf(ks - 1)).squeeze(-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_sumo_training():
    """SUMO Russian-roulette estimator with n_z > m=5 (losses.py:207-276)."""
    ds = _tiny_gp()
    model = LNP(y_dim=1, x_dim=1, r_dim=16, n_z_samples_train=96)
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, SUMOLossLNPF(), tx, splitter=_splitter(b=8))
    x, y = next(ds.epoch_batches(8))
    batch = _splitter(b=8)(jax.random.PRNGKey(0), x, y)
    state = create_train_state(model, tx, batch, seed=0)
    state, m = trainer.train_step(state, x, y)
    assert np.isfinite(float(m["loss"]))


def test_convcnp_extrapolation_via_induced_range():
    """set_extrapolation equivalent: trained ConvCNP params apply unchanged
    to a clone with a wider induced_range at the same density
    (reference convnp.py:170-181)."""
    model = ConvCNP(
        y_dim=1, x_dim=1, r_dim=16, density_induced=16, cnn_n_blocks=2,
        cnn_kernel_size=5,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 16, 1), minval=-1, maxval=1)
    y = jax.random.normal(key, (2, 16, 1))
    variables = model.init({"params": key, "latent": key}, x, y, x)

    wide = model.clone(induced_range=(-2.0, 2.0))
    assert wide.n_induced == 64  # same density, wider range
    x_wide = jnp.linspace(-1.8, 1.8, 24)[None, :, None].repeat(2, 0)
    out = wide.apply(
        variables, x, y, x_wide, train=False, rngs={"latent": key}
    )
    assert out.p_yCc.loc.shape == (1, 2, 24, 1)
    assert bool(jnp.isfinite(out.p_yCc.loc).all())


def test_gw_model_1d_configs_build_and_forward(key):
    """configs.gw_model_1d: the measured-best GW configuration per family
    (FiLM for conv, additive otherwise, unbounded latent scale for latent
    models — the diagnosed LatLB phase-precision rule, RESULTS.md)."""
    from npf_gwwaveform_tpu.configs import gw_model_1d

    B, N = 2, 24
    x = jnp.linspace(-1, 1, N)[None, :, None].repeat(B, 0)
    y = jnp.sin(8 * x)
    cond = jnp.zeros((B, 4))
    for name in ("CNP", "LNP", "AttnCNP", "AttnLNP", "ConvCNP", "ConvLNP"):
        model = gw_model_1d(name, r_dim=16, density_induced=16)
        if name in ("LNP", "AttnLNP", "ConvLNP"):
            assert model.lat_scale_transform == "softplus"
            assert model.min_lat_sigma == 1e-4
        assert model.cond_mode == ("film" if name.startswith("Conv") else "add")
        variables = model.init(
            {"params": key, "latent": key}, x, y, x, condition=cond
        )
        out = model.apply(
            variables, x, y, x, condition=cond, train=False,
            rngs={"latent": key},
        )
        assert np.isfinite(np.asarray(out.p_yCc.loc)).all()

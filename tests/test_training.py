"""End-to-end training slice + multi-device data-parallel tests.

This substitutes for the reference's reproducibility-notebook integration
tests (SURVEY.md §4): train CNP on a small GP task and require the loss to
drop; run the same compiled step over an 8-device CPU mesh and require
numerically identical-per-element results shapes + finite metrics.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
from npf_gwwaveform_tpu.losses import CNPFLoss, NLLLossLNPF
from npf_gwwaveform_tpu.parallel import make_mesh
from npf_gwwaveform_tpu.training import (
    Trainer,
    create_train_state,
    eval_loglike,
    make_optimizer,
    train_models,
)


def _gp_data(n=128, n_points=32):
    sampler = GPSampler(kernel="rbf", length_scale=0.2, n_points=n_points)
    return GPDataset(sampler, n, is_reuse_across_epochs=True, seed=0)


def _splitter():
    return CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=3, b=12), targets_getter=get_all_indcs
    )


def test_cnp_trains_on_gp():
    ds = _gp_data()
    model = CNP(y_dim=1, x_dim=1, r_dim=32)
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, CNPFLoss(), tx, splitter=_splitter())

    x, y = next(ds.epoch_batches(16))
    batch = _splitter()(jax.random.PRNGKey(0), x, y)
    state = create_train_state(model, tx, batch, seed=0)

    first, last = None, None
    for epoch in range(30):
        for x, y in ds.epoch_batches(16):
            state, m = trainer.train_step(state, x, y)
            if first is None:
                first = float(m["loss"])
    last = float(m["loss"])
    assert np.isfinite(last)
    assert last < first - 1.0, (first, last)


def test_lnp_npml_trains():
    ds = _gp_data(n=64)
    model = LNP(y_dim=1, x_dim=1, r_dim=32, n_z_samples_train=4, n_z_samples_test=4)
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, NLLLossLNPF(), tx, splitter=_splitter())
    x, y = next(ds.epoch_batches(16))
    batch = _splitter()(jax.random.PRNGKey(0), x, y)
    state = create_train_state(model, tx, batch, seed=0)
    for _ in range(10):
        for x, y in ds.epoch_batches(16):
            state, m = trainer.train_step(state, x, y)
    assert np.isfinite(float(m["loss"]))


def test_data_parallel_mesh_training():
    """Same train step compiled over an 8-device mesh: batch sharded on the
    data axis, params replicated, gradients psum'd by XLA."""
    assert jax.device_count() >= 8
    mesh = make_mesh(axes={"data": 8})
    ds = _gp_data(n=64)
    model = CNP(y_dim=1, x_dim=1, r_dim=32)
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, CNPFLoss(), tx, splitter=_splitter(), mesh=mesh)
    x, y = next(ds.epoch_batches(16))
    batch = _splitter()(jax.random.PRNGKey(0), x, y)
    state = create_train_state(model, tx, batch, seed=0)
    for _ in range(3):
        for x, y in ds.epoch_batches(16):
            state, m = trainer.train_step(state, x, y)
    assert np.isfinite(float(m["loss"]))
    # eval path over the mesh
    k = jax.random.PRNGKey(1)
    per_fn = trainer.eval_step(state, x, y, k)
    assert per_fn.shape == (16,)


def test_data_parallel_equivalence():
    """1-device vs 8-device mesh: SAME seed + SAME data must give the SAME
    loss trace over 20 steps (to f32 reduction tolerance). This is the test
    that catches psum/sharding bugs — execution alone can't (VERDICT r1 §7)."""
    assert jax.device_count() >= 8
    model = CNP(y_dim=1, x_dim=1, r_dim=32)
    tx = make_optimizer(lr=1e-3, decay_lr=None)

    key = jax.random.PRNGKey(7)
    xs = jax.random.uniform(key, (20, 16, 24, 1), minval=-1, maxval=1)
    ys = jax.random.normal(jax.random.PRNGKey(8), (20, 16, 24, 1))

    def run(mesh):
        trainer = Trainer(model, CNPFLoss(), tx, splitter=_splitter(), mesh=mesh)
        batch = _splitter()(jax.random.PRNGKey(0), xs[0], ys[0])
        state = create_train_state(model, tx, batch, seed=0)
        losses = []
        for i in range(xs.shape[0]):
            state, m = trainer.train_step(state, xs[i], ys[i])
            losses.append(float(m["loss"]))
        return np.asarray(losses)

    single = run(None)
    sharded = run(make_mesh(axes={"data": 8}))
    assert np.isfinite(single).all()
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=2e-4)


def test_data_parallel_equivalence_convcnp_batchnorm():
    """Conv-family DP equivalence: ConvCNP's grid CNN uses BatchNorm, the
    classic data-parallel failure class (per-shard batch statistics). Under
    jit-over-mesh the batch-stat reductions must be GLOBAL (XLA inserts the
    cross-device collectives for the written-as-global program), so the
    8-device loss trace must match 1-device bit-for-bit up to f32 reduction
    order — unlike torch DDP, where unsynced BatchNorm silently diverges."""
    assert jax.device_count() >= 8
    model = ConvCNP(y_dim=1, x_dim=1, r_dim=16, density_induced=8)
    tx = make_optimizer(lr=1e-3, decay_lr=None)

    xs = jax.random.uniform(
        jax.random.PRNGKey(7), (6, 16, 24, 1), minval=-1, maxval=1
    )
    ys = jax.random.normal(jax.random.PRNGKey(8), (6, 16, 24, 1))

    def run(mesh):
        trainer = Trainer(model, CNPFLoss(), tx, splitter=_splitter(), mesh=mesh)
        batch = _splitter()(jax.random.PRNGKey(0), xs[0], ys[0])
        state = create_train_state(model, tx, batch, seed=0)
        losses = []
        for i in range(xs.shape[0]):
            state, m = trainer.train_step(state, xs[i], ys[i])
            losses.append(float(m["loss"]))
        return np.asarray(losses)

    single = run(None)
    sharded = run(make_mesh(axes={"data": 8}))
    assert np.isfinite(single).all()
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=2e-4)


def test_data_parallel_equivalence_lnp_latent_rng():
    """Latent-family DP equivalence: LNP under NPML draws z-samples with
    jax.random inside the jitted step. Keys live replicated in TrainState,
    so the per-step sample draws must be identical 1-vs-8-device — pins
    RNG-under-mesh determinism (a per-shard-keys bug would silently change
    the MC objective, not crash)."""
    assert jax.device_count() >= 8
    model = LNP(y_dim=1, x_dim=1, r_dim=16, n_z_samples_train=4)
    tx = make_optimizer(lr=1e-3, decay_lr=None)

    xs = jax.random.uniform(
        jax.random.PRNGKey(7), (6, 16, 24, 1), minval=-1, maxval=1
    )
    ys = jax.random.normal(jax.random.PRNGKey(8), (6, 16, 24, 1))

    def run(mesh):
        trainer = Trainer(
            model, NLLLossLNPF(), tx, splitter=_splitter(), mesh=mesh
        )
        batch = _splitter()(jax.random.PRNGKey(0), xs[0], ys[0])
        state = create_train_state(model, tx, batch, seed=0)
        losses = []
        for i in range(xs.shape[0]):
            state, m = trainer.train_step(state, xs[i], ys[i])
            losses.append(float(m["loss"]))
        return np.asarray(losses)

    single = run(None)
    sharded = run(make_mesh(axes={"data": 8}))
    assert np.isfinite(single).all()
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=2e-4)


def test_train_models_harness(tmp_path):
    """The full train_models loop: artifacts (history.json, eval.csv,
    model_summary.txt, checkpoints) in the reference's run-dir layout."""
    ds = _gp_data(n=64)
    test_ds = _gp_data(n=32)
    out = train_models(
        datasets={"RBF_tiny": ds},
        models={"CNP": CNP(y_dim=1, x_dim=1, r_dim=32)},
        criterion=CNPFLoss(),
        test_datasets={"RBF_tiny": test_ds},
        valid_datasets={"RBF_tiny": _gp_data(n=32)},
        splitter=_splitter(),
        chckpnt_dirname=str(tmp_path),
        max_epochs=2,
        batch_size=16,
        verbose=0,
    )
    run_dir = tmp_path / "RBF_tiny" / "CNP" / "run_0"
    assert (run_dir / "history.json").exists()
    assert (run_dir / "eval.csv").exists()
    assert (run_dir / "model_summary.txt").exists()
    assert (run_dir / "state.msgpack").exists()
    lls = np.loadtxt(run_dir / "eval.csv", delimiter=",")
    assert lls.shape == (32,)
    assert "RBF_tiny/CNP/run_0" in out


def test_load_run_params_roundtrip(tmp_path):
    """load_run_params (the scoring scripts' single hydration path) must
    restore params + extra_vars written by a finished run into a fresh
    template state."""
    import flax.serialization

    from npf_gwwaveform_tpu.training import load_run_params

    ds = _gp_data(n=32)
    model = CNP(y_dim=1, x_dim=1, r_dim=32)
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    x, y = ds.get_samples()[0][:16], ds.get_samples()[1][:16]
    batch = _splitter()(jax.random.PRNGKey(0), x, y)
    trained = create_train_state(model, tx, batch, seed=0)
    trainer = Trainer(model, CNPFLoss(), tx, splitter=_splitter())
    trained, _ = trainer.train_step(trained, x, y)

    run_dir = tmp_path / "run_0"
    run_dir.mkdir()
    with open(run_dir / "params.msgpack", "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(trained.params)))

    fresh = create_train_state(model, tx, batch, seed=1)  # different init
    loaded = load_run_params(str(run_dir), fresh)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(loaded.params),
        jax.device_get(trained.params),
    )


def test_gw_cnp_end_to_end():
    """BASELINE.json config 1: CNP regressing h+(t) — a few steps must run
    and produce finite loss."""
    gen = GWWaveformGenerator(duration=1.0, sample_rate=512.0)
    ds = GWWaveformDataset(gen, mode="time", n_points=64, n_samples=64)
    model = CNP(y_dim=1, x_dim=1, r_dim=32)
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, CNPFLoss(), tx, splitter=_splitter())
    x, y = next(ds.epoch_batches(16))
    batch = _splitter()(jax.random.PRNGKey(0), x, y)
    state = create_train_state(model, tx, batch, seed=0)
    for x, y in ds.epoch_batches(16):
        state, m = trainer.train_step(state, x, y)
    assert np.isfinite(float(m["loss"]))


def test_scanned_train_steps():
    """One-dispatch epoch: scan over stacked batches must train identically
    in spirit (finite, decreasing) to the per-step loop."""
    ds = _gp_data(n=64, n_points=16)
    model = CNP(y_dim=1, x_dim=1, r_dim=16)
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, CNPFLoss(), tx, splitter=_splitter())
    x, y = next(ds.epoch_batches(16))
    batch = _splitter()(jax.random.PRNGKey(0), x, y)
    state = create_train_state(model, tx, batch, seed=0)

    xs, ys = [], []
    for _ in range(3):
        for x, y in ds.epoch_batches(16):
            xs.append(x)
            ys.append(y)
    xs = jnp.stack(xs)
    ys = jnp.stack(ys)
    state, losses = trainer.train_steps_scanned(state, xs, ys)
    losses = np.asarray(losses)
    assert losses.shape == (xs.shape[0],)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_generated_train_steps():
    """Fully on-device loop: sampling inside the scan."""
    sampler = GPSampler(kernel="rbf", length_scale=0.2, n_points=16)
    model = CNP(y_dim=1, x_dim=1, r_dim=16)
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, CNPFLoss(), tx, splitter=_splitter())
    x, y = sampler.sample(jax.random.PRNGKey(0), 16)
    batch = _splitter()(jax.random.PRNGKey(0), x, y)
    state = create_train_state(model, tx, batch, seed=0)

    sample_fn = lambda k: sampler.sample(k, 16)
    state, losses = trainer.train_steps_generated(state, sample_fn, 20)
    assert np.isfinite(np.asarray(losses)).all()


def test_sequence_parallel_equivalence_convcnp():
    """data x seq 2-D mesh: targets constrained to P('data','seq')
    (SURVEY.md §5.7 — the time axis is a shardable mesh dimension for long
    waveforms). The grid->target decode and the loss partition over `seq`
    with a psum in the reduction; the loss trace must match 1-device to f32
    reduction tolerance, else the constraint or the propagated collectives
    are wrong."""
    assert jax.device_count() >= 8
    model = ConvCNP(y_dim=1, x_dim=1, r_dim=16, density_induced=8)
    tx = make_optimizer(lr=1e-3, decay_lr=None)

    xs = jax.random.uniform(
        jax.random.PRNGKey(7), (6, 16, 24, 1), minval=-1, maxval=1
    )
    ys = jax.random.normal(jax.random.PRNGKey(8), (6, 16, 24, 1))

    def run(mesh):
        trainer = Trainer(model, CNPFLoss(), tx, splitter=_splitter(), mesh=mesh)
        batch = _splitter()(jax.random.PRNGKey(0), xs[0], ys[0])
        state = create_train_state(model, tx, batch, seed=0)
        losses = []
        for i in range(xs.shape[0]):
            state, m = trainer.train_step(state, xs[i], ys[i])
            losses.append(float(m["loss"]))
        return np.asarray(losses)

    single = run(None)
    sharded = run(make_mesh(axes={"data": 4, "seq": 2}))
    assert np.isfinite(single).all()
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=2e-4)

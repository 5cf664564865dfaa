"""Data-layer tests: GP sampler statistics, splitter semantics, GW generator
physics sanity (chirp structure, merger placement, mismatch metric)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npf_gwwaveform_tpu.data import (
    CntxtTrgtSplitter,
    GetRandomIndcs,
    GPSampler,
    GWParameterSpace,
    GWWaveformDataset,
    GWWaveformGenerator,
    RandomMasker,
    get_all_indcs,
    mismatch,
)


def test_gp_sampler_statistics(key):
    """Marginals of a GP draw must match the kernel: unit-ish variance and
    strong short-range correlation for RBF l=0.2."""
    s = GPSampler(kernel="rbf", length_scale=0.2, n_points=64)
    x, y = s.sample(key, 256)
    assert x.shape == (256, 64, 1) and y.shape == (256, 64, 1)
    x_np = np.asarray(x)
    assert x_np.min() >= -1.0 - 1e-6 and x_np.max() <= 1.0 + 1e-6
    assert np.all(np.diff(x_np[:, :, 0], axis=1) >= 0)  # sorted features
    var = np.var(np.asarray(y))
    assert 0.8 < var < 1.25  # K(0)=1 + alpha jitter


def test_gp_kernels_all_run(key):
    for kern in ["rbf", "periodic", "matern", "noisy_matern", "variable_matern"]:
        s = GPSampler(kernel=kern, n_points=32)
        x, y = s.sample(key, 8)
        assert np.isfinite(np.asarray(y)).all(), kern


def test_gp_extrapolation_range(key):
    """test_min_max beyond the train range must give |x| > 1 coords."""
    s = GPSampler(kernel="rbf", length_scale=0.2, n_points=32, min_max=(-2, 2))
    x, _ = s.sample(key, 4, min_max=(-4.0, 4.0))
    assert np.asarray(x).max() > 1.5


def test_random_indcs_count_distribution(key):
    """Count must be shared across the batch; positions independent
    (ref datasplit.py:129-139)."""
    g = GetRandomIndcs(a=0, b=50)
    mask = g(key, 16, 128)
    counts = np.asarray(mask.sum(-1))
    assert (counts == counts[0]).all()
    assert 0 <= counts[0] <= 50
    # positions differ across elements (overwhelmingly likely)
    if counts[0] > 5:
        assert not np.array_equal(np.asarray(mask[0]), np.asarray(mask[1]))


def test_random_indcs_indep_n(key):
    """is_indep_n: the count is drawn PER ELEMENT with the same U{a..b}
    marginal (the unbiased eval protocol; see GetRandomIndcs docstring)."""
    import jax

    g = GetRandomIndcs(a=0, b=50, is_indep_n=True)
    counts = []
    for i in range(64):
        mask = g(jax.random.fold_in(key, i), 32, 128)
        counts.append(np.asarray(mask.sum(-1)))
    counts = np.concatenate(counts)  # 2048 per-element counts
    assert counts.min() >= 0 and counts.max() <= 50
    # per-element counts vary within a batch
    assert len(np.unique(counts[:32])) > 5
    # unbiased marginal: mean within 3 SE of 25
    se = counts.std() / np.sqrt(counts.size)
    assert abs(counts.mean() - 25.0) < 3 * se + 1.0


def test_splitter_shapes(key):
    s = GPSampler(kernel="rbf", n_points=64)
    x, y = s.sample(key, 8)
    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=0.1, b=0.5), targets_getter=get_all_indcs
    )
    batch = splitter(key, x, y)
    assert batch["mask_cntxt"].shape == (8, 64)
    assert bool(batch["mask_trgt"].all())
    assert batch["X_cntxt"].shape == (8, 64, 1)


def test_grid_masker(key):
    m = RandomMasker(a=0.1, b=0.3)(key, 4, (8, 8))
    assert m.shape == (4, 8, 8)
    counts = np.asarray(m.reshape(4, -1).sum(-1))
    assert ((counts >= 6) & (counts <= 20)).all()


# ------------------------------------------------------------------- GW


@pytest.fixture(scope="module")
def gen():
    return GWWaveformGenerator(duration=1.0, sample_rate=1024.0)


def test_gw_time_domain_structure(gen):
    theta = jnp.array([[30.0, 25.0, 0.0, 0.0], [60.0, 40.0, 0.4, -0.2]])
    _, h = gen.time_domain(theta)
    hn = np.asarray(h)
    assert np.isfinite(hn).all()
    n = hn.shape[-1]
    peak = np.abs(hn).argmax(-1) / n
    # merger placed at ~t_merge_frac of the window
    assert np.all(np.abs(peak - gen.t_merge_frac) < 0.05)
    # chirp: zero-crossing spacing decreases towards merger
    h0 = hn[0][: int(0.8 * n)]
    zc = np.where(np.diff(np.sign(h0)))[0]
    gaps = np.diff(zc)
    assert gaps[:3].mean() > gaps[-3:].mean()


def test_gw_frequency_domain(gen):
    theta = GWParameterSpace().sample(jax.random.PRNGKey(0), 4)
    fd = gen.frequency_domain(theta, n_f=128)
    amp, psi = np.asarray(fd.amplitude), np.asarray(fd.phase)
    assert np.isfinite(amp).all() and np.isfinite(psi).all()
    assert np.allclose(amp.max(-1), 1.0)  # peak-normalized
    # mass ordering: heavier system rings down at lower frequency => its
    # amplitude support ends earlier in the band
    heavy = gen.frequency_domain(jnp.array([[75.0, 70.0, 0.0, 0.0]]), n_f=128)
    light = gen.frequency_domain(jnp.array([[12.0, 10.0, 0.0, 0.0]]), n_f=128)
    f = np.asarray(heavy.freqs)
    f_support_heavy = f[np.asarray(heavy.amplitude[0]) > 1e-3].max()
    f_support_light = f[np.asarray(light.amplitude[0]) > 1e-3].max()
    assert f_support_heavy < f_support_light


def test_gw_mismatch_metric(gen):
    theta = jnp.array([[30.0, 25.0, 0.0, 0.0], [31.0, 25.0, 0.0, 0.0], [70.0, 60.0, 0.5, 0.5]])
    _, h = gen.time_domain(theta)
    assert float(mismatch(h[0], h[0])) < 1e-5
    close = float(mismatch(h[0], h[1]))
    far = float(mismatch(h[0], h[2]))
    assert close < far  # nearby parameters -> smaller mismatch


def test_exact_topn_mask_tie_boundary():
    """exact_topn_mask's lexicographic threshold must select the SAME set as
    the stable rank construction even when f32 score ties span the count
    boundary — the case a value-only threshold over-selects (the reason the
    fast sort_threshold variant was originally rejected; step_variants)."""
    from npf_gwwaveform_tpu.data.datasplit import exact_topn_mask

    # row 0: ties exactly AT the boundary (n=3 among four 0.2s);
    # row 1: all-equal scores; row 2: no ties
    scores = jnp.array([
        [0.5, 0.2, 0.2, 0.9, 0.2, 0.2, 0.1, 0.8],
        [0.3, 0.3, 0.3, 0.3, 0.3, 0.3, 0.3, 0.3],
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8],
    ])
    for n in [jnp.array([[3], [3], [3]]), jnp.array([[0], [5], [8]])]:
        got = exact_topn_mask(scores, n, 8, 3)
        ranks = jnp.argsort(jnp.argsort(scores, axis=-1, stable=True), axis=-1)
        want = ranks < n
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gw_fd_mismatch_metric(gen):
    """mismatch_fd: gauge-invariant (time + phase shifts) matched-filter
    metric for the freq_ap dual-output config (reproduce_gw.py eval)."""
    from npf_gwwaveform_tpu.data import mismatch_fd, psd_aligo

    theta = GWParameterSpace().sample(jax.random.PRNGKey(3), 3)
    fd = gen.frequency_domain(theta, n_f=256)
    h = fd.amplitude * jnp.exp(-1j * fd.phase)
    psd = psd_aligo(fd.freqs)
    # the physical-PSD shape must survive float32 (the 1e-49 prefactor
    # underflows; psd_aligo returns the shape in units of 1e-49)
    assert float(np.asarray(psd).min()) > 0
    assert float(np.asarray(mismatch_fd(h, h, psd=psd)).max()) < 1e-5
    # gauge freedom: time shift (linear phase) and constant phase
    shifted = h * jnp.exp(2j * jnp.pi * fd.freqs * 3e-3 + 0.7j)
    assert float(np.asarray(mismatch_fd(shifted, h, psd=psd)).max()) < 1e-3
    # a 5% phase stretch is NOT gauge and must register
    warped = fd.amplitude * jnp.exp(-1.05j * fd.phase)
    assert float(np.asarray(mismatch_fd(warped, h, psd=psd)).min()) > 1e-4


def test_gw_dataset_modes(gen):
    for mode, y_dim in [("time", 1), ("freq_ap", 2)]:
        ds = GWWaveformDataset(gen, mode=mode, n_points=64, n_samples=32)
        x, y = next(ds.epoch_batches(8))
        assert x.shape == (8, 64, 1) and y.shape == (8, 64, y_dim)
        assert np.isfinite(np.asarray(y)).all()
        x3, y3, params = ds.get_samples(4)
        assert params.shape == (4, 4)
        assert np.abs(np.asarray(params)).max() <= 1.0 + 1e-6


def test_periodic_harmonic_sampler_covariance(key):
    """The exact Fourier-series periodic sampler must reproduce the analytic
    ExpSineSquared covariance (f32 Cholesky of this kernel fails at any
    usable jitter — the harmonic path is the only clean draw)."""
    from npf_gwwaveform_tpu.data.gp import expsinesquared_cov

    s = GPSampler(kernel="periodic", length_scale=0.5, periodicity=0.5, n_points=32)
    # fixed grid draws for an empirical covariance
    import jax.numpy as jnp

    xg = jnp.linspace(-2, 2, 32)[:, None]
    a = jnp.asarray(s._periodic_fourier_coeffs())
    m = jnp.arange(a.shape[0], dtype=jnp.float32)
    ang = 2 * jnp.pi * m[None, :] * xg / 0.5
    ys = []
    for k in jax.random.split(key, 3000):
        kc, ks_ = jax.random.split(k)
        xi = jax.random.normal(kc, (a.shape[0],))
        eta = jax.random.normal(ks_, (a.shape[0],))
        ys.append(jnp.cos(ang) @ (jnp.sqrt(a) * xi) + jnp.sin(ang) @ (jnp.sqrt(a) * eta))
    emp = np.cov(np.asarray(jnp.stack(ys)).T)
    ana = np.asarray(expsinesquared_cov(xg, 0.5, 0.5))
    assert np.abs(emp - ana).max() < 0.12  # MC noise at 3000 draws


def test_random_indcs_topk_path_bit_identical(key):
    """The static-count top_k mask construction (the fast path inside
    GetRandomIndcs.__call__) must be BIT-identical to the stable
    double-argsort ranks construction it replaced, across every config
    combo that reaches it — same keys, same masks, so all seeded
    runs/evals reproduce exactly."""

    def reference_mask(g, k, batch_size, n_points):
        # the pre-optimization construction, verbatim
        k_n, k_u, k_choice, k_perm = jax.random.split(k, 4)
        def to_count(v):
            c = int(v * n_points) if 0 <= v < 1 else int(v)
            return max(0, min(c, n_points))
        a, b = to_count(g.a), to_count(g.b)
        a = min(a, b)
        n_shape = (batch_size, 1) if g.is_indep_n else ()
        n = jax.random.randint(k_n, n_shape, a, b + 1)
        if g.is_ensure_one:
            n = jnp.maximum(n, 1)
        shape = (1, n_points) if g.is_batch_share else (batch_size, n_points)
        scores = jax.random.uniform(k_perm, shape)
        ranks = jnp.argsort(jnp.argsort(scores, axis=-1), axis=-1)
        return jnp.broadcast_to(ranks < n, (batch_size, n_points))

    configs = [
        dict(a=0, b=50),                       # flagship GP splitter
        dict(a=0, b=64, is_indep_n=True),       # eval protocol
        dict(a=0.05, b=0.3),                    # ratio counts
        dict(a=0, b=30, is_batch_share=True),
        dict(a=0, b=0, is_ensure_one=True),     # ub forced to 1
        dict(a=0, b=0),                         # ub == 0 -> empty mask
        dict(a=4, b=4),                         # fixed count
    ]
    for cfg in configs:
        g = GetRandomIndcs(**cfg)
        for s in range(25):
            k = jax.random.fold_in(key, s)
            got = g(k, 16, 128)
            want = reference_mask(g, k, 16, 128)
            assert bool((got == want).all()), cfg

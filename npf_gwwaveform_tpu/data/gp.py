"""On-device GP function sampler — replaces the reference's CPU sklearn
`GPDataset` (/root/reference/utils/data/gaussian_process.py:20-243), which is
its data-generation hot spot (SURVEY.md §3.1).

Behavioral parity:
* non-uniform sorted X ~ U(min_max) rescaled to [-1,1] (gaussian_process.py:189-200),
* jitter alpha=0.005 on the covariance diagonal (:100-102),
* kernel zoo used by the notebooks (ntbks_helpers.py:80-116): RBF(l=0.2),
  ExpSineSquared(l=0.5, p=0.5), White(0.1)+Matern(l=0.2, nu=1.5),
  Matern(l=0.2, nu=1.5), Variable-Matern with l ~ U[0.01, 0.3] per function,
* fresh chunk of functions per epoch (:109-120) — here a single jitted
  `sample(key, n)` call on device, so "fresh functions every epoch" costs
  one batched Cholesky instead of a sklearn loop,
* fixed test/valid chunks via a fixed key (reproducing the h5py-cached fixed
  test sets, :122-179).

TPU notes: the batched 128x128 Cholesky + triangular matmul is tiny on the
MXU; everything stays float32 (covariance conditioning) and on device.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.helpers import rescale_range

__all__ = [
    "GPSampler",
    "MixtureGPSampler",
    "GPDataset",
    "DatasetMerger",
    "get_gp_datasets",
]


# --------------------------------------------------------------- kernels


def _sq_dist(x: jax.Array) -> jax.Array:
    """x [n, 1] -> pairwise squared distances [n, n]."""
    d = x[:, None, 0] - x[None, :, 0]
    return d * d


def rbf_cov(x, length_scale):
    return jnp.exp(-0.5 * _sq_dist(x) / (length_scale**2))


def matern15_cov(x, length_scale):
    d = jnp.sqrt(_sq_dist(x) + 1e-12)
    z = math.sqrt(3.0) * d / length_scale
    return (1.0 + z) * jnp.exp(-z)


def matern25_cov(x, length_scale):
    d = jnp.sqrt(_sq_dist(x) + 1e-12)
    z = math.sqrt(5.0) * d / length_scale
    return (1.0 + z + z * z / 3.0) * jnp.exp(-z)


def expsinesquared_cov(x, length_scale, periodicity):
    d = jnp.sqrt(_sq_dist(x) + 1e-12)
    s = jnp.sin(jnp.pi * d / periodicity) / length_scale
    return jnp.exp(-2.0 * s * s)


def white_cov(x, noise_level):
    n = x.shape[0]
    return noise_level * jnp.eye(n)


@dataclass(frozen=True)
class GPSampler:
    """Batched GP function sampler, jit-compiled, fully on device.

    kernel: {"rbf", "periodic", "matern", "noisy_matern", "variable_matern"}
    """

    kernel: str = "rbf"
    n_points: int = 128
    min_max: Tuple[float, float] = (-2.0, 2.0)
    # `alpha` is the sklearn GaussianProcessRegressor regularizer — it only
    # enters the FITTED posterior (oracle plots), NOT prior function draws:
    # sklearn's sample_y on an unfitted GPR samples from the pure kernel
    # prior. sample_jitter is the tiny Cholesky stabilizer for the draws.
    alpha: float = 0.005
    sample_jitter: float = 1e-5  # smallest TPU-cholesky-stable value
    length_scale: float = 0.2
    periodicity: float = 0.5
    noise_level: float = 0.1
    nu: float = 1.5
    length_scale_bounds: Tuple[float, float] = (0.01, 0.3)

    def _cov(
        self, x: jax.Array, length_scale: jax.Array, jitter: Optional[float] = None
    ) -> jax.Array:
        if self.kernel == "rbf":
            k = rbf_cov(x, length_scale)
        elif self.kernel == "periodic":
            k = expsinesquared_cov(x, length_scale, self.periodicity)
        elif self.kernel in ("matern", "variable_matern"):
            k = matern15_cov(x, length_scale) if self.nu == 1.5 else matern25_cov(
                x, length_scale
            )
        elif self.kernel == "noisy_matern":
            k = matern15_cov(x, length_scale) + white_cov(x, self.noise_level)
        else:
            raise ValueError(f"Unknown kernel {self.kernel}")
        jit = self.sample_jitter if jitter is None else jitter
        return k + jit * jnp.eye(x.shape[0])

    @property
    def is_vary_kernel_hyp(self) -> bool:
        return self.kernel.startswith("variable")

    def _periodic_fourier_coeffs(self, n_harmonics: int = 32) -> np.ndarray:
        """EXACT spectral representation of ExpSineSquared: with
        z = 1/l^2,  k(d) = e^{-z} [I_0(z) + 2 sum_m I_m(z) cos(2 pi m d/p)]
        (Jacobi-Anger). Returns the harmonic variances a_m (sum = 1)."""
        from scipy.special import ive

        z = 1.0 / (self.length_scale**2)
        m = np.arange(n_harmonics)
        # ive = e^{-z} I_m(z), numerically stable for large z
        a = ive(m, z)
        a[1:] *= 2.0
        return a.astype(np.float32)

    def _sample_one(self, key: jax.Array, min_max) -> Tuple[jax.Array, jax.Array]:
        kx, kl, ky = jax.random.split(key, 3)
        x = jnp.sort(
            jax.random.uniform(
                kx, (self.n_points, 1), minval=min_max[0], maxval=min_max[1]
            ),
            axis=0,
        )
        if self.is_vary_kernel_hyp:
            lo, hi = self.length_scale_bounds
            ls = jax.random.uniform(kl, (), minval=lo, maxval=hi)
        else:
            ls = jnp.asarray(self.length_scale)

        if self.kernel == "periodic":
            # exact noise-free harmonic sampler (the periodic covariance is
            # too ill-conditioned for f32 Cholesky at ANY usable jitter)
            a = jnp.asarray(self._periodic_fourier_coeffs())
            m = jnp.arange(a.shape[0], dtype=jnp.float32)
            ang = 2.0 * jnp.pi * m[None, :] * x / self.periodicity  # [n, M]
            kc, ks_ = jax.random.split(ky)
            xi = jax.random.normal(kc, (a.shape[0],))
            eta = jax.random.normal(ks_, (a.shape[0],))
            sqrt_a = jnp.sqrt(a)
            y = (jnp.cos(ang) @ (sqrt_a * xi) + jnp.sin(ang) @ (sqrt_a * eta))
            return x, y[:, None]
        cov = self._cov(x, ls, jitter=0.0)
        # two-stage jittered Cholesky in full-f32 precision: the pure RBF
        # prior is near-singular and TPU's f32 factorization fails for rare
        # X draws at the base jitter; those fall back to 100x jitter (the
        # reference retries failed sklearn draws similarly,
        # gaussian_process.py:209-225)
        eye = jnp.eye(self.n_points)
        with jax.default_matmul_precision("highest"):
            chol1 = jnp.linalg.cholesky(cov + self.sample_jitter * eye)
            bad = ~jnp.all(jnp.isfinite(chol1))
            chol2 = jnp.linalg.cholesky(
                cov + 100.0 * self.sample_jitter * eye
            )
            chol = jnp.where(bad, chol2, chol1)
            eps = jax.random.normal(ky, (self.n_points, 1))
            y = chol @ eps
        # ultimate guard: a doubly-failed draw becomes white noise rather
        # than poisoning the training batch with NaNs
        y = jnp.where(jnp.all(jnp.isfinite(y)), y, eps)
        return x, y

    def posterior(self, x_cntxt, y_cntxt, x_test, length_scale=None):
        """Analytic GP posterior (mean, std) at x_test given context — the
        'oracle' overlay of the reference's 1-D plots (visualize_1d.py:205-223,
        which refits sklearn; here the kernel is known in closed form).

        All x in the model's [-1,1] coordinates; converted back to the
        kernel's native min_max units internally. Shapes: x_cntxt [n,1],
        y_cntxt [n,1], x_test [m,1] -> (mean [m], std [m]).
        """
        ls = jnp.asarray(
            self.length_scale if length_scale is None else length_scale
        )
        lo, hi = self.min_max
        to_native = lambda x: (x + 1.0) * 0.5 * (hi - lo) + lo
        xc, xt = to_native(x_cntxt), to_native(x_test)
        # the fitted-GPR regularizer alpha enters HERE (oracle posterior),
        # mirroring sklearn GaussianProcessRegressor(alpha=0.005).fit
        k_cc_noj = self._cov(xc, ls, jitter=self.alpha)
        both = jnp.concatenate([xc, xt], axis=0)
        k_all = self._cov(both, ls, jitter=0.0)
        n = xc.shape[0]
        k_ct = k_all[:n, n:]
        k_tt = k_all[n:, n:]
        sol = jnp.linalg.solve(k_cc_noj, jnp.concatenate([y_cntxt, k_ct], axis=1))
        mean = k_ct.T @ sol[:, :1]
        cov = k_tt - k_ct.T @ sol[:, 1:]
        std = jnp.sqrt(jnp.clip(jnp.diag(cov), 1e-10))
        return mean[:, 0], std

    @partial(jax.jit, static_argnames=("self", "n_samples", "min_max"))
    def sample(
        self,
        key: jax.Array,
        n_samples: int,
        min_max: Optional[Tuple[float, float]] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Sample n functions. Returns (x [n, n_points, 1] rescaled to [-1,1]
        in TRAIN range units, y [n, n_points, 1])."""
        mm = self.min_max if min_max is None else min_max
        keys = jax.random.split(key, n_samples)
        x, y = jax.vmap(lambda k: self._sample_one(k, mm))(keys)
        # rescale by the TRAIN range so eval on a wider range gives |x|>1
        # (extrapolation), matching ref _postprocessing_features + test_min_max
        x = rescale_range(x, self.min_max, (-1.0, 1.0))
        return x, y


@dataclass(frozen=True)
class MixtureGPSampler:
    """Uniform mixture over several GPSamplers — the on-device equivalent of
    the reference's All_Kernels DatasetMerger training stream
    (ntbks_helpers.py:118-126: RBF + Periodic + Noisy-Matern merged so one
    epoch interleaves all kernels). Each sampled function draws its kernel id
    uniformly; under vmap the `lax.switch` evaluates every branch and selects,
    which is fine on TPU (3 tiny covariance builds, one Cholesky each).

    For EVAL, match DatasetMerger's concatenation instead: evaluate each
    component's fixed test chunk separately and concatenate the rows
    (`components` is exposed for that)."""

    components: Tuple[GPSampler, ...]

    @property
    def n_points(self) -> int:
        return self.components[0].n_points

    @property
    def min_max(self):
        return self.components[0].min_max

    @partial(jax.jit, static_argnames=("self", "n_samples", "min_max"))
    def sample(
        self,
        key: jax.Array,
        n_samples: int,
        min_max: Optional[Tuple[float, float]] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        kid_key, key = jax.random.split(key)
        kids = jax.random.randint(kid_key, (n_samples,), 0, len(self.components))
        keys = jax.random.split(key, n_samples)

        branches = [
            (lambda k, s=s: s._sample_one(k, s.min_max if min_max is None else min_max))
            for s in self.components
        ]

        def one(kid, k):
            return jax.lax.switch(kid, branches, k)

        x, y = jax.vmap(one)(kids, keys)
        x = rescale_range(x, self.min_max, (-1.0, 1.0))
        return x, y


# --------------------------------------------------- dataset-style wrappers


class GPDataset:
    """Epoch-chunked dataset of GP functions mirroring the reference
    `GPDataset` API (fresh chunk per epoch unless `is_reuse_across_epochs`).

    Batches come out as device arrays; `get_samples` mirrors
    gaussian_process.py:122-172 (fixed chunks by fixed key, test_min_max
    override for extrapolation)."""

    def __init__(
        self,
        sampler: GPSampler,
        n_samples: int = 1000,
        is_reuse_across_epochs: bool = True,
        seed: int = 0,
    ):
        self.sampler = sampler
        self.n_samples = n_samples
        self.is_reuse_across_epochs = is_reuse_across_epochs
        self._key = jax.random.PRNGKey(seed)
        self._fixed = None
        if is_reuse_across_epochs:
            self._fixed = self.get_samples(n_samples)

    def __len__(self):
        return self.n_samples

    @property
    def n_points(self):
        return self.sampler.n_points

    def next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def get_samples(self, n_samples=None, test_min_max=None, key=None):
        n = self.n_samples if n_samples is None else n_samples
        k = self.next_key() if key is None else key
        return self.sampler.sample(k, n, min_max=test_min_max)

    def set_samples_(self, data, targets):
        self.is_reuse_across_epochs = True
        self._fixed = (data, targets)
        self.n_samples = data.shape[0]

    def epoch_batches(self, batch_size: int, key: Optional[jax.Array] = None):
        """Yield (x, y) batches for one epoch. Fresh functions per epoch when
        not reusing (ref gaussian_process.py:109-120)."""
        if self.is_reuse_across_epochs:
            x, y = self._fixed
            n = x.shape[0]
            for i in range(0, n - batch_size + 1, batch_size):
                yield x[i : i + batch_size], y[i : i + batch_size]
        else:
            n_batches = self.n_samples // batch_size
            k = self.next_key() if key is None else key
            for kb in jax.random.split(k, n_batches):
                yield self.sampler.sample(kb, batch_size)


class DatasetMerger:
    """Round-robin merge of several datasets (ref utils/data/helpers.py:18-39).
    Batches alternate between sources so one epoch covers all kernels."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.n_samples = sum(d.n_samples for d in self.datasets)

    def __len__(self):
        return self.n_samples

    @property
    def n_points(self):
        return self.datasets[0].n_points

    def get_samples(self, n_samples=None, test_min_max=None, key=None):
        per = (n_samples or self.n_samples) // len(self.datasets)
        xs, ys = zip(
            *[d.get_samples(per, test_min_max=test_min_max, key=key) for d in self.datasets]
        )
        return jnp.concatenate(xs, 0), jnp.concatenate(ys, 0)

    def epoch_batches(self, batch_size: int, key=None):
        iters = [d.epoch_batches(batch_size) for d in self.datasets]
        alive = list(iters)
        while alive:
            nxt = []
            for it in alive:
                try:
                    yield next(it)
                    nxt.append(it)
                except StopIteration:
                    pass
            alive = nxt


# notebook-parity dataset builders (ntbks_helpers.py:82-126)
KERNEL_CONFIGS = {
    "RBF_Kernel": dict(kernel="rbf", length_scale=0.2),
    "Periodic_Kernel": dict(kernel="periodic", length_scale=0.5, periodicity=0.5),
    "Matern_Kernel": dict(kernel="matern", length_scale=0.2, nu=1.5),
    "Noisy_Matern_Kernel": dict(
        kernel="noisy_matern", length_scale=0.2, noise_level=0.1, nu=1.5
    ),
    "Variable_Matern_Kernel": dict(
        kernel="variable_matern", length_scale_bounds=(0.01, 0.3), nu=1.5
    ),
}


def get_gp_datasets(
    names=("RBF_Kernel", "Periodic_Kernel", "Noisy_Matern_Kernel"),
    n_samples_train: int = 50_000,
    n_samples_test: int = 10_000,
    n_samples_valid: int = 5_000,
    n_points: int = 128,
    seed: int = 123,
):
    """Train (fresh per epoch) / test / valid (fixed chunks) GP datasets,
    mirroring ntbks_helpers.get_all_gp_datasets (:61-168)."""
    train, test, valid = {}, {}, {}
    for i, name in enumerate(names):
        sampler = GPSampler(n_points=n_points, **KERNEL_CONFIGS[name])
        train[name] = GPDataset(
            sampler, n_samples_train, is_reuse_across_epochs=False, seed=seed + i
        )
        test[name] = GPDataset(
            sampler, n_samples_test, is_reuse_across_epochs=True, seed=seed + 1000 + i
        )
        valid[name] = GPDataset(
            sampler, n_samples_valid, is_reuse_across_epochs=True, seed=seed + 2000 + i
        )
    return train, test, valid

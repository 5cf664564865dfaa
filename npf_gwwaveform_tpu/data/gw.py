"""Batched, jit-compiled gravitational-waveform generator + datasets.

This is the component that replaces `GPDataset` as the function sampler for
the GW use-case (SURVEY.md §0, BASELINE.json configs): an IMRPhenomD-style
frequency-domain approximant — TaylorF2 3.5PN aligned-spin inspiral phasing
matched to a phenomenological merger-ringdown (Lorentzian amplitude around
the ringdown frequency from Berti-style QNM fits, arctan ringdown phase) —
decomposed into amplitude/phase, resampled onto the training grid, and
normalized to the NP input conventions (x in [-1,1]).

Everything is pure jax: one `vmap`-ed `jit` call produces a fresh batch of
waveforms on device every step, so the training loop is never input-bound
(the reference's CPU sklearn sampling was its data hot spot, SURVEY §3.1).

Physics references (public formulas): Buonanno et al. 2009 (arXiv:0907.0700)
for the TaylorF2 phasing coefficients; Berti, Cardoso & Will 2006 for the
(2,2) QNM frequency/quality-factor fits; the piecewise inspiral->MR blending
is a simplified PhenomD-style construction (Husa/Khan et al. 2016) with C^1
matching, NOT a coefficient-for-coefficient PhenomD reimplementation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "GWParameterSpace",
    "GWWaveformGenerator",
    "GWWaveformDataset",
    "match",
    "mismatch",
]

# solar mass in seconds: G M_sun / c^3
MSUN_S = 4.925490947641267e-06
EULER_GAMMA = 0.5772156649015329


# ------------------------------------------------------------ parameter space


@dataclass(frozen=True)
class GWParameterSpace:
    """Uniform sampling box over (m1, m2, chi1, chi2); masses in M_sun,
    aligned dimensionless spins."""

    m_min: float = 10.0
    m_max: float = 80.0
    chi_min: float = -0.8
    chi_max: float = 0.8

    def sample(self, key: jax.Array, n: int) -> jax.Array:
        km, kc = jax.random.split(key)
        ms = jax.random.uniform(km, (n, 2), minval=self.m_min, maxval=self.m_max)
        m1 = jnp.maximum(ms[:, 0], ms[:, 1])
        m2 = jnp.minimum(ms[:, 0], ms[:, 1])
        chis = jax.random.uniform(
            kc, (n, 2), minval=self.chi_min, maxval=self.chi_max
        )
        return jnp.stack([m1, m2, chis[:, 0], chis[:, 1]], axis=-1)

    def grid(self, n_per_axis: int) -> np.ndarray:
        """Regular (m1, m2) grid with zero spins — the 'mass/spin grid'
        evaluation set."""
        m = np.linspace(self.m_min, self.m_max, n_per_axis)
        m1, m2 = np.meshgrid(m, m, indexing="ij")
        sel = m1 >= m2
        out = np.stack(
            [m1[sel], m2[sel], np.zeros(sel.sum()), np.zeros(sel.sum())], axis=-1
        )
        return out

    def normalize(self, theta: jax.Array) -> jax.Array:
        """Map physical parameters into [-1, 1]^4 for conditioning inputs."""
        m1 = (theta[..., 0] - self.m_min) / (self.m_max - self.m_min) * 2 - 1
        m2 = (theta[..., 1] - self.m_min) / (self.m_max - self.m_min) * 2 - 1
        c1 = (theta[..., 2] - self.chi_min) / (self.chi_max - self.chi_min) * 2 - 1
        c2 = (theta[..., 3] - self.chi_min) / (self.chi_max - self.chi_min) * 2 - 1
        return jnp.stack([m1, m2, c1, c2], axis=-1)


# ------------------------------------------------------- waveform generator


class FrequencyDomainWaveform(NamedTuple):
    freqs: jax.Array  # [Nf]
    amplitude: jax.Array  # [..., Nf]
    phase: jax.Array  # [..., Nf]  (continuous, no wrapping)

    @property
    def h(self) -> jax.Array:
        return self.amplitude * jnp.exp(-1j * self.phase)


def _taylorf2_phase(v, eta, delta, chi_s, chi_a, v_ref):
    """3.5PN TaylorF2 phasing (point particle) + leading aligned-spin
    spin-orbit (1.5PN beta) and spin-spin (2PN sigma) terms. v = (pi M f)^1/3."""
    eta2 = eta * eta
    eta3 = eta2 * eta

    beta = (113.0 / 12.0) * (chi_s + delta * chi_a - (76.0 * eta / 113.0) * chi_s)
    sigma = eta * (721.0 / 48.0 * (chi_s**2 - chi_a**2)) - (
        (1.0 - 2.0 * eta) * (247.0 / 48.0) * (chi_s**2 + chi_a**2)
    )

    a2 = 3715.0 / 756.0 + 55.0 * eta / 9.0
    a3 = -16.0 * jnp.pi + 4.0 * beta
    a4 = 15293365.0 / 508032.0 + 27145.0 * eta / 504.0 + 3085.0 * eta2 / 72.0 - 10.0 * sigma
    a5_const = jnp.pi * (38645.0 / 756.0 - 65.0 * eta / 9.0)
    a6 = (
        11583231236531.0 / 4694215680.0
        - 640.0 * jnp.pi**2 / 3.0
        - 6848.0 * EULER_GAMMA / 21.0
        + (-15737765635.0 / 3048192.0 + 2255.0 * jnp.pi**2 / 12.0) * eta
        + 76055.0 * eta2 / 1728.0
        - 127825.0 * eta3 / 1296.0
    )
    a7 = jnp.pi * (
        77096675.0 / 254016.0 + 378515.0 * eta / 1512.0 - 74045.0 * eta2 / 756.0
    )

    logv = jnp.log(v)
    series = (
        1.0
        + a2 * v**2
        + a3 * v**3
        + a4 * v**4
        + a5_const * (1.0 + 3.0 * (logv - jnp.log(v_ref))) * v**5
        + (a6 - 6848.0 / 21.0 * jnp.log(4.0 * v)) * v**6
        + a7 * v**7
    )
    return 3.0 / (128.0 * eta * v**5) * series


def _final_state(eta, chi_eff):
    """Approximate remnant mass fraction and spin: Rezzolla et al. 2008
    aligned-spin final-spin fit + leading radiated-energy fit."""
    s4, s5, t0, t2, t3 = -0.1229, 0.4537, -2.8904, -3.5171, 2.5763
    a_f = (
        chi_eff
        + s4 * chi_eff**2 * eta
        + s5 * chi_eff * eta**2
        + t0 * chi_eff * eta
        + 2.0 * math.sqrt(3.0) * eta
        + t2 * eta**2
        + t3 * eta**3
    )
    a_f = jnp.clip(a_f, -0.998, 0.998)
    m_f = 1.0 + (math.sqrt(8.0 / 9.0) - 1.0) * eta - 0.498 * eta**2
    return m_f, a_f


def _qnm_22(m_f_sec, a_f):
    """(2,2,0) QNM frequency and damping (Berti+ 2006 fits)."""
    omega = 1.5251 - 1.1568 * (1.0 - a_f) ** 0.1292
    quality = 0.7000 + 1.4187 * (1.0 - a_f) ** (-0.4990)
    f_rd = omega / (2.0 * jnp.pi * m_f_sec)
    f_damp = f_rd / (2.0 * quality)
    return f_rd, f_damp


@dataclass(frozen=True)
class GWWaveformGenerator:
    """IMRPhenomD-style frequency-domain (2,2) waveform, batched + jitted.

    `freqs(n_f)`: static frequency grid [f_min, f_max].
    `frequency_domain(theta)`: amplitude/phase on that grid.
    `time_domain(theta)`: h(t) on a fixed time grid via irfft.
    """

    f_min: float = 20.0
    f_max: float = 1024.0
    duration: float = 2.0  # seconds of time-domain output
    sample_rate: float = 2048.0
    t_merge_frac: float = 0.8  # merger position inside the window

    # ---- spectrum on an arbitrary frequency grid (per single theta) ----

    def _hf_single(self, theta: jax.Array, freqs: jax.Array):
        m1, m2, chi1, chi2 = theta[0], theta[1], theta[2], theta[3]
        m_total = (m1 + m2) * MSUN_S
        eta = m1 * m2 / (m1 + m2) ** 2
        delta = (m1 - m2) / (m1 + m2)
        chi_s = 0.5 * (chi1 + chi2)
        chi_a = 0.5 * (chi1 - chi2)
        chi_eff = (m1 * chi1 + m2 * chi2) / (m1 + m2)
        mchirp = m_total * eta ** (3.0 / 5.0)

        m_f, a_f = _final_state(eta, chi_eff)
        f_rd, f_damp = _qnm_22(m_f * m_total, a_f)

        f_safe = jnp.maximum(freqs, 1.0)
        v = (jnp.pi * m_total * f_safe) ** (1.0 / 3.0)
        v_rd = (jnp.pi * m_total * f_rd) ** (1.0 / 3.0)

        # ---------------- phase: TaylorF2 inspiral, C^1-matched arctan MR
        psi_insp = _taylorf2_phase(v, eta, delta, chi_s, chi_a, v_rd)

        f_t = 0.75 * f_rd  # inspiral->MR transition
        v_t = (jnp.pi * m_total * f_t) ** (1.0 / 3.0)
        psi_t = _taylorf2_phase(v_t, eta, delta, chi_s, chi_a, v_rd)
        # dpsi/df at f_t by forward difference (cheap, accurate enough for C^1)
        df = 0.01 * f_damp
        v_t2 = (jnp.pi * m_total * (f_t + df)) ** (1.0 / 3.0)
        dpsi_t = (_taylorf2_phase(v_t2, eta, delta, chi_s, chi_a, v_rd) - psi_t) / df

        kappa = 2.2 / eta  # ringdown phase depth (PhenomD-style 1/eta scaling)
        atan_t = jnp.arctan((f_t - f_rd) / f_damp)
        datan_t = f_damp / ((f_t - f_rd) ** 2 + f_damp**2)
        b_lin = dpsi_t - kappa * datan_t
        a_lin = psi_t - b_lin * f_t - kappa * atan_t
        psi_mr = a_lin + b_lin * freqs + kappa * jnp.arctan((freqs - f_rd) / f_damp)

        # smooth C^inf blend over ~2 f_damp around f_t
        w = jax.nn.sigmoid((freqs - f_t) / (0.5 * f_damp))
        psi = (1.0 - w) * psi_insp + w * psi_mr

        # ---------------- amplitude: f^-7/6 inspiral -> Lorentzian ringdown
        amp_insp = mchirp ** (5.0 / 6.0) * f_safe ** (-7.0 / 6.0)
        lorentz = f_damp**2 / ((freqs - f_rd) ** 2 + f_damp**2)
        amp_t = mchirp ** (5.0 / 6.0) * f_t ** (-7.0 / 6.0)
        lorentz_t = f_damp**2 / ((f_t - f_rd) ** 2 + f_damp**2)
        amp_mr = amp_t * lorentz / lorentz_t
        amp = (1.0 - w) * amp_insp + w * amp_mr

        # band edges. The start frequency is raised per-waveform so the
        # in-band time-to-merger fits inside the output window (Newtonian
        # chirp time tau = 5/(256 eta) M (pi M f)^(-8/3)), preventing irfft
        # wraparound for low-mass (long) signals.
        tau_fit = 0.85 * self.t_merge_frac * self.duration
        f_fit = (5.0 * m_total / (256.0 * eta * tau_fit)) ** (3.0 / 8.0) / (
            jnp.pi * m_total
        )
        f_start = jnp.maximum(self.f_min, f_fit)
        lo = jax.nn.sigmoid((freqs - f_start) / (0.02 * f_start + 0.25))
        hi = jax.nn.sigmoid((f_rd + 6.0 * f_damp - freqs) / (2.0 * f_damp))
        amp = amp * lo * hi

        return amp, psi, f_rd, f_damp

    # ------------------------------------------------------ public, batched

    def freqs(self, n_f: int) -> jax.Array:
        return jnp.linspace(self.f_min, self.f_max, n_f)

    @partial(jax.jit, static_argnames=("self", "n_f"))
    def frequency_domain(self, theta: jax.Array, n_f: int = 256):
        """theta [B,4] -> FrequencyDomainWaveform with amplitude/phase
        [B, n_f] on a uniform grid. Amplitude is peak-normalized per
        waveform; phase has its linear best-fit (time/phase origin freedom)
        removed so networks see the intrinsic chirp structure."""
        freqs = self.freqs(n_f)
        amp, psi, _, _ = jax.vmap(lambda t: self._hf_single(t, freqs))(theta)

        amp = amp / jnp.max(amp, axis=-1, keepdims=True)

        # remove linear-in-f component (t_c, phi_c gauge freedom), weighted by
        # amplitude so the fit focuses on the in-band region
        wgt = amp + 1e-8
        f0 = jnp.sum(wgt * freqs, -1, keepdims=True) / jnp.sum(wgt, -1, keepdims=True)
        p0 = jnp.sum(wgt * psi, -1, keepdims=True) / jnp.sum(wgt, -1, keepdims=True)
        cov = jnp.sum(wgt * (freqs - f0) * (psi - p0), -1, keepdims=True)
        var = jnp.sum(wgt * (freqs - f0) ** 2, -1, keepdims=True)
        slope = cov / jnp.maximum(var, 1e-12)
        psi = psi - (p0 + slope * (freqs - f0))

        return FrequencyDomainWaveform(freqs, amp, psi)

    @property
    def n_time(self) -> int:
        return int(self.duration * self.sample_rate)

    @partial(jax.jit, static_argnames=("self",))
    def time_domain(self, theta: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """theta [B,4] -> (times [n_time], h [B, n_time]) via irfft, merger
        placed at t_merge_frac of the window, peak-normalized."""
        n = self.n_time
        n_f = n // 2 + 1
        delta_f = 1.0 / self.duration
        freqs = jnp.arange(n_f) * delta_f

        def one(theta_i):
            amp, psi, f_rd, f_damp = self._hf_single(theta_i, freqs)
            # place the merger at t_merge_frac * duration (TaylorF2 has
            # coalescence at t=0; a linear phase in f translates in time,
            # with this FFT convention shifting by (1 - frac) * duration)
            t_shift = (1.0 - self.t_merge_frac) * self.duration
            phase = psi - 2.0 * jnp.pi * freqs * t_shift
            hf = amp * jnp.exp(-1j * phase)
            hf = hf.at[0].set(0.0)
            h = jnp.fft.irfft(hf, n=n)
            return h

        h = jax.vmap(one)(theta)
        h = h / jnp.max(jnp.abs(h), axis=-1, keepdims=True)
        times = jnp.arange(n) / self.sample_rate
        return times, h


# -------------------------------------------------------------- match metric


def psd_aligo(freqs: jax.Array) -> jax.Array:
    """Analytic Advanced-LIGO design PSD fit (Ajith & Bose 2009 style,
    arXiv:0901.4936 Table 1 form): S(f) = 1e-49 * [x^-4.14 - 5 x^-2 +
    111 (1 - x^2 + x^4/2)/(1 + x^2/2)], x = f/215 Hz. Clamped below 10 Hz."""
    x = jnp.maximum(freqs, 10.0) / 215.0
    s = (
        x ** (-4.14)
        - 5.0 / (x**2)
        + 111.0 * (1.0 - x**2 + 0.5 * x**4) / (1.0 + 0.5 * x**2)
    )
    # returned in units of 1e-49 Hz^-1: the physical 1e-49 prefactor
    # UNDERFLOWS float32 (subnormal floor ~1e-45) and the matched-filter
    # match is invariant to the PSD's overall scale, so only the shape is
    # kept in-range
    return jnp.maximum(s, 1e-6)


def match(
    h1: jax.Array,
    h2: jax.Array,
    axis: int = -1,
    psd: Optional[jax.Array] = None,
) -> jax.Array:
    """Overlap between two time-domain waveforms maximized over time and
    phase shifts — the standard matched-filter match via one FFT.
    h1, h2: [..., N]. `psd` (length N//2+1) noise-weights the inner product
    (e.g. `psd_aligo(rfftfreqs)`); None = white noise."""
    f1 = jnp.fft.rfft(h1, axis=axis)
    f2 = jnp.fft.rfft(h2, axis=axis)
    if psd is not None:
        w = 1.0 / psd
        f1w = f1 * w
        corr = jnp.fft.irfft(f1w * jnp.conj(f2), n=h1.shape[axis], axis=axis)
        num = jnp.max(jnp.abs(corr), axis=axis)
        n1 = jnp.sqrt(jnp.sum((jnp.abs(f1) ** 2) * w, axis=axis))
        n2 = jnp.sqrt(jnp.sum((jnp.abs(f2) ** 2) * w, axis=axis))
    else:
        corr = jnp.fft.irfft(f1 * jnp.conj(f2), n=h1.shape[axis], axis=axis)
        num = jnp.max(jnp.abs(corr), axis=axis)
        n1 = jnp.sqrt(jnp.sum(h1 * h1, axis=axis))
        n2 = jnp.sqrt(jnp.sum(h2 * h2, axis=axis))
    return num / jnp.maximum(n1 * n2, 1e-30)


def mismatch(h1, h2, axis: int = -1, psd: Optional[jax.Array] = None):
    return 1.0 - match(h1, h2, axis=axis, psd=psd)


def match_fd(
    h1f: jax.Array,
    h2f: jax.Array,
    psd: Optional[jax.Array] = None,
    pad_factor: int = 4,
) -> jax.Array:
    """Matched-filter match for FREQUENCY-domain waveforms on a uniform
    frequency grid, maximized over relative time and phase shifts.

    h1f, h2f: complex [..., Nf] (e.g. ``amplitude * exp(-1j * phase)``).
    psd: [Nf] noise weighting (1/S(f) inner product); None = white.
    pad_factor: zero-pad the shift search FFT for sub-bin time resolution.

    A time shift t maps to the linear phase e^{2*pi*i*f*t}, so the overlap
    as a function of t is the DFT of ``h1f * conj(h2f) / S`` over the
    uniform grid; |.| then absorbs the constant-phase freedom. This makes
    the metric gauge-invariant to the (t_c, phi_c) freedom the freq_ap
    targets already have projected out (frequency_domain's linear de-trend)
    — the same invariances as the time-domain `match`."""
    w = (1.0 / psd) if psd is not None else jnp.ones(h1f.shape[-1])
    # the match is invariant to the weight's overall scale; normalize so
    # physical PSDs (S ~ 1e-49 -> w ~ 1e49) don't overflow float32
    w = w / jnp.mean(w)
    integ = h1f * jnp.conj(h2f) * w
    n = h1f.shape[-1] * pad_factor
    corr = jnp.fft.fft(integ, n=n, axis=-1)
    num = jnp.max(jnp.abs(corr), axis=-1)
    n1 = jnp.sqrt(jnp.sum(jnp.abs(h1f) ** 2 * w, axis=-1))
    n2 = jnp.sqrt(jnp.sum(jnp.abs(h2f) ** 2 * w, axis=-1))
    return num / jnp.maximum(n1 * n2, 1e-30)


def mismatch_fd(h1f, h2f, psd: Optional[jax.Array] = None, pad_factor: int = 4):
    return 1.0 - match_fd(h1f, h2f, psd=psd, pad_factor=pad_factor)


# ------------------------------------------------------------------ dataset


class GWWaveformDataset:
    """NP-ready GW function dataset, mirroring the GPDataset API.

    mode="time": x = time grid in [-1,1], y = h(t) (y_dim=1).
    mode="freq_ap": x = frequency grid in [-1,1], y = (amplitude,
        standardized phase) (y_dim=2) — the dual-output config of
        BASELINE.json.

    `sample(key, n)` also returns the normalized physical parameters for
    parameter-conditioned models. Fresh on-device batches every call.
    """

    def __init__(
        self,
        generator: GWWaveformGenerator = GWWaveformGenerator(),
        param_space: GWParameterSpace = GWParameterSpace(),
        mode: str = "time",
        n_points: int = 256,
        n_samples: int = 50_000,
        is_reuse_across_epochs: bool = False,
        seed: int = 0,
    ):
        assert mode in ("time", "freq_ap")
        self.generator = generator
        self.param_space = param_space
        self.mode = mode
        self.n_points = n_points
        self.n_samples = n_samples
        self.is_reuse_across_epochs = is_reuse_across_epochs
        self._key = jax.random.PRNGKey(seed)
        self._sample_jit = jax.jit(self._sample, static_argnums=(1,))
        self._fixed = None
        if is_reuse_across_epochs:
            self._fixed = self.get_samples(n_samples)

    @property
    def y_dim(self):
        return 1 if self.mode == "time" else 2

    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _sample(self, key, n):
        theta = self.param_space.sample(key, n)
        if self.mode == "time":
            times, h = self.generator.time_domain(theta)
            # resample to n_points by strided slice (static)
            stride = max(1, h.shape[-1] // self.n_points)
            h = h[..., -self.n_points * stride :: stride][..., : self.n_points]
            x = jnp.linspace(-1.0, 1.0, self.n_points)[None, :, None]
            x = jnp.broadcast_to(x, (n, self.n_points, 1))
            y = h[..., None]
        else:
            fd = self.generator.frequency_domain(theta, n_f=self.n_points)
            x = jnp.linspace(-1.0, 1.0, self.n_points)[None, :, None]
            x = jnp.broadcast_to(x, (n, self.n_points, 1))
            # standardize phase per waveform (amplitude already in [0,1])
            psi = fd.phase
            psi = (psi - jnp.mean(psi, -1, keepdims=True)) / (
                jnp.std(psi, -1, keepdims=True) + 1e-8
            )
            y = jnp.stack([fd.amplitude, psi], axis=-1)
        return x, y, self.param_space.normalize(theta)

    def get_samples(self, n_samples=None, key=None):
        n = self.n_samples if n_samples is None else n_samples
        k = self.next_key() if key is None else key
        return self._sample_jit(k, n)

    def set_samples_(self, data, targets, params=None):
        self.is_reuse_across_epochs = True
        self._fixed = (data, targets, params)
        self.n_samples = data.shape[0]

    def epoch_batches(self, batch_size: int, key=None):
        for x, y, _ in self.epoch_batches_conditioned(batch_size, key):
            yield x, y

    def epoch_batches_conditioned(self, batch_size: int, key=None):
        """Like epoch_batches but also yields the normalized physical
        parameters [B, 4] for parameter-conditioned models."""
        if self.is_reuse_across_epochs:
            x, y, p = self._fixed
            for i in range(0, x.shape[0] - batch_size + 1, batch_size):
                yield (
                    x[i : i + batch_size],
                    y[i : i + batch_size],
                    p[i : i + batch_size] if p is not None else None,
                )
        else:
            n_batches = self.n_samples // batch_size
            k = self.next_key() if key is None else key
            for kb in jax.random.split(k, n_batches):
                yield self._sample_jit(kb, batch_size)

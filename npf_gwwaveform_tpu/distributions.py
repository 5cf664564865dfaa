"""Lightweight diagonal-Gaussian distribution for NPF predictives and latents.

The reference uses `torch.distributions.Independent(Normal(loc, scale), 1)`
(`MultivariateNormalDiag`, /root/reference/npf/utils/helpers.py:125-129). Here a
distribution is a pytree `NamedTuple` of (loc, scale) plus pure functions, so it
flows through `jax.jit` / `vmap` / shardings with zero wrapper overhead and all
log-prob reductions stay in float32 regardless of the compute dtype.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


class NormalDiag(NamedTuple):
    """Diagonal Gaussian with event dim = last axis (like Independent(Normal, 1))."""

    loc: jax.Array
    scale: jax.Array

    @property
    def batch_shape(self):
        return self.loc.shape[:-1]

    @property
    def event_shape(self):
        return self.loc.shape[-1:]

    def log_prob(self, x: jax.Array) -> jax.Array:
        """Log density, summed over the event (last) axis. Returns batch_shape."""
        loc = self.loc.astype(jnp.float32)
        scale = self.scale.astype(jnp.float32)
        x = x.astype(jnp.float32)
        z = (x - loc) / scale
        per_dim = -0.5 * z * z - jnp.log(scale) - _HALF_LOG_2PI
        return jnp.sum(per_dim, axis=-1)

    def sample(self, key: jax.Array, sample_shape: tuple = ()) -> jax.Array:
        """Reparameterized sample (≙ torch `rsample`); gradient flows through."""
        shape = tuple(sample_shape) + self.loc.shape
        eps = jax.random.normal(key, shape, dtype=jnp.float32)
        return self.loc + self.scale * eps

    # torch-API alias used throughout the reference (base.py:512)
    rsample = sample

    @property
    def mean(self):
        return self.loc

    @property
    def stddev(self):
        return self.scale


def kl_normal_diag(q: NormalDiag, p: NormalDiag) -> jax.Array:
    """KL[q || p] for diagonal Gaussians, summed over the event (last) axis.

    Matches `torch.distributions.kl_divergence(Independent(Normal..),
    Independent(Normal..))` used by the ELBO loss (reference npf/losses.py:146).
    """
    q_loc = q.loc.astype(jnp.float32)
    q_scale = q.scale.astype(jnp.float32)
    p_loc = p.loc.astype(jnp.float32)
    p_scale = p.scale.astype(jnp.float32)
    var_ratio = jnp.square(q_scale / p_scale)
    t1 = jnp.square((q_loc - p_loc) / p_scale)
    per_dim = 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))
    return jnp.sum(per_dim, axis=-1)

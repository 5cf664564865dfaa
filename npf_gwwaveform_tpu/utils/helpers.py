"""Tensor helpers: masked reductions, range rescaling, stable log-cum-sum-exp.

TPU-first counterpart of /root/reference/npf/utils/helpers.py. The single
biggest design difference from the reference: the reference realizes ragged
context/target sets via per-batch gathers of equal within-batch sizes
(datasplit.py:246-255); here every set is PADDED to a static max size and
carries a boolean mask, so all shapes are static under `jit` and a zero mask
naturally reproduces the reference's empty-context conventions (np.py:97-99).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class MaskedSet(NamedTuple):
    """A padded set of points: x [B, N, x_dim], y [B, N, y_dim], mask [B, N].

    mask is 1.0/True for real points, 0.0/False for padding. All kernels in
    this library consume and respect the mask end-to-end.
    """

    x: jax.Array
    y: Optional[jax.Array]
    mask: jax.Array

    @property
    def count(self) -> jax.Array:
        """Number of real points per batch element. Shape [B]."""
        return jnp.sum(self.mask.astype(jnp.float32), axis=-1)


def rescale_range(x, old_range, new_range):
    """Linearly rescale x from old_range=(lo,hi) to new_range=(lo,hi).

    Parity with reference npf/utils/helpers.py:116-122.
    """
    old_min, old_max = old_range
    new_min, new_max = new_range
    return (x - old_min) * (new_max - new_min) / (old_max - old_min) + new_min


def ratio_to_int(percentage, max_val):
    """Converts a ratio to an integer count if needed (ref helpers.py:99-108)."""
    if 1 <= percentage <= max_val:
        return int(percentage)
    elif 0 <= percentage < 1:
        return int(percentage * max_val)
    raise ValueError(f"percentage={percentage} outside of [0, {max_val}].")


def sum_from_nth_dim(t: jax.Array, dim: int) -> jax.Array:
    """Sum all dims from `dim` onward (ref helpers.py:15-17)."""
    return jnp.sum(t, axis=tuple(range(dim, t.ndim)))


def masked_sum(t: jax.Array, mask: jax.Array, axis: int = -2) -> jax.Array:
    """Sum over `axis` counting only masked-in entries.

    mask broadcasts against t without the feature axis: t [..., N, D],
    mask [..., N] -> out [..., D].
    """
    m = jnp.expand_dims(mask.astype(t.dtype), -1)
    return jnp.sum(t * m, axis=axis)


def masked_mean(t: jax.Array, mask: jax.Array, axis: int = -2) -> jax.Array:
    """Mean over `axis` counting only masked-in entries; zero when mask empty.

    Reproduces CNP's masked mean-pool + zero-representation-for-empty-context
    convention (reference np.py:95-99) in one op.
    """
    m = jnp.expand_dims(mask.astype(jnp.float32), -1)
    total = jnp.sum(t.astype(jnp.float32) * m, axis=axis)
    count = jnp.sum(m, axis=axis)
    return (total / jnp.maximum(count, 1.0)).astype(t.dtype)


def masked_softmax(logits: jax.Array, mask: jax.Array, axis: int = -1) -> jax.Array:
    """Softmax over `axis` with masked-out entries receiving zero weight.

    Safe for fully-masked rows (returns all zeros rather than NaN); this is how
    the empty-context case of attention (reference attnnp.py:121-125) falls out
    naturally.
    """
    logits = jnp.where(mask, logits, NEG_INF)
    m = jnp.max(logits, axis=axis, keepdims=True)
    unnorm = jnp.exp(logits - jax.lax.stop_gradient(m)) * mask.astype(logits.dtype)
    denom = jnp.sum(unnorm, axis=axis, keepdims=True)
    return unnorm / jnp.maximum(denom, 1e-30)


def logcumsumexp(x: jax.Array, axis: int = 0) -> jax.Array:
    """Numerically stable log-cumsum-exp along `axis`.

    The reference resorts to an O(n^2) loop workaround
    (npf/utils/helpers.py:20-33); on TPU we use an O(n log n) associative scan
    of the (max, sumexp) monoid.
    """

    def combine(a, b):
        a_max, a_sum = a
        b_max, b_sum = b
        out_max = jnp.maximum(a_max, b_max)
        out_sum = a_sum * jnp.exp(a_max - out_max) + b_sum * jnp.exp(b_max - out_max)
        return out_max, out_sum

    x = jnp.moveaxis(x, axis, 0)
    init = (x, jnp.ones_like(x))
    out_max, out_sum = jax.lax.associative_scan(combine, init, axis=0)
    res = out_max + jnp.log(out_sum)
    return jnp.moveaxis(res, 0, axis)


def isin_range(x, valid_range) -> bool:
    """Check that all values sit inside [lo, hi] (ref helpers.py:55-57)."""
    return bool(jnp.all((x >= valid_range[0]) & (x <= valid_range[1])))


def channels_to_2nd_dim(x: jax.Array) -> jax.Array:
    """[B, *spatial, C] -> [B, C, *spatial] (ref helpers.py:60-66)."""
    return jnp.transpose(x, (0, x.ndim - 1) + tuple(range(1, x.ndim - 1)))


def channels_to_last_dim(x: jax.Array) -> jax.Array:
    """[B, C, *spatial] -> [B, *spatial, C] (ref helpers.py:69-73)."""
    return jnp.transpose(x, (0,) + tuple(range(2, x.ndim)) + (1,))


# ---- z-sample plumbing (reference npf/neuralproc/helpers.py) ----


def collapse_z_samples_batch(t: jax.Array) -> jax.Array:
    """Merge leading (n_z, B) dims into one batch dim (ref helpers.py:4-8)."""
    n_z, b = t.shape[0], t.shape[1]
    return t.reshape((n_z * b,) + t.shape[2:])


def extract_z_samples_batch(t: jax.Array, n_z_samples: int) -> jax.Array:
    """Inverse of collapse_z_samples_batch (ref helpers.py:11-14)."""
    nzb = t.shape[0]
    return t.reshape((n_z_samples, nzb // n_z_samples) + t.shape[1:])


def replicate_z_samples(t: jax.Array, n_z_samples: int) -> jax.Array:
    """Add and tile a leading n_z dim (ref helpers.py:16-19)."""
    return jnp.broadcast_to(t[None], (n_z_samples,) + t.shape)


def set_seed(seed: Optional[int]):
    """Seed python/numpy RNGs and return a fresh jax PRNGKey
    (ref utils/helpers.py:49-55; jax randomness is key-based, so the key IS
    the seed state here)."""
    import random as _random

    import numpy as _np

    if seed is not None:
        _random.seed(seed)
        _np.random.seed(seed)
    return jax.random.PRNGKey(0 if seed is None else seed)


def parallelize(func, inputs, n_jobs: Optional[int] = None):
    """Multiprocessing map for host-side numpy preprocessing
    (ref utils/helpers.py:77-93)."""
    import multiprocessing as mp

    n_jobs = n_jobs or max(1, mp.cpu_count() - 1)
    if n_jobs == 1 or len(inputs) <= 1:
        return [func(x) for x in inputs]
    with mp.Pool(n_jobs) as pool:
        return pool.map(func, inputs)


def pool_and_replicate_middle(t: jax.Array) -> jax.Array:
    """Mean-pool all middle dims then broadcast back (ref helpers.py:21-31)."""
    pooled = jnp.mean(
        t.reshape(t.shape[0], -1, t.shape[-1]), axis=1, keepdims=True
    )
    pooled = jnp.broadcast_to(
        pooled.reshape((t.shape[0],) + (1,) * (t.ndim - 2) + (t.shape[-1],)), t.shape
    )
    return pooled

"""Positional encodings and module combinators.

Parity targets in /root/reference/npf/architectures/encoders.py:
`SinusoidalEncodings` (:17-75), `RelativeSinusoidalEncodings` (:78-101),
`MergeFlatInputs`/`merge_flat_input` (:130-213), `DiscardIthArg`/
`discard_ith_arg` (:105-127). Combinators are realized as Flax modules taking
a module *factory* (a callable returning an uninitialized module), preserving
the reference's dependency-injection style.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils import init as winit
from .mlp import MLP


class SinusoidalEncodings(nn.Module):
    """Map x in [-1,1]^x_dim to sin/cos features of size out_dim.

    Matches reference encoders.py:17-75 including the NLP-range rescale
    `(x+1)*25 + 1` (:68) and the C = 10000*(sub_dim/512)^2 denominator (:40).
    """

    out_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x_dim = x.shape[-1]
        if self.out_dim % x_dim != 0:
            raise ValueError(f"out_dim={self.out_dim} not divisible by x_dim={x_dim}")
        sub_dim = self.out_dim // x_dim
        if sub_dim % 2 != 0:
            raise ValueError(f"out_dim/x_dim={sub_dim} must be even")

        c = 10000.0 * (sub_dim / 512.0) ** 2
        two_i_d = jnp.arange(0, sub_dim, 2, dtype=jnp.float32) / sub_dim
        denom = jnp.power(c, two_i_d)
        denom = jnp.repeat(denom, 2)  # [sub_dim]

        # [..., x_dim, 1] rescaled to ~[1, 51]
        pos = (x[..., None] + 1.0) * 25.0 + 1.0
        ang = pos / denom  # [..., x_dim, sub_dim]
        sin = jnp.sin(ang[..., 0::2])
        cos = jnp.cos(ang[..., 1::2])
        out = jnp.stack([sin, cos], axis=-1).reshape(*ang.shape[:-1], sub_dim)
        return out.reshape(*x.shape[:-1], self.out_dim)


class RelativeSinusoidalEncodings(nn.Module):
    """Sinusoidal encodings of |key - query| windowed to `window_size`
    (reference encoders.py:78-101)."""

    out_dim: int
    window_size: float = 2.0

    @nn.compact
    def __call__(self, keys_pos: jax.Array, queries_pos: jax.Array) -> jax.Array:
        # [B, n_q, n_k, x_dim]
        diff = jnp.abs(keys_pos[:, None, :, :] - queries_pos[:, :, None, :])
        scaled = diff * 2.0 / self.window_size - 1.0
        out = SinusoidalEncodings(self.out_dim)(scaled)
        out = nn.Dense(
            self.out_dim, use_bias=False, kernel_init=winit.switchable(winit.xavier_uniform)
        )(out)
        in_window = jnp.all(diff < self.window_size, axis=-1, keepdims=True)
        return out * in_window.astype(out.dtype)


class MergeFlatInputs(nn.Module):
    """Feed two flat inputs to `flat_module_factory`: concat, or resize x2 with
    an MLP and sum-merge through a ReLU (reference encoders.py:159-183)."""

    flat_module_factory: Callable[[int], nn.Module]  # n_out -> module
    n_out: int
    is_sum_merge: bool = False

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array, **kwargs) -> jax.Array:
        if self.is_sum_merge:
            x2 = MLP(x1.shape[-1], name="resizer")(x2)
            out = nn.relu(x1 + x2)
        else:
            # broadcast leading dims (e.g. z-sample axis on x2 but not x1)
            if x1.ndim != x2.ndim:
                if x1.ndim < x2.ndim:
                    x1 = jnp.broadcast_to(x1, x2.shape[: -1] + x1.shape[-1:])
                else:
                    x2 = jnp.broadcast_to(x2, x1.shape[: -1] + x2.shape[-1:])
            out = jnp.concatenate([x1, x2], axis=-1)
        return self.flat_module_factory(self.n_out)(out, **kwargs)


def merge_flat_input(module_factory, is_sum_merge=False, **kwargs):
    """Combinator: `merge_flat_input(f)(n_out, **kw)` returns a MergeFlatInputs
    whose inner module is `f(n_out, **kw)` — the reference's DI idiom
    (encoders.py:186-213)."""

    def make(n_out, name=None, **kwargs2):
        merged = {**kwargs, **kwargs2}
        return MergeFlatInputs(
            flat_module_factory=lambda n: module_factory(n, **merged),
            n_out=n_out,
            is_sum_merge=is_sum_merge,
            name=name,
        )

    return make


class DiscardIthArg(nn.Module):
    """Forward all but the i-th positional argument to the wrapped module
    (reference encoders.py:105-127); used to make ConvCNP decoders
    x-independent (convnp.py:124)."""

    module_factory: Callable[[], nn.Module]
    i: int = 0

    @nn.compact
    def __call__(self, *args, **kwargs):
        args = [a for j, a in enumerate(args) if j != self.i]
        return self.module_factory()(*args, **kwargs)


def discard_ith_arg(module_factory, i, **kwargs):
    def make(n_out, name=None, **kwargs2):
        merged = {**kwargs, **kwargs2}
        return DiscardIthArg(
            module_factory=lambda: module_factory(n_out, **merged), i=i, name=name
        )

    return make

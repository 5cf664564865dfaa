"""ProbabilityConverter + leaky clamp — reference npf/utils/helpers.py:132-305.

Part of the reference's public L1 surface (imported by its setcnn.py). No
notebook benchmark config instantiates it, but it completes the tensor-helper
inventory row (SURVEY.md §2.4).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["clamp", "ProbabilityConverter"]


def clamp(
    x,
    minimum=-float("inf"),
    maximum=float("inf"),
    is_leaky: bool = False,
    negative_slope: float = 0.01,
    hard_min=None,
    hard_max=None,
):
    """(Leaky-)clamp to [minimum, maximum] with optional hard outer bounds
    (ref helpers.py:132-164). Deviation, documented: the reference's
    hard_min/hard_max branch re-clamps the RAW input, discarding the leaky
    result (so leaky + hard bounds returns plain clamp(x, hard_min,
    hard_max)); here the hard bounds are applied ON TOP of the leaky clamp,
    which is the evident intent (keep small gradients near the soft bounds,
    never exceed the hard ones)."""
    lower = minimum + negative_slope * (x - minimum) if is_leaky else minimum
    upper = maximum + negative_slope * (x - maximum) if is_leaky else maximum
    out = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(lower, x.dtype), x.shape),
        jnp.minimum(x, jnp.asarray(upper, x.dtype)),
    )
    if hard_min is not None or hard_max is not None:
        hard_min = -float("inf") if hard_min is None else hard_min
        hard_max = float("inf") if hard_max is None else hard_max
        out = jnp.clip(out, hard_min, hard_max)
    return out


class ProbabilityConverter(nn.Module):
    """Map floats to probabilities in (min_p, 1-min_p), element-wise
    (ref helpers.py:167-305): (x + bias) * temperature through sigmoid /
    hard-sigmoid / leaky-hard-sigmoid, rescaled into the min_p band. The
    bias initializes so that `initial_x` maps to `initial_probability`;
    temperature/bias are trainable when the flags are set (fixed constants
    otherwise, matching the reference's non-Parameter tensors)."""

    min_p: float = 0.0
    activation: str = "sigmoid"
    is_train_temperature: bool = False
    is_train_bias: bool = False
    trainable_dim: int = 1
    initial_temperature: float = 1.0
    initial_probability: float = 0.5
    initial_x: float = 0.0
    bias_transformer: Callable = lambda b: b
    temperature_transformer: Callable = lambda t: t

    def _probability_to_bias(self) -> float:
        """ref helpers.py:291-304."""
        p = self.initial_probability
        assert self.min_p < p < 1 - self.min_p
        range_p = 1 - self.min_p * 2
        p = (p - self.min_p) / range_p
        if self.activation == "sigmoid":
            return -(math.log((1 - p) / p) / self.initial_temperature + self.initial_x)
        if self.activation in ("hard-sigmoid", "leaky-hard-sigmoid"):
            return ((p - 0.5) / 0.2) / self.initial_temperature - self.initial_x
        raise ValueError(f"Unknown activation : {self.activation}")

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        init_bias = self._probability_to_bias()
        if self.is_train_temperature:
            temperature = self.param(
                "temperature",
                lambda _k: jnp.full((self.trainable_dim,), self.initial_temperature),
            )
        else:
            temperature = jnp.full((self.trainable_dim,), self.initial_temperature)
        if self.is_train_bias:
            bias = self.param(
                "bias", lambda _k: jnp.full((self.trainable_dim,), init_bias)
            )
        else:
            bias = jnp.full((self.trainable_dim,), init_bias)

        temperature = self.temperature_transformer(temperature)
        bias = self.bias_transformer(bias)

        if self.activation == "sigmoid":
            full_p = jax.nn.sigmoid((x + bias) * temperature)
        elif self.activation in ("hard-sigmoid", "leaky-hard-sigmoid"):
            y = 0.2 * ((x + bias) * temperature) + 0.5
            if self.activation == "leaky-hard-sigmoid":
                full_p = clamp(
                    y, minimum=0.1, maximum=0.9, is_leaky=True,
                    negative_slope=0.01, hard_min=0.0, hard_max=1.0,
                )
            else:
                full_p = clamp(y, minimum=0.0, maximum=1.0)
        else:
            raise ValueError(f"Unknown activation : {self.activation}")

        # rescale (0,1) -> (min_p, 1-min_p), ref helpers.py:287
        return full_p * (1 - 2 * self.min_p) + self.min_p

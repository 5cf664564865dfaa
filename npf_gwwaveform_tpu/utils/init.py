"""Activation-gain-aware initializers matching the reference's torch init scheme.

The reference initializes every hidden Linear with kaiming-uniform (relu gain)
and every output Linear with xavier-uniform (npf/utils/initialization.py:67-94),
and convs with kaiming-normal fan_out (initialization.py:24-26). These map to
`variance_scaling` exactly:

  torch kaiming_uniform_(relu)   == variance_scaling(2.0, fan_in,  uniform)
  torch xavier_uniform_(gain=1)  == variance_scaling(1.0, fan_avg, uniform)
  torch kaiming_normal_(fan_out) == variance_scaling(2.0, fan_out, normal)

Matching init matters for reproducing the reference's training trajectories.
"""

import math

import jax
import jax.numpy as jnp
from jax.nn import initializers as jinit

# hidden layers followed by ReLU (ref linear_init activation="relu")
kaiming_uniform_relu = jinit.variance_scaling(2.0, "fan_in", "uniform")

# output layers / no activation (ref linear_init activation=None)
xavier_uniform = jinit.variance_scaling(1.0, "fan_avg", "uniform")

# tanh / sigmoid gains for xavier (ref get_gain)
xavier_uniform_tanh = jinit.variance_scaling(5.0 / 3.0 * 5.0 / 3.0, "fan_avg", "uniform")

# convolutions (ref weights_init kaiming_normal_ mode="fan_out")
kaiming_normal_fanout = jinit.variance_scaling(2.0, "fan_out", "normal")

zeros = jinit.zeros
ones = jinit.ones


def linear_init_for(activation):
    """Pick the initializer the reference would use before `activation`."""
    if activation is None:
        return xavier_uniform
    name = activation if isinstance(activation, str) else getattr(activation, "__name__", "relu")
    if "relu" in name:
        return kaiming_uniform_relu
    if name in ("tanh", "sigmoid"):
        return xavier_uniform_tanh
    return kaiming_uniform_relu


def normal_std(std):
    """Normal(0, std) — used by MultiheadAttender's per-head rescaled init
    (reference attention.py:449-455)."""

    def _init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return _init


def uniform_bound(bound, shift=0.0):
    """U(shift-bound, shift+bound) — ref init_param_ (initialization.py:97-124)."""

    def _init(key, shape, dtype=jnp.float32):
        return shift + jax.random.uniform(key, shape, dtype, -bound, bound)

    return _init

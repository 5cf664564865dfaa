"""Activation-gain-aware initializers matching the reference's torch init scheme.

The reference's INTENDED init (npf/utils/initialization.py:67-94): hidden
Linear = kaiming-uniform (relu gain), output Linear = xavier-uniform, convs =
kaiming-normal fan_out. These map to `variance_scaling` exactly:

  torch kaiming_uniform_(relu)   == variance_scaling(2.0, fan_in,  uniform)
  torch xavier_uniform_(gain=1)  == variance_scaling(1.0, fan_avg, uniform)
  torch kaiming_normal_(fan_out) == variance_scaling(2.0, fan_out, normal)

The reference's REALIZED init differs, due to two latent bugs:
* `get_activation_name` (initialization.py:34-49) returns the activation
  CLASS (not its name) for module instances, so `linear_init(m, nn.ReLU())`
  matches no branch and never re-initializes — MLP hidden layers keep the
  torch DEFAULT Linear init, kaiming_uniform(a=sqrt(5)) = U(+-1/sqrt(fan_in))
  (biases are still zeroed: linear_init zeroes them before branching). Only
  `linear_init(self.out)` — called with the STRING default "relu"
  (mlp.py:115) — actually applies kaiming-relu.
* `weights_init` (initialization.py:7-31) guards on `module.is_resetted` —
  the ROOT it just set — so the loop skips EVERY submodule; attention
  projections and convs also keep torch defaults.

Net effect: everything is torch-default-initialized except MLP `out` layers
(kaiming-relu) and MLP biases (zero). Measured consequence: training
dynamics differ — e.g. Periodic AttnCNP converges ~46 nats better under the
realized scheme. `set_realized_init(True)` switches every model built
afterwards to the realized scheme (verified std-for-std against torch).
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

# torch default Linear/Conv init: kaiming_uniform(a=sqrt(5)) fan_in
# = U(+-sqrt(1/fan_in)) = variance_scaling(1/3, fan_in, uniform)
torch_default_uniform = jinit.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

_conv_kaiming_fanout = jinit.variance_scaling(2.0, "fan_out", "normal")

_REALIZED = False


def set_realized_init(on: bool) -> None:
    """Toggle the reference-REALIZED init scheme (see module docstring) for
    all models built after this call."""
    global _REALIZED
    _REALIZED = bool(on)


def is_realized_init() -> bool:
    return _REALIZED


def _switchable(intended, realized):
    def _init(key, shape, dtype=jnp.float32):
        return (realized if _REALIZED else intended)(key, shape, dtype)

    return _init


# convolutions: intended = ref weights_init kaiming_normal_ fan_out (dead
# code); realized = torch default conv init
kaiming_normal_fanout = _switchable(_conv_kaiming_fanout, torch_default_uniform)

zeros = jinit.zeros
ones = jinit.ones


def linear_init_for(activation):
    """Hidden-layer initializer: the reference's intended scheme, or — in
    realized mode — the torch default the reference actually applies."""
    if activation is None:
        intended = xavier_uniform
    else:
        name = (
            activation
            if isinstance(activation, str)
            else getattr(activation, "__name__", "relu")
        )
        if name in ("tanh", "sigmoid"):
            intended = xavier_uniform_tanh
        else:
            intended = kaiming_uniform_relu
    return _switchable(intended, torch_default_uniform)


# MLP `out` layers: intended = xavier (linear_init(None)); realized =
# kaiming-relu (the one branch the reference actually reaches, mlp.py:115)
mlp_out_init = _switchable(xavier_uniform, kaiming_uniform_relu)

# attention projections / generic Linears outside MLPs: intended =
# kaiming-relu (weights_init's linear_init default); realized = torch default
generic_linear_init = _switchable(kaiming_uniform_relu, torch_default_uniform)


def switchable(intended):
    """Per-site wrapper: `intended` normally; torch default in realized mode
    (the reference's weights_init never reaches these layers)."""
    return _switchable(intended, torch_default_uniform)


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

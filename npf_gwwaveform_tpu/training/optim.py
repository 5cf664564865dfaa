"""Optimizer factory: Adam + per-epoch exponential LR decay + optional
grad-norm clipping.

Parity: the reference trains everything with Adam lr=1e-3 and an
`ExponentialLR` whose per-epoch gamma decays the LR by a total factor of
`decay_lr` over the run: gamma = (1/decay_lr)^(1/max_epochs)
(utils/train.py:237-241, utils/helpers.py:35-46), plus
GradientNormClipping(1) for ConvLNP (ConvLNP.ipynb cell 12).
"""

from __future__ import annotations

from typing import Optional

import optax


def exponential_decay_gamma(decay_factor: float, max_epochs: int) -> float:
    """gamma s.t. gamma**max_epochs == 1/decay_factor (ref helpers.py:35-46)."""
    if decay_factor is None or decay_factor <= 1:
        return 1.0
    return (1.0 / decay_factor) ** (1.0 / max_epochs)


def make_optimizer(
    lr: float = 1e-3,
    decay_lr: Optional[float] = 10.0,
    max_epochs: int = 100,
    steps_per_epoch: int = 1,
    grad_clip_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    gamma = exponential_decay_gamma(decay_lr, max_epochs)
    if gamma < 1.0:
        schedule = optax.exponential_decay(
            init_value=lr,
            transition_steps=steps_per_epoch,
            decay_rate=gamma,
            staircase=True,  # per-epoch stepping like torch ExponentialLR
        )
    else:
        schedule = lr
    tx = optax.adam(schedule)
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx

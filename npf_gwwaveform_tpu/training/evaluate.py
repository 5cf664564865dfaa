"""Held-out log-likelihood evaluation.

Parity target: /root/reference/utils/evaluate.py:9-28 — fixed seed 123,
criterion reduction=None, iterate the eval set, collect the NEGATIVE loss
(i.e. the log-likelihood summed over each function's target points) per
datapoint. The resulting vector is what the reference writes to `eval.csv`
(utils/train.py:315-329) and what BASELINE.md means.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def eval_loglike(trainer, state, dataset, batch_size: int = 64, seed: int = 123):
    """Returns np.array of per-function summed log-likelihoods."""
    key = jax.random.PRNGKey(seed)
    out = []
    for x, y in dataset.epoch_batches(batch_size):
        key, k = jax.random.split(key)
        loss = trainer.eval_step(state, x, y, k)  # [B] negative LL
        out.append(np.asarray(jax.device_get(loss)))
    return -np.concatenate(out) if out else np.zeros((0,))

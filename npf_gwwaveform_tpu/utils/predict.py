"""Prediction wrapper.

Parity target: /root/reference/npf/utils/predict.py:8-24 (`SamplePredictor`):
call the model on a split batch and return either the predictive
distribution or its mean.
"""

from __future__ import annotations

import jax


class SamplePredictor:
    """predictor = SamplePredictor(model, variables); predictor(batch) ->
    NormalDiag (is_dist=True) or predictive mean."""

    def __init__(self, model, variables, is_dist: bool = False, seed: int = 0):
        self.model = model
        self.variables = variables
        self.is_dist = is_dist
        self._key = jax.random.PRNGKey(seed)

    def __call__(self, batch):
        self._key, k = jax.random.split(self._key)
        out = self.model.apply(
            self.variables,
            batch["X_cntxt"],
            batch["Y_cntxt"],
            batch["X_trgt"],
            mask_cntxt=batch.get("mask_cntxt"),
            mask_trgt=batch.get("mask_trgt"),
            train=False,
            rngs={"latent": k},
        )
        if self.is_dist:
            return out.p_yCc
        return out.p_yCc.loc

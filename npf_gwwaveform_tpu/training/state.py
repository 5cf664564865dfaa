"""Train state pytree: params (+ mutable collections like batch_stats),
optimizer state, step counter, and the running RNG key."""

from __future__ import annotations

from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    extra_vars: Any  # e.g. {'batch_stats': ...}; empty dict if none
    opt_state: Any
    step: jax.Array
    rng: jax.Array

    @property
    def variables(self):
        return {"params": self.params, **self.extra_vars}


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    example_batch: dict,
    seed: int = 0,
) -> TrainState:
    """Initialize variables with an example (already-split) batch dict of
    X_cntxt/Y_cntxt/mask_cntxt/X_trgt/Y_trgt/mask_trgt."""
    key = jax.random.PRNGKey(seed)
    k_param, k_latent, k_run = jax.random.split(key, 3)
    kwargs = {}
    if example_batch.get("condition") is not None:
        kwargs["condition"] = example_batch["condition"]
    variables = model.init(
        {"params": k_param, "latent": k_latent},
        example_batch["X_cntxt"],
        example_batch["Y_cntxt"],
        example_batch["X_trgt"],
        example_batch.get("Y_trgt"),
        mask_cntxt=example_batch.get("mask_cntxt"),
        mask_trgt=example_batch.get("mask_trgt"),
        train=True,
        **kwargs,
    )
    variables = dict(variables)
    params = variables.pop("params")
    return TrainState(
        params=params,
        extra_vars=variables,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=k_run,
    )


def count_parameters(params) -> int:
    """Total number of trainable scalars (ref utils/helpers.py:113-117)."""
    return sum(x.size for x in jax.tree.leaves(params))

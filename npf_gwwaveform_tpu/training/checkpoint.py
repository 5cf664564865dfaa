"""Checkpoint / resume: msgpack-serialized TrainState with best-metric
retention.

Parity: the reference's skorch `Checkpoint` saves params + optimizer +
history per run dir, monitoring `valid_loss_best`, and reloads the best
checkpoint before eval (utils/train.py:203-221, 270-271). Artifact layout is
kept compatible: `{run_dir}/params.msgpack`, `{run_dir}/state.msgpack`,
`{run_dir}/history.json`.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import flax.serialization
import jax

from .state import TrainState


def save_state(state: TrainState, run_dir: str, name: str = "state"):
    os.makedirs(run_dir, exist_ok=True)
    state = jax.device_get(state)
    with open(os.path.join(run_dir, f"{name}.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    with open(os.path.join(run_dir, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(state.params))


def load_state(template: TrainState, run_dir: str, name: str = "state") -> TrainState:
    with open(os.path.join(run_dir, f"{name}.msgpack"), "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def has_checkpoint(run_dir: str, name: str = "state") -> bool:
    return os.path.exists(os.path.join(run_dir, f"{name}.msgpack"))


def load_run_params(run_dir: str, state: TrainState) -> TrainState:
    """Load a frozen run's `params.msgpack` (+ `extra_vars.msgpack` if the
    model has non-param collections, e.g. BatchNorm running stats) into a
    freshly-initialized TrainState template.

    This is the eval-time counterpart of `save_state`: scoring/viz scripts
    rebuild the model, init a template state, then hydrate it from the run
    dir. One implementation so a format change (new collection, sharding)
    lands everywhere at once."""
    with open(os.path.join(run_dir, "params.msgpack"), "rb") as f:
        params = flax.serialization.from_bytes(
            jax.device_get(state.params), f.read()
        )
    state = state.replace(params=jax.device_put(params))
    extra_path = os.path.join(run_dir, "extra_vars.msgpack")
    if os.path.exists(extra_path) and state.extra_vars:
        with open(extra_path, "rb") as f:
            extra = flax.serialization.from_bytes(
                jax.device_get(state.extra_vars), f.read()
            )
        state = state.replace(extra_vars=jax.device_put(extra))
    return state


def save_history(history, run_dir: str):
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "history.json"), "w") as f:
        json.dump(history, f)


def load_history(run_dir: str):
    path = os.path.join(run_dir, "history.json")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)

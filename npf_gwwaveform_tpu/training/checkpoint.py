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

"""Jitted, mesh-sharded train/eval steps with the context/target splitter
fused into the compiled step.

TPU-first design vs the reference's skorch loop (utils/train.py:260-263):
* the split (context/target masks), the forward pass, the loss, and the Adam
  update compile into ONE XLA program per step — no host round trips;
* the batch is sharded over the mesh's `data` axis and parameters are
  replicated, so the gradient all-reduce is an XLA psum over ICI inserted
  automatically by `jit` (SURVEY.md §6.8);
* state is donated, keeping HBM usage flat.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..losses import BaseLossNPF
from ..parallel.mesh import (
    batch_sharding,
    constrain_targets_seq,
    has_seq_axis,
    replicated_sharding,
)
from .state import TrainState


class Trainer:
    """Bundles (model, criterion, splitter, optimizer) into compiled steps.

    splitter: callable (key, x, y) -> batch dict (see data.CntxtTrgtSplitter),
    or None if batches are already split dicts.
    """

    def __init__(
        self,
        model,
        criterion: BaseLossNPF,
        tx: optax.GradientTransformation,
        splitter: Optional[Callable] = None,
        mesh=None,
    ):
        self.model = model
        self.criterion = criterion
        self.eval_criterion = dataclasses.replace(criterion, reduction=None)
        self.tx = tx
        self.splitter = splitter
        self.mesh = mesh

        if mesh is not None:
            repl = replicated_sharding(mesh)
            shard = batch_sharding(mesh)
            self.train_step = jax.jit(
                self._train_step,
                in_shardings=(repl, shard, shard),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
            self.train_step_cond = jax.jit(
                self._train_step_cond,
                in_shardings=(repl, shard, shard, shard),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
            self.eval_step = jax.jit(
                self._eval_step,
                in_shardings=(repl, shard, shard, repl),
                out_shardings=shard,
            )
        else:
            self.train_step = jax.jit(self._train_step, donate_argnums=(0,))
            self.train_step_cond = jax.jit(
                self._train_step_cond, donate_argnums=(0,)
            )
            self.eval_step = jax.jit(self._eval_step)

    # ------------------------------------------------------------ internals

    def _split(self, key, x, y):
        if self.splitter is None:
            raise ValueError("Trainer needs a splitter for raw (x, y) batches")
        batch = self.splitter(key, x, y)
        if has_seq_axis(self.mesh):
            # long-waveform sequence parallelism: targets sharded over `seq`
            # (parallel/mesh.py constrain_targets_seq docstring)
            batch = constrain_targets_seq(batch, self.mesh)
        return batch

    def _apply(self, params, extra_vars, batch, k_latent, train: bool):
        variables = {"params": params, **extra_vars}
        mutable = [k for k in extra_vars.keys()] if train else False
        kwargs = dict(
            mask_cntxt=batch.get("mask_cntxt"),
            mask_trgt=batch.get("mask_trgt"),
            train=train,
            rngs={"latent": k_latent},
        )
        if batch.get("condition") is not None:
            kwargs["condition"] = batch["condition"]
        if mutable:
            out, new_vars = self.model.apply(
                variables,
                batch["X_cntxt"],
                batch["Y_cntxt"],
                batch["X_trgt"],
                batch.get("Y_trgt"),
                mutable=mutable,
                **kwargs,
            )
            return out, dict(new_vars)
        out = self.model.apply(
            variables,
            batch["X_cntxt"],
            batch["Y_cntxt"],
            batch["X_trgt"],
            batch.get("Y_trgt"),
            **kwargs,
        )
        return out, extra_vars

    def _loss_fn(self, params, extra_vars, x, y, cond, k_split, k_latent):
        batch = self._split(k_split, x, y)
        if cond is not None:
            batch["condition"] = cond
        out, new_vars = self._apply(params, extra_vars, batch, k_latent, train=True)
        loss = self.criterion(
            out, batch["Y_trgt"], batch.get("mask_trgt"), train=True
        )
        return loss, new_vars

    def _train_step(self, state: TrainState, x, y):
        return self._step_impl(state, x, y, None)

    def _train_step_cond(self, state: TrainState, x, y, cond):
        return self._step_impl(state, x, y, cond)

    def _step_impl(self, state: TrainState, x, y, cond):
        rng, k_split, k_latent = jax.random.split(state.rng, 3)
        (loss, new_vars), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            state.params, state.extra_vars, x, y, cond, k_split, k_latent
        )
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            extra_vars=new_vars,
            opt_state=new_opt_state,
            step=state.step + 1,
            rng=rng,
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    def _eval_step(self, state: TrainState, x, y, key):
        """Per-datapoint eval loss [B] — NPML forced at eval
        (reference losses.py:63-69), seeded split for determinism
        (evaluate.py:11)."""
        k_split, k_latent = jax.random.split(key)
        batch = self._split(k_split, x, y)
        out, _ = self._apply(
            state.params, state.extra_vars, batch, k_latent, train=False
        )
        return self.eval_criterion(
            out, batch["Y_trgt"], batch.get("mask_trgt"), train=False
        )

    # --------------------------------------------------------- presplit API

    @partial(jax.jit, static_argnums=(0,))
    def predict(self, state: TrainState, batch: dict, key):
        """Forward pass on an already-split batch; returns the NPFOutput."""
        out, _ = self._apply(state.params, state.extra_vars, batch, key, train=False)
        return out

    # ------------------------------------------------------- scanned steps

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_steps_scanned(self, state: TrainState, xs, ys):
        """Run MANY train steps in ONE dispatch via lax.scan over stacked
        batches xs/ys [n_steps, B, ...]. This is the TPU-idiomatic epoch
        loop: host->device launch latency is paid once per epoch instead of
        once per step. Returns (state, losses [n_steps])."""

        def body(state, xy):
            x, y = xy
            new_state, m = self._train_step(state, x, y)
            return new_state, m["loss"]

        return jax.lax.scan(body, state, (xs, ys))

    @partial(jax.jit, static_argnums=(0, 2, 3), donate_argnums=(1,))
    def train_steps_generated(self, state: TrainState, sample_fn, n_steps: int):
        """Like train_steps_scanned but the batch comes from `sample_fn(key)
        -> (x, y)` INSIDE the scan (fully on-device data generation) —
        zero host involvement for n_steps steps."""

        def body(state, k):
            x, y = sample_fn(k)
            new_state, m = self._train_step(state, x, y)
            return new_state, m["loss"]

        rng, k = jax.random.split(state.rng)
        state = state.replace(rng=rng)
        return jax.lax.scan(body, state, jax.random.split(k, n_steps))

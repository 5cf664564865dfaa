"""`train_models` — the single training entry point.

Parity target: /root/reference/utils/train.py:34-349 — loops
{dataset x model x run}, per-run checkpoint dir `{root}/{data}/{model}/run_{i}`
(:194), Adam lr=1e-3 + exponential LR decay (:237-241), early stopping and
best-valid-checkpoint retention (:203-231), resume (`is_continue_train`,
:223-228), per-dataset/model kwarg overrides (:256-258), then evaluation
writing `eval.csv` + `model_summary.txt` (:264-281, :315-329).

TPU-first: each (model, dataset) pair gets ONE compiled train step (split +
forward + loss + update fused), batches stream from the on-device generators,
and the whole run is data-parallel over the mesh if one is provided.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from ..data.datasplit import CntxtTrgtSplitter, GetRandomIndcs
from ..losses import CNPFLoss
from .checkpoint import (
    has_checkpoint,
    load_state,
    save_history,
    save_state,
)
from .evaluate import eval_loglike
from .optim import make_optimizer
from .state import count_parameters, create_train_state
from .trainer import Trainer

__all__ = ["train_models"]


def _default_splitter():
    # context ~ U{0..50} of the points, targets = all (CNP.ipynb cell 5)
    return CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=0.0, b=50), targets_getter=None
    )


def write_model_summary(run_dir, model, params):
    """`model_summary.txt` run artifact: module tree + parameter count
    (reference utils/train.py:264-267 writes the torch module repr)."""
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "model_summary.txt"), "w") as f:
        f.write(repr(model) + f"\nn_params: {count_parameters(params)}\n")


def write_history(run_dir, history):
    """`history.json` run artifact: list of per-epoch dicts (reference:
    skorch history with epoch/dur/train_loss/valid_loss keys)."""
    import json

    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "history.json"), "w") as f:
        json.dump(history, f)


def train_models(
    datasets: Dict[str, object],
    models: Dict[str, object],
    criterion=None,
    test_datasets: Optional[Dict[str, object]] = None,
    valid_datasets: Optional[Dict[str, object]] = None,
    splitter: Optional[Callable] = None,
    chckpnt_dirname: str = "results/",
    max_epochs: int = 100,
    batch_size: int = 32,
    lr: float = 1e-3,
    decay_lr: Optional[float] = 10.0,
    grad_clip_norm: Optional[float] = None,
    runs: int = 1,
    starting_run: int = 0,
    seed: int = 123,
    patience: Optional[int] = None,
    is_retrain: bool = True,
    is_continue_train: bool = False,
    mesh=None,
    models_kwargs: Optional[Dict] = None,
    datasets_kwargs: Optional[Dict] = None,
    callbacks=(),
    verbose: int = 1,
):
    """Train every model on every dataset for `runs` seeds.

    datasets/models: dicts name -> dataset / flax module. criterion defaults
    to CNPFLoss. Returns {f"{data}/{model}/run_{i}": (trainer, state)}.
    """
    from ..data.datasplit import CntxtTrgtSplitter, GetRandomIndcs, get_all_indcs

    if criterion is None:
        criterion = CNPFLoss()
    if splitter is None:
        splitter = CntxtTrgtSplitter(
            contexts_getter=GetRandomIndcs(a=0.0, b=50),
            targets_getter=get_all_indcs,
        )
    models_kwargs = models_kwargs or {}
    datasets_kwargs = datasets_kwargs or {}

    results = {}
    for data_name, data_train in datasets.items():
        for model_name, model in models.items():
            # per-dataset / per-model overrides (reference train.py:256-258)
            overrides = {
                **datasets_kwargs.get(data_name, {}),
                **models_kwargs.get(model_name, {}),
            }
            this_criterion = overrides.pop("criterion", criterion)
            this_splitter = overrides.pop("splitter", splitter)
            this_batch = overrides.pop("batch_size", batch_size)
            this_clip = overrides.pop("grad_clip_norm", grad_clip_norm)
            this_epochs = overrides.pop("max_epochs", max_epochs)
            this_lr = overrides.pop("lr", lr)
            if overrides:
                model = model.clone(**overrides)

            for run in range(starting_run, starting_run + runs):
                run_dir = os.path.join(
                    chckpnt_dirname, data_name, model_name, f"run_{run}"
                )
                tag = f"{data_name}/{model_name}/run_{run}"
                trainer, state = _train_single(
                    model=model,
                    criterion=this_criterion,
                    splitter=this_splitter,
                    data_train=data_train,
                    data_valid=(valid_datasets or {}).get(data_name),
                    run_dir=run_dir,
                    max_epochs=this_epochs,
                    batch_size=this_batch,
                    lr=this_lr,
                    decay_lr=decay_lr,
                    grad_clip_norm=this_clip,
                    seed=seed + run,
                    patience=patience,
                    is_retrain=is_retrain,
                    is_continue_train=is_continue_train,
                    mesh=mesh,
                    callbacks=callbacks,
                    verbose=verbose,
                )
                results[tag] = (trainer, state)

                # evaluation -> eval.csv (reference train.py:275-281, 315-329)
                data_test = (test_datasets or {}).get(data_name)
                if data_test is not None:
                    lls = eval_loglike(
                        trainer, state, data_test, batch_size=this_batch, seed=123
                    )
                    os.makedirs(run_dir, exist_ok=True)
                    np.savetxt(os.path.join(run_dir, "eval.csv"), lls, delimiter=",")
                    if verbose:
                        print(f"{tag} | test log-likelihood {lls.mean():.2f}")
    return results


def _train_single(
    model,
    criterion,
    splitter,
    data_train,
    data_valid,
    run_dir,
    max_epochs,
    batch_size,
    lr,
    decay_lr,
    grad_clip_norm,
    seed,
    patience,
    is_retrain,
    is_continue_train,
    mesh,
    callbacks,
    verbose,
):
    steps_per_epoch = max(1, len(data_train) // batch_size)
    tx = make_optimizer(
        lr=lr,
        decay_lr=decay_lr,
        max_epochs=max_epochs,
        steps_per_epoch=steps_per_epoch,
        grad_clip_norm=grad_clip_norm,
    )
    trainer = Trainer(model, criterion, tx, splitter=splitter, mesh=mesh)

    # build an example split batch for init
    ex_x, ex_y = next(data_train.epoch_batches(batch_size))
    ex_batch = splitter(jax.random.PRNGKey(0), ex_x, ex_y)
    state = create_train_state(model, tx, ex_batch, seed=seed)

    write_model_summary(run_dir, model, state.params)

    if not is_retrain and has_checkpoint(run_dir):
        state = load_state(state, run_dir)
        return trainer, state
    if is_continue_train and has_checkpoint(run_dir):
        state = load_state(state, run_dir)

    history = []
    best_valid = np.inf
    bad_epochs = 0

    for epoch in range(max_epochs):
        t0 = time.time()
        train_losses = []
        for x, y in data_train.epoch_batches(batch_size):
            state, metrics = trainer.train_step(state, x, y)
            train_losses.append(metrics["loss"])
        train_loss = float(np.mean(jax.device_get(train_losses)))

        record = {
            "epoch": epoch + 1,
            "train_loss": train_loss,
            "dur": time.time() - t0,
        }

        if data_valid is not None:
            vkey = jax.random.PRNGKey(12345 + epoch)
            v_losses = []
            for x, y in data_valid.epoch_batches(batch_size):
                vkey, k = jax.random.split(vkey)
                v_losses.append(np.asarray(trainer.eval_step(state, x, y, k)))
            valid_loss = float(np.concatenate(v_losses).mean())
            record["valid_loss"] = valid_loss
            if valid_loss < best_valid:
                best_valid = valid_loss
                bad_epochs = 0
                save_state(state, run_dir)
            else:
                bad_epochs += 1
        else:
            save_state(state, run_dir)

        history.append(record)
        save_history(history, run_dir)
        for cb in callbacks:
            cb(epoch=epoch, history=history, state=state)
        if verbose:
            msg = f"  epoch {epoch + 1}/{max_epochs} train {train_loss:.3f}"
            if "valid_loss" in record:
                msg += f" valid {record['valid_loss']:.3f}"
            print(msg + f" ({record['dur']:.1f}s)")

        if patience is not None and bad_epochs >= patience:
            break

    # Reload the best checkpoint before eval (reference train.py:270-271).
    # A host-side python reference to an earlier epoch's state would dangle:
    # Trainer.train_step donates its input state (donate_argnums=(0,)), so
    # those buffers are freed by the next epoch's first step. The on-disk
    # best-valid checkpoint is the durable copy — load it into the (live)
    # final state's structure.
    if has_checkpoint(run_dir):
        state = load_state(state, run_dir)
    return trainer, state

"""Diagnose zsmms GridConvCNP's weak zero-shot generalization (RESULTS.md:
ours -103.8 LL/image on the offline corpus vs GridConvLNP's +1628, where the
reference has BOTH positive on MNIST-zsmms, 1253/3889).

Three measurements on a frozen run dir, separating the hypotheses:

1. `test_canvas` — the standard zero-shot eval (reproduces the table row).
2. `train_canvas` — same model, same in-painting protocol, but on the
   TRAIN-distribution canvas (single translated digit, 20px). If this is
   healthy while (1) collapses, the model works and the failure is the
   canvas change itself, not training.
3. `test_canvas_batchstats` — the zero-shot eval with BatchNorm running in
   batch-statistics mode (train=True apply, updates discarded). The test
   canvas is 2.56x the train canvas area with 2 digits on it, so per-channel
   activation statistics shift; frozen running averages from the train
   canvas misnormalize exactly when this number is much better than (1).
4. `test_canvas_adapted` — the PRINCIPLED fix the trichotomy motivates:
   `training.adapt_batch_stats` re-estimates the running averages on
   unlabeled test-canvas inputs (AdaBN), then the STANDARD frozen-stats
   eval runs. Reported as its own clearly-labeled protocol row.

Usage: python experiments/zsmms_diag.py [--model GridConvCNP] [--run run_0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="GridConvCNP")
    ap.add_argument("--run", default="run_0")
    ap.add_argument("--out", default="results/")
    ap.add_argument(
        "--n-z", type=int, default=None,
        help="override n_z_samples_test for latent models (the trained "
        "n_z=32 makes a 3-protocol CPU diagnosis intractable; the "
        "trichotomy CONTRAST, not the absolute LL, is the measurement — "
        "recorded in the output as n_z_override)",
    )
    args = ap.parse_args()

    from experiments.reproduce_img import build_model
    from npf_gwwaveform_tpu.data import get_train_test_img_dataset
    from npf_gwwaveform_tpu.data.datasplit import (
        GridCntxtTrgtSplitter,
        RandomMasker,
        no_masker,
    )
    from npf_gwwaveform_tpu.losses import CNPFLoss, NLLLossLNPF
    from npf_gwwaveform_tpu.training import (
        Trainer,
        create_train_state,
        load_run_params,
        make_optimizer,
    )

    train_ds, test_ds = get_train_test_img_dataset("zsmms")
    model = build_model(args.model, padding="CIRCULAR", norm_eps=1e-2)
    if args.n_z is not None:
        model = model.clone(n_z_samples_test=args.n_z)
    criterion = NLLLossLNPF() if "LNP" in args.model else CNPFLoss()
    eval_splitter = GridCntxtTrgtSplitter(
        context_masker=RandomMasker(a=0.0, b=0.3, is_indep_n=True),
        target_masker=no_masker,
    )
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, criterion, tx, splitter=eval_splitter)
    # The batch-stats-mode row applies with train=True, which for latent
    # models also switches to n_z_samples_train (typically 1 or 16) — a
    # different estimator than the frozen-stats rows' n_z_samples_test.
    # Clone the model so the train-mode pass draws the SAME number of z
    # samples and the trichotomy contrast stays apples-to-apples
    # (ADVICE round-4; no-op for conditional models).
    trainer_bs = trainer
    if getattr(model, "encoded_path", "deterministic") != "deterministic":
        model_bs = model.clone(n_z_samples_train=model.n_z_samples_test)
        trainer_bs = Trainer(model_bs, criterion, tx, splitter=eval_splitter)

    run_dir = os.path.join(args.out, "zsmms", args.model, args.run)
    y0 = test_ds.images[:2]
    state = create_train_state(
        model, tx, eval_splitter(jax.random.PRNGKey(0), y0, y0), seed=0
    )
    state = load_run_params(run_dir, state)

    def score(imgs, batch_stats_mode=False, eval_bs=32, state=state):
        n = (imgs.shape[0] // eval_bs) * eval_bs

        @jax.jit
        def run(state):
            def body(_, i):
                k = jax.random.fold_in(jax.random.PRNGKey(123), i)
                ks, kl = jax.random.split(k)
                y = jax.lax.dynamic_slice_in_dim(imgs, i * eval_bs, eval_bs)
                batch = eval_splitter(ks, y, y)
                tr = trainer_bs if batch_stats_mode else trainer
                out, _ = tr._apply(
                    state.params, state.extra_vars, batch, kl,
                    train=batch_stats_mode,
                )
                return None, trainer.eval_criterion(
                    out, batch["Y_trgt"], batch.get("mask_trgt"), train=False
                )

            _, nlls = jax.lax.scan(body, None, jnp.arange(n // eval_bs))
            return -nlls.reshape(-1)

        return float(np.asarray(run(state)).mean())

    res = {
        "model": args.model,
        "run": args.run,
        **({"n_z_override": args.n_z} if args.n_z is not None else {}),
        "test_canvas": score(test_ds.images),
        "train_canvas": score(train_ds.images[:1024]),
        "test_canvas_batchstats": score(test_ds.images, batch_stats_mode=True),
    }
    from npf_gwwaveform_tpu.training import adapt_batch_stats

    adapted = adapt_batch_stats(
        trainer, state, test_ds.images, jax.random.PRNGKey(7)
    )
    res["test_canvas_adapted"] = score(test_ds.images, state=adapted)
    with open(os.path.join(run_dir, "zsmms_diag.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

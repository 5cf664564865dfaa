"""Image (on-the-grid) benchmark: Grid* models in-painting the offline
digits datasets — the structural equivalent of the reference's MNIST rows
(BASELINE.md: per-image summed LL over target pixels; context = random
0-30% of pixels, targets = all).

Usage: python experiments/reproduce_img.py --model GridConvCNP [--epochs 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build_model(name, dtype=None):
    from npf_gwwaveform_tpu import CNP, AttnCNP, GridConvCNP, GridConvLNP
    from npf_gwwaveform_tpu.configs import _xy_encoder

    if name == "GridConvCNP":
        return GridConvCNP(
            y_dim=1, x_dim=1, r_dim=128, cnn_n_blocks=5, cnn_kernel_size=9,
            cnn_norm="batch", conv_kernel_size=11, dtype=dtype,
        )
    if name == "GridConvLNP":
        return GridConvLNP(
            y_dim=1, x_dim=1, r_dim=128, cnn_n_blocks=4, cnn_kernel_size=9,
            cnn_norm="batch", conv_kernel_size=11, n_z_samples_train=16,
            n_z_samples_test=32, is_global=True, dtype=dtype,
        )
    raise ValueError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="GridConvCNP")
    ap.add_argument("--dataset", default="digits")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default="results/")
    args = ap.parse_args()

    from npf_gwwaveform_tpu.data import get_train_test_img_dataset
    from npf_gwwaveform_tpu.data.datasplit import (
        GridCntxtTrgtSplitter,
        RandomMasker,
        no_masker,
    )
    from npf_gwwaveform_tpu.losses import CNPFLoss, NLLLossLNPF
    from npf_gwwaveform_tpu.training import Trainer, create_train_state, make_optimizer

    train_ds, test_ds = get_train_test_img_dataset(args.dataset)
    model = build_model(args.model)
    criterion = NLLLossLNPF() if "LNP" in args.model else CNPFLoss()
    splitter = GridCntxtTrgtSplitter(
        context_masker=RandomMasker(a=0.0, b=0.3), target_masker=no_masker
    )
    steps_per_epoch = max(1, len(train_ds) // args.batch)
    tx = make_optimizer(
        lr=1e-3, decay_lr=10.0, max_epochs=args.epochs,
        steps_per_epoch=steps_per_epoch,
        grad_clip_norm=1.0,  # batchnorm + tiny dataset oscillates unclipped
    )
    trainer = Trainer(model, criterion, tx, splitter=splitter)

    imgs = train_ds.images  # small: keep on device, index inside scan
    n_train = imgs.shape[0]

    x0, y0 = next(train_ds.epoch_batches(args.batch))
    state = create_train_state(model, tx, splitter(jax.random.PRNGKey(0), x0, y0), seed=0)

    def one_step(state, k):
        ki, ks = jax.random.split(k)
        idx = jax.random.randint(ki, (args.batch,), 0, n_train)
        y = imgs[idx]
        new_state, m = trainer._train_step(state, y, y)
        return new_state, m["loss"]

    total_steps = steps_per_epoch * args.epochs
    inner = min(100, total_steps)
    n_chunks = max(1, total_steps // inner)

    @jax.jit
    def run_chunk(state, key):
        return jax.lax.scan(one_step, state, jax.random.split(key, inner))

    t0 = time.time()
    for i in range(n_chunks):
        state, losses = run_chunk(state, jax.random.PRNGKey(5 + i))
    jax.block_until_ready(losses)
    train_time = time.time() - t0
    print(f"train {total_steps} steps in {train_time:.1f}s; final loss {float(losses.mean()):.1f}")

    # eval: per-image summed LL over all pixels, seeded context draws
    test_imgs = test_ds.images
    n_test = test_imgs.shape[0]

    @jax.jit
    def run_eval(state):
        def body(_, i):
            k = jax.random.fold_in(jax.random.PRNGKey(123), i)
            idx = jnp.arange(32) + i * 32
            y = test_imgs[idx]
            return None, trainer._eval_step(state, y, y, k)

        _, nlls = jax.lax.scan(body, None, jnp.arange(n_test // 32))
        return -nlls.reshape(-1)

    lls = np.asarray(run_eval(state))
    run_dir = os.path.join(args.out, args.dataset, args.model, "run_0")
    os.makedirs(run_dir, exist_ok=True)
    np.savetxt(os.path.join(run_dir, "eval.csv"), lls, delimiter=",")
    summary = dict(
        model=args.model, dataset=args.dataset,
        mean_test_ll=float(lls.mean()), n_test=int(lls.size),
        train_seconds=train_time,
        imgs_per_sec=total_steps * args.batch / train_time,
    )
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

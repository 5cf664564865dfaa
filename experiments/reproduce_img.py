"""Image (on-the-grid) benchmarks.

Two protocols, both per-image summed test LL over target pixels (the
reference's image rows in BASELINE.md):

* in-painting (`--dataset digits|mnist|celeba32`): context = random 0-30%
  of pixels, targets = all pixels — the reference's MNIST/CelebA protocol.
* zero-shot extrapolation (`--dataset zsmms`): train on randomly-translated
  SINGLE digits on a small canvas, test on TWO digits on a 2x canvas
  (reference ZeroShotMultiMNISTscale, utils/data/imgs.py:191-394). Only
  translation-equivariant models survive the canvas change — the reference
  pins GridConvCNP 1253 / GridConvLNP 3890 vs CNP -58552 / AttnCNP -309088
  (results/pretrained/zsmms/*/run_0/eval.csv).

Grid* models consume the boolean context mask directly; point models
(CNP/LNP/AttnCNP/AttnLNP) consume padded point sets whose coordinates are
normalized per-canvas to [-1,1] then multiplied by the test upscale factor
(ref datasplit.py:437-452) — at test on the 2x canvas their coords are
extrapolative, which is exactly what breaks non-equivariant models.

Usage: python experiments/reproduce_img.py --model GridConvCNP [--dataset zsmms]
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

POINT_MODELS = ("CNP", "LNP", "AttnCNP", "AttnLNP")


def build_model(name, dtype=None, padding="SAME", norm_eps=1e-3, y_dim=1,
                remat=False):
    """Reference image configs (ConvCNP.ipynb model_2d / model_2d_extrap):
    5 ResConvBlocks (4 for LNP) with TWO conv layers per block, k=9,
    BatchNorm2d; zsmms uses CircularPad (full translation equivariance) and
    BatchNorm eps 1e-2 ('was getting NaN'). GridConvCNPXL is the
    large-image scale config (ConvCNP.ipynb model_2d_XL: 12 blocks, k=9,
    same r_dim/decoder — 722,417 params at y_dim=3; trained on 128x128
    CelebA in the reference, on rgb_digits128 here)."""
    from npf_gwwaveform_tpu import GridConvCNP, GridConvLNP
    from npf_gwwaveform_tpu.ops.cnn import CNN

    def cnn_factory(n_blocks):
        def make(r_dim, name=None):
            return CNN(
                n_channels=r_dim, n_blocks=n_blocks, kernel_size=9,
                norm="batch", padding=padding,
                block_kwargs={"n_conv_layers": 2, "norm_eps": norm_eps},
                remat=remat, dtype=dtype, name=name,
            )

        return make

    if name == "GridConvCNPXL":
        return GridConvCNP(
            y_dim=y_dim, x_dim=1, r_dim=128, CNNFactory=cnn_factory(12),
            conv_kernel_size=11, conv_padding=padding, dtype=dtype,
        )
    if name == "GridConvCNP":
        return GridConvCNP(
            y_dim=y_dim, x_dim=1, r_dim=128, CNNFactory=cnn_factory(5),
            conv_kernel_size=11, conv_padding=padding, dtype=dtype,
        )
    if name == "GridConvLNP":
        return GridConvLNP(
            y_dim=y_dim, x_dim=1, r_dim=128, CNNFactory=cnn_factory(4),
            conv_kernel_size=11, conv_padding=padding, n_z_samples_train=16,
            n_z_samples_test=32, is_global=True, dtype=dtype,
        )
    if name in POINT_MODELS:
        # the reference's image point models are the 1-D notebook configs
        # with x_dim=2 (image coordinates), same R_DIM (ntbks add_y_dim);
        # image Attn* configs use a self-attention XY encoder instead of the
        # merge-MLP one (AttnCNP.ipynb model_2d: is_self_attn=True)
        from npf_gwwaveform_tpu.configs import gp_model_1d

        model = gp_model_1d(name, dtype=dtype).clone(x_dim=2, y_dim=y_dim)
        if name.startswith("Attn"):
            model = model.clone(is_self_attn=True, XYEncoder=None)
        return model
    raise ValueError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="GridConvCNP")
    ap.add_argument("--dataset", default="digits")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default="results/")
    ap.add_argument("--run", type=int, default=0,
                    help="run index (artifact dir run_{N}; reference layout)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize CNN blocks on the backward pass "
                    "(HBM lever for the 12-block 128px XL config)")
    args = ap.parse_args()

    from npf_gwwaveform_tpu.data import get_train_test_img_dataset
    from npf_gwwaveform_tpu.data.datasplit import (
        GridCntxtTrgtSplitter,
        PointsFromGridSplitter,
        RandomMasker,
        no_masker,
    )
    from npf_gwwaveform_tpu.losses import CNPFLoss, NLLLossLNPF
    from npf_gwwaveform_tpu.training import Trainer, create_train_state, make_optimizer

    train_ds, test_ds = get_train_test_img_dataset(args.dataset)
    y_dim = int(train_ds.shape[-1])  # 3 for rgb corpora (CelebA32 config shape)
    # zsmms: the reference's zero-shot config is circular-padded (full
    # translation equivariance across the canvas change) with BatchNorm
    # eps 1e-2 (model_2d_extrap)
    if args.dataset == "zsmms":
        model = build_model(args.model, padding="CIRCULAR", norm_eps=1e-2,
                            y_dim=y_dim, remat=args.remat)
    else:
        model = build_model(args.model, y_dim=y_dim, remat=args.remat)
    criterion = NLLLossLNPF() if "LNP" in args.model else CNPFLoss()
    is_point = args.model in POINT_MODELS
    test_upscale = getattr(train_ds, "test_upscale_factor", 1.0)
    # eval draws the context fraction PER IMAGE (unbiased estimate of the
    # same U{0..30%} protocol; see GetRandomIndcs.is_indep_n)
    eval_masker = RandomMasker(a=0.0, b=0.3, is_indep_n=True)
    if is_point:
        splitter = PointsFromGridSplitter(context_masker=RandomMasker(a=0.0, b=0.3))
        eval_splitter = PointsFromGridSplitter(
            context_masker=eval_masker,
            upscale_factor=test_upscale,
        )
    else:
        splitter = GridCntxtTrgtSplitter(
            context_masker=RandomMasker(a=0.0, b=0.3), target_masker=no_masker
        )
        eval_splitter = GridCntxtTrgtSplitter(
            context_masker=eval_masker, target_masker=no_masker
        )  # Grid models never see coordinates
    steps_per_epoch = max(1, len(train_ds) // args.batch)
    tx = make_optimizer(
        lr=1e-3, decay_lr=10.0, max_epochs=args.epochs,
        steps_per_epoch=steps_per_epoch,
        grad_clip_norm=1.0,  # batchnorm + tiny dataset oscillates unclipped
    )
    trainer = Trainer(model, criterion, tx, splitter=splitter)
    eval_trainer = Trainer(model, criterion, tx, splitter=eval_splitter)

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
    # host snapshot + retry-from-snapshot (device UNAVAILABLE blips observed
    # on the tunnel; same pattern as reproduce_gp.py)
    state_host = jax.device_get(state)
    hist = []
    i, retries = 0, 0
    while i < n_chunks:
        try:
            if state is None:
                state = jax.device_put(state_host)
            state, losses = run_chunk(state, jax.random.PRNGKey(5 + i))
            jax.block_until_ready(losses)
            state_host = jax.device_get(state)
        except Exception as e:
            retries += 1
            if retries > 5:
                raise
            print(f"chunk {i} failed ({type(e).__name__}); retrying", flush=True)
            time.sleep(15 * retries)
            state = None
            continue
        hist.append({
            "epoch": round((i + 1) * inner / steps_per_epoch, 2),
            "dur": time.time() - t0,
            "train_loss": float(losses.mean()),
        })
        if i % max(1, n_chunks // 10) == 0:
            print(
                f"chunk {i}/{n_chunks} loss {float(losses.mean()):.2f} "
                f"({(i + 1) * inner / (time.time() - t0):.0f} steps/s)",
                flush=True,
            )
        i += 1
    train_time = time.time() - t0
    print(f"train {total_steps} steps in {train_time:.1f}s; final loss {float(losses.mean()):.1f}")

    # eval: per-image summed LL over all pixels, seeded context draws.
    # zsmms: the test canvas is LARGER than the train canvas (zero-shot) —
    # the eval step simply recompiles for the new grid shape.
    test_imgs = test_ds.images
    n_test = test_imgs.shape[0]
    eval_bs = 32

    @jax.jit
    def run_eval(state):
        def body(_, i):
            k = jax.random.fold_in(jax.random.PRNGKey(123), i)
            idx = jnp.arange(eval_bs) + i * eval_bs
            y = test_imgs[idx]
            return None, eval_trainer._eval_step(state, y, y, k)

        _, nlls = jax.lax.scan(body, None, jnp.arange(n_test // eval_bs))
        return -nlls.reshape(-1)

    lls = np.asarray(run_eval(state))
    run_dir = os.path.join(args.out, args.dataset, args.model, f"run_{args.run}")
    os.makedirs(run_dir, exist_ok=True)
    np.savetxt(os.path.join(run_dir, "eval.csv"), lls, delimiter=",")
    from npf_gwwaveform_tpu.training import write_history, write_model_summary

    write_model_summary(run_dir, model, state.params)
    write_history(run_dir, hist)
    import flax.serialization

    with open(os.path.join(run_dir, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(state.params)))
    # batchnorm running stats (Grid* family) — params alone re-eval with
    # INIT stats and score garbage (same invariant as reproduce_gp.py)
    with open(os.path.join(run_dir, "extra_vars.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(state.extra_vars)))
    summary = dict(
        model=args.model, dataset=args.dataset,
        mean_test_ll=float(lls.mean()), n_test=int(lls.size),
        train_seconds=train_time,
        imgs_per_sec=total_steps * args.batch / train_time,
        epochs=args.epochs,
        eval_protocol="indep_n",
        y_dim=y_dim,
    )
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

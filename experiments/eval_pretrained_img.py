"""Image protocol-validation: port the reference's pretrained image
GridConvCNP checkpoints (results/pretrained/{zsmms,mnist}/ConvCNP) into this
framework and score them on the offline corpus under OUR eval protocol —
the same ported-bar anchoring already done for all 6 GP kernels
(results/ported_bars.jsonl).

The reference's checkpoints were trained on real MNIST digits; the offline
corpus is sklearn digits (no egress), so the bar measures how the
reference's own translation-equivariant solution transfers to this corpus
under the identical masks/metric — the honest same-footing anchor for the
zsmms table.

Usage: python experiments/eval_pretrained_img.py --dataset zsmms
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "/root/reference")

import numpy as np


def build_torch_gridconvcnp(circular: bool):
    """ConvCNP.ipynb model_2d (plain) / model_2d_extrap (zsmms, circular)."""
    from functools import partial

    import torch
    import npf as npf_torch
    from npf.architectures import CNN, MLP, ResConvBlock, discard_ith_arg
    from npf.utils.helpers import CircularPad2d, make_abs_conv, make_padded_conv

    R = 128
    kwargs = dict(
        r_dim=R,
        Decoder=discard_ith_arg(partial(MLP, n_hidden_layers=4, hidden_size=R), i=0),
    )
    cnn_kwargs = dict(ConvBlock=ResConvBlock, is_chan_last=True, n_conv_layers=2)
    if circular:
        Padder = CircularPad2d
        return npf_torch.GridConvCNP(
            x_dim=1, y_dim=1,
            CNN=partial(
                CNN,
                Normalization=partial(torch.nn.BatchNorm2d, eps=1e-2),
                Conv=make_padded_conv(torch.nn.Conv2d, Padder),
                n_blocks=5, kernel_size=9, **cnn_kwargs,
            ),
            Conv=lambda y_dim: make_padded_conv(make_abs_conv(torch.nn.Conv2d), Padder)(
                y_dim, y_dim, groups=y_dim, kernel_size=11, padding=11 // 2,
                bias=False,
            ),
            **kwargs,
        )
    return npf_torch.GridConvCNP(
        x_dim=1, y_dim=1,
        CNN=partial(
            CNN, Conv=torch.nn.Conv2d, Normalization=torch.nn.BatchNorm2d,
            n_blocks=5, kernel_size=9, **cnn_kwargs,
        ),
        **kwargs,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="zsmms", choices=["zsmms", "digits"])
    ap.add_argument("--append-bars", action="store_true",
                    help="append the row to results/ported_bars.jsonl")
    args = ap.parse_args()

    import torch

    # the reference's zsmms checkpoint is the circular-padded config; its
    # mnist checkpoint (scored on our offline `digits` corpus) the plain one
    ref_name = "zsmms" if args.dataset == "zsmms" else "mnist"
    circular = args.dataset == "zsmms"
    ckpt = f"/root/reference/results/pretrained/{ref_name}/ConvCNP/run_0/params.pt"
    sd = torch.load(ckpt, map_location="cpu")
    tm = build_torch_gridconvcnp(circular)
    tm.load_state_dict(sd)
    tm.eval()

    from npf_gwwaveform_tpu.utils.port import port_gridconvcnp_pretrained

    params, extra_vars = port_gridconvcnp_pretrained(tm)

    import jax
    import jax.numpy as jnp

    from experiments.reproduce_img import build_model
    from npf_gwwaveform_tpu.data import get_train_test_img_dataset
    from npf_gwwaveform_tpu.data.datasplit import (
        GridCntxtTrgtSplitter,
        RandomMasker,
        no_masker,
    )
    from npf_gwwaveform_tpu.losses import CNPFLoss
    from npf_gwwaveform_tpu.training import Trainer, create_train_state, make_optimizer

    if circular:
        model = build_model("GridConvCNP", padding="CIRCULAR", norm_eps=1e-2)
    else:
        model = build_model("GridConvCNP")

    _, test_ds = get_train_test_img_dataset(args.dataset)
    # identical protocol to reproduce_img.py: per-image context fraction
    # U{0..30%}, targets = all pixels, seed-123 context draws
    eval_splitter = GridCntxtTrgtSplitter(
        context_masker=RandomMasker(a=0.0, b=0.3, is_indep_n=True),
        target_masker=no_masker,
    )
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, CNPFLoss(), tx, splitter=eval_splitter)

    test_imgs = test_ds.images
    n_test = test_imgs.shape[0]
    eval_bs = 32
    y0 = test_imgs[:eval_bs]
    state = create_train_state(
        model, tx, eval_splitter(jax.random.PRNGKey(0), y0, y0), seed=0
    )
    state = state.replace(params=jax.device_get(params))
    state = state.replace(extra_vars=jax.device_get(extra_vars))

    @jax.jit
    def run_eval(state):
        def body(_, i):
            k = jax.random.fold_in(jax.random.PRNGKey(123), i)
            idx = jnp.arange(eval_bs) + i * eval_bs
            y = test_imgs[idx]
            return None, trainer._eval_step(state, y, y, k)

        _, nlls = jax.lax.scan(body, None, jnp.arange(n_test // eval_bs))
        return -nlls.reshape(-1)

    lls = np.asarray(run_eval(state))
    ref_eval = np.loadtxt(os.path.dirname(ckpt) + "/eval.csv", delimiter=",")
    row = {
        "model": "GridConvCNP",
        "kernel": args.dataset,
        "ported_pretrained_mean_ll": float(lls.mean()),
        "ported_pretrained_std": float(lls.std()),
        "reference_recorded_mean_ll": float(ref_eval.mean()),
        "n_test": int(lls.size),
        "note": f"reference {ref_name} checkpoint scored on offline corpus",
    }
    print(json.dumps(row))
    if args.append_bars:
        with open("results/ported_bars.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()

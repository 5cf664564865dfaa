"""RGB (y_dim=3) ported bars: port ALL SIX of the reference's pretrained
celeba32 checkpoints (results/pretrained/celeba32/{CNP,LNP,AttnCNP,AttnLNP,
ConvCNP,ConvLNP}/run_0/params.pt) into this framework and score them on the
offline rgb_digits corpus under OUR eval protocol — the same same-footing
anchoring the GP grid (ported_bars.jsonl) and the mnist/zsmms image rows
(eval_pretrained_img.py) already have.

The reference's checkpoints were trained on real CelebA 32x32 faces; the
offline corpus is colorized sklearn digits (no egress), so the bar measures
how the reference's own y_dim=3 solutions transfer to this corpus under
identical masks/metric. The interesting reference-side structure these bars
anchor: its recorded CelebA32 ordering has AttnLNP (5238) ABOVE both conv
models (4768/4859) — reference eval.csv files cited per row.

Configs ported (reference notebooks, image `model_2d` cells):
  CNP/LNP      — x_dim=2, sum-merge MLP xy-encoder, hidden 3*R (CNP.ipynb)
  AttnCNP/LNP  — is_self_attn=True (2-layer transformer self-attention
                 xy-encoder + cross-attender; AttnCNP.ipynb model_2d)
  ConvCNP      — GridConvCNP 5 blocks k=9, abs-conv k=11 (ConvCNP.ipynb)
  ConvLNP      — GridConvLNP 4+4 blocks k=9, Linear decoder, is_global
                 (ConvLNP.ipynb model_2d)

Usage: python experiments/eval_pretrained_rgb.py [--models CNP,LNP,...]
       [--append-bars]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "/root/reference")

import numpy as np

REF_ROOT = "/root/reference/results/pretrained/celeba32"
R = 128


def build_torch_img_model(name: str):
    """The reference notebooks' image (2-D) configs at y_dim=3."""
    from functools import partial

    import torch
    import npf as npf_torch
    from npf.architectures import CNN, MLP, ResConvBlock, merge_flat_input

    if name == "CNP":
        return npf_torch.CNP(
            x_dim=2, y_dim=3, r_dim=R,
            XYEncoder=merge_flat_input(
                partial(MLP, n_hidden_layers=2, hidden_size=R * 3), is_sum_merge=True
            ),
        )
    if name == "LNP":
        return npf_torch.LNP(
            x_dim=2, y_dim=3, r_dim=R, is_q_zCct=True,
            n_z_samples_train=1, n_z_samples_test=32,
            XYEncoder=merge_flat_input(
                partial(MLP, n_hidden_layers=2, hidden_size=R * 3), is_sum_merge=True
            ),
        )
    if name == "AttnCNP":
        return npf_torch.AttnCNP(
            x_dim=2, y_dim=3, r_dim=R, attention="transformer",
            is_self_attn=True,
        )
    if name == "AttnLNP":
        return npf_torch.AttnLNP(
            x_dim=2, y_dim=3, r_dim=R, attention="transformer",
            is_q_zCct=True, n_z_samples_train=1, n_z_samples_test=8,
            is_self_attn=True,
        )
    if name == "ConvCNP":
        # plain-padded GridConvCNP (eval_pretrained_img.build_torch_gridconvcnp
        # covers the y_dim=1 variants; this is the same config at y_dim=3)
        from npf.architectures import discard_ith_arg
        import torch.nn as nn

        return npf_torch.GridConvCNP(
            x_dim=1, y_dim=3, r_dim=R,
            Decoder=discard_ith_arg(partial(MLP, n_hidden_layers=4, hidden_size=R), i=0),
            CNN=partial(
                CNN, Conv=nn.Conv2d, Normalization=nn.BatchNorm2d,
                n_blocks=5, kernel_size=9, ConvBlock=ResConvBlock,
                is_chan_last=True, n_conv_layers=2,
            ),
        )
    if name == "ConvLNP":
        import torch.nn as nn

        return npf_torch.GridConvLNP(
            x_dim=1, y_dim=3, r_dim=R,
            is_q_zCct=False, n_z_samples_train=16, n_z_samples_test=32,
            CNN=partial(
                CNN, Conv=nn.Conv2d, Normalization=nn.BatchNorm2d,
                n_blocks=4, kernel_size=9, ConvBlock=ResConvBlock,
                is_chan_last=True, n_conv_layers=2,
            ),
            is_global=True,
        )
    raise ValueError(name)


def port_img(name: str, tm):
    """Returns (params, extra_vars)."""
    from npf_gwwaveform_tpu.utils.port import (
        port_attncnp_selfattn,
        port_cnp,
        port_gridconvcnp_pretrained,
    )
    from npf_gwwaveform_tpu.utils.port_latent import (
        _port_latent_bits,
        port_attnlnp_selfattn,
        port_gridconvlnp_pretrained,
        port_lnp,
    )

    if name == "CNP":
        return port_cnp(tm), {}
    if name == "LNP":
        return port_lnp(tm), {}
    if name == "AttnCNP":
        return port_attncnp_selfattn(tm), {}
    if name == "AttnLNP":
        return port_attnlnp_selfattn(tm), {}
    if name == "ConvCNP":
        return port_gridconvcnp_pretrained(tm)
    if name == "ConvLNP":
        return port_gridconvlnp_pretrained(tm)
    raise ValueError(name)


def build_jax_img_model(name: str):
    """Our model at the EXACT celeba32 checkpoint architecture (y_dim=3)."""
    from experiments.reproduce_img import build_model
    from npf_gwwaveform_tpu import CNP, LNP
    from npf_gwwaveform_tpu.configs import _xy_encoder

    if name in ("CNP", "LNP"):
        # image xy-encoder hidden is 3*R (CNP.ipynb model_2d), not the 1-D
        # config's 2*R — the ported weights pin the architecture
        common = dict(y_dim=3, x_dim=2, r_dim=R)
        xy = lambda n_out: _xy_encoder(3 * R, None)(n_out, name="xy_encoder")
        if name == "CNP":
            return CNP(**common, XYEncoder=xy)
        return LNP(
            **common, XYEncoder=xy, is_q_zCct=True,
            n_z_samples_train=1, n_z_samples_test=32,
        )
    ours_name = {"ConvCNP": "GridConvCNP", "ConvLNP": "GridConvLNP"}.get(name, name)
    return build_model(ours_name, y_dim=3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="CNP,LNP,AttnCNP,AttnLNP,ConvCNP,ConvLNP")
    ap.add_argument("--append-bars", action="store_true",
                    help="append rows to results/ported_bars.jsonl")
    ap.add_argument("--n-z", type=int, default=None,
                    help="override n_z_samples_test for latent models "
                    "(CPU tractability; recorded in the row)")
    args = ap.parse_args()

    import torch

    import jax
    import jax.numpy as jnp

    from experiments.reproduce_img import POINT_MODELS
    from npf_gwwaveform_tpu.data import get_train_test_img_dataset
    from npf_gwwaveform_tpu.data.datasplit import (
        GridCntxtTrgtSplitter,
        PointsFromGridSplitter,
        RandomMasker,
        no_masker,
    )
    from npf_gwwaveform_tpu.losses import CNPFLoss, NLLLossLNPF
    from npf_gwwaveform_tpu.training import Trainer, create_train_state, make_optimizer

    _, test_ds = get_train_test_img_dataset("rgb_digits")
    test_imgs = test_ds.images
    eval_bs = 32
    n_test = (test_imgs.shape[0] // eval_bs) * eval_bs

    for name in args.models.split(","):
        ckpt = f"{REF_ROOT}/{name}/run_0/params.pt"
        sd = torch.load(ckpt, map_location="cpu")
        tm = build_torch_img_model(name)
        tm.load_state_dict(sd)
        tm.eval()
        params, extra_vars = port_img(name, tm)

        model = build_jax_img_model(name)
        if args.n_z is not None and "LNP" in name:
            model = model.clone(n_z_samples_test=args.n_z)
        criterion = NLLLossLNPF() if "LNP" in name else CNPFLoss()
        # identical protocol to reproduce_img.py eval: per-image context
        # fraction U{0..30%}, targets = all pixels, seed-123 context draws
        masker = RandomMasker(a=0.0, b=0.3, is_indep_n=True)
        if name in POINT_MODELS:
            eval_splitter = PointsFromGridSplitter(context_masker=masker)
        else:
            eval_splitter = GridCntxtTrgtSplitter(
                context_masker=masker, target_masker=no_masker
            )
        tx = make_optimizer(lr=1e-3, decay_lr=None)
        trainer = Trainer(model, criterion, tx, splitter=eval_splitter)
        y0 = jnp.asarray(test_imgs[:eval_bs])
        state = create_train_state(
            model, tx, eval_splitter(jax.random.PRNGKey(0), y0, y0), seed=0
        )
        state = state.replace(params=jax.device_get(params))
        if extra_vars:
            state = state.replace(extra_vars=jax.device_get(extra_vars))

        @jax.jit
        def run_eval(state):
            def body(_, i):
                k = jax.random.fold_in(jax.random.PRNGKey(123), i)
                y = jax.lax.dynamic_slice_in_dim(
                    jnp.asarray(test_imgs), i * eval_bs, eval_bs
                )
                return None, trainer._eval_step(state, y, y, k)

            _, nlls = jax.lax.scan(body, None, jnp.arange(n_test // eval_bs))
            return -nlls.reshape(-1)

        lls = np.asarray(run_eval(state))
        ref_eval = np.loadtxt(os.path.dirname(ckpt) + "/eval.csv", delimiter=",")
        row = {
            "model": name,
            "kernel": "rgb_digits",
            "ported_pretrained_mean_ll": float(lls.mean()),
            "ported_pretrained_std": float(lls.std()),
            "reference_recorded_mean_ll": float(ref_eval.mean()),
            "n_test": int(lls.size),
            "note": "reference celeba32 checkpoint scored on offline rgb corpus",
            **({"n_z_override": args.n_z} if args.n_z is not None and "LNP" in name else {}),
        }
        print(json.dumps(row), flush=True)
        if args.append_bars:
            with open("results/ported_bars.jsonl", "a") as f:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()

"""Ported bars for the objective-ablation grid (Losses.ipynb).

Ports the reference's checked-in ablation checkpoints
(/root/reference/results/models/RBF_Kernel/{LNP,AttnLNP,ConvLNP}_ELBO*_LatLB*_SigLB*/run_0/params.pt)
into this framework and scores them under OUR eval protocol (indep_n count
draw, seed 123, NPML-forced with the reference's q_zCct eval semantics) —
extending the three-way recorded/bar/ours comparison to the ablation axis,
exactly as experiments/eval_pretrained.py does for the main 6x6 grid.

Torch-side model configs mirror Losses.ipynb cell 6 (`get_lnp`,
`get_attnlnp`, `get_convlnp` + the `models` dict comprehension): NPML uses
is_q_zCct=False with n_z_train 32/8/16; SigLB toggles min_sigma_pred
0.01/1e-4; LatLB toggles the q_z scale transform between the npf default
(0.1+0.9*sigmoid) and 1e-4+(1-1e-4)*softplus; the ConvLNP variant uses
z_dim=16, is_global=False and a Linear x-discarding decoder.

Usage:
  python experiments/eval_pretrained_ablation.py \
      --variant ConvLNP_ELBOFalse_LatLBTrue_SigLBFalse [--append]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "/root/reference")

import numpy as np


def parse_variant(variant: str):
    base, rest = variant.split("_ELBO")
    flags = {}
    flags["ELBO"] = rest.startswith("True")
    flags["LatLB"] = "_LatLBTrue" in variant
    flags["SigLB"] = "_SigLBTrue" in variant
    return base, flags


def build_torch_variant(name: str, is_elbo: bool, is_lat_lb: bool, is_sig_lb: bool):
    """Losses.ipynb cell 6 getters, verbatim configs."""
    from functools import partial

    import torch
    import torch.nn.functional as F

    import npf as npf_torch
    from npf.architectures import (
        CNN,
        MLP,
        ResConvBlock,
        SetConv,
        discard_ith_arg,
        merge_flat_input,
    )

    R = 128
    is_mle = not is_elbo
    min_sigma_pred = 0.01 if is_sig_lb else 1e-4
    min_lat = None if is_lat_lb else 1e-4
    std_kwargs = dict(
        p_y_scale_transformer=lambda s: min_sigma_pred
        + (1 - min_sigma_pred) * F.softplus(s)
    )
    if min_lat is not None:
        std_kwargs["q_z_scale_transformer"] = lambda s: min_lat + (
            1 - min_lat
        ) * F.softplus(s)

    if name == "LNP":
        return npf_torch.LNP(
            x_dim=1, y_dim=1, r_dim=R,
            is_q_zCct=not is_mle,
            n_z_samples_train=32 if is_mle else 1,
            n_z_samples_test=32,
            XEncoder=partial(MLP, n_hidden_layers=1, hidden_size=R),
            Decoder=merge_flat_input(
                partial(MLP, n_hidden_layers=4, hidden_size=R), is_sum_merge=True
            ),
            XYEncoder=merge_flat_input(
                partial(MLP, n_hidden_layers=2, hidden_size=R * 2), is_sum_merge=True
            ),
            **std_kwargs,
        )
    if name == "AttnLNP":
        return npf_torch.AttnLNP(
            x_dim=1, y_dim=1, r_dim=R,
            is_q_zCct=not is_mle,
            n_z_samples_train=8 if is_mle else 1,
            n_z_samples_test=8,
            attention="transformer",
            XYEncoder=merge_flat_input(
                partial(MLP, n_hidden_layers=2, hidden_size=R), is_sum_merge=True
            ),
            is_self_attn=False,
            **std_kwargs,
        )
    if name == "ConvLNP":
        # The checked-in ablation checkpoints predate the current notebook
        # cell's z_dim=16 config: their state dicts are the z_dim=128
        # HEADLINE architecture (latent_encoder.out is [256,128], no
        # reshaper_z) — build that (same module tree as
        # eval_pretrained.build_torch_model's ConvLNP).
        from experiments.eval_pretrained import build_torch_model

        return build_torch_model("ConvLNP")
    raise ValueError(name)


def port_variant(name: str, tm):
    if name == "LNP":
        from npf_gwwaveform_tpu.utils.port_latent import port_lnp

        return port_lnp(tm), {}
    if name == "AttnLNP":
        from npf_gwwaveform_tpu.utils.port_latent import port_attnlnp

        return port_attnlnp(tm), {}
    if name == "ConvLNP":
        from npf_gwwaveform_tpu.utils.port_latent import port_convlnp_pretrained

        return port_convlnp_pretrained(tm)
    raise ValueError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True,
                    help="e.g. ConvLNP_ELBOFalse_LatLBTrue_SigLBFalse")
    ap.add_argument("--kernel", default="RBF_Kernel")
    ap.add_argument("--n-test", type=int, default=2560)
    ap.add_argument("--append", action="store_true",
                    help="append the row to results/ported_bars.jsonl")
    ap.add_argument("--is-global", default="auto", choices=("auto", "true", "false"),
                    help="ConvLNP only: is_global is parameterless in torch "
                    "(split+mean-pool), so the state dict cannot disambiguate "
                    "it; 'auto' probes both on 512 fns and keeps the one "
                    "scoring closer to the recorded eval.csv")
    args = ap.parse_args()

    base, flags = parse_variant(args.variant)

    import torch

    ckpt = (
        f"/root/reference/results/models/{args.kernel}/{args.variant}"
        "/run_0/params.pt"
    )
    sd = torch.load(ckpt, map_location="cpu")
    tm = build_torch_variant(base, flags["ELBO"], flags["LatLB"], flags["SigLB"])
    tm.load_state_dict(sd)
    tm.eval()
    params, extra_vars = port_variant(base, tm)
    ref_eval = np.loadtxt(os.path.dirname(ckpt) + "/eval.csv", delimiter=",")

    import jax
    import jax.numpy as jnp

    from npf_gwwaveform_tpu.configs import gp_model_variant
    from npf_gwwaveform_tpu.data import (
        CntxtTrgtSplitter,
        GetRandomIndcs,
        GPSampler,
        get_all_indcs,
    )
    from npf_gwwaveform_tpu.data.gp import KERNEL_CONFIGS
    from npf_gwwaveform_tpu.losses import ELBOLossLNPF, NLLLossLNPF
    from npf_gwwaveform_tpu.training import Trainer, create_train_state, make_optimizer

    criterion = ELBOLossLNPF() if flags["ELBO"] else NLLLossLNPF()
    sampler = GPSampler(n_points=128, **KERNEL_CONFIGS[args.kernel])
    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=0.0, b=50, is_indep_n=True),
        targets_getter=get_all_indcs,
    )
    tx = make_optimizer(lr=1e-3, decay_lr=None)

    def evaluate(n_test, is_global=None):
        # cnn_norm_eps=1e-5: pretrained checkpoints carry torch-default
        # BatchNorm running stats (see eval_pretrained.py)
        model = gp_model_variant(
            base, flags["ELBO"], flags["LatLB"], flags["SigLB"],
            cnn_norm_eps=1e-5, headline_arch=base == "ConvLNP",
        )
        if is_global is not None:
            model = model.clone(is_global=is_global)
        trainer = Trainer(model, criterion, tx, splitter=splitter)
        key = jax.random.PRNGKey(0)
        x0, y0 = sampler.sample(key, 32)
        state = create_train_state(model, tx, splitter(key, x0, y0), seed=0)
        state = state.replace(params=jax.device_get(params))
        if extra_vars:
            state = state.replace(extra_vars=jax.device_get(extra_vars))

        eval_bs = 256
        n_eval_batches = n_test // eval_bs
        k_data, k_split = jax.random.split(jax.random.PRNGKey(123))

        @jax.jit
        def run_eval(state):
            def body(_, i):
                x, y = sampler.sample(jax.random.fold_in(k_data, i), eval_bs)
                return None, trainer._eval_step(
                    state, x, y, jax.random.fold_in(k_split, i)
                )

            _, nlls = jax.lax.scan(body, None, jnp.arange(n_eval_batches))
            return -nlls.reshape(-1)

        return np.asarray(run_eval(state))

    chosen_global = None
    if base == "ConvLNP":
        if args.is_global == "auto":
            rec_mean = float(ref_eval.mean())
            probes = {g: float(evaluate(512, is_global=g).mean())
                      for g in (True, False)}
            chosen_global = min(probes, key=lambda g: abs(probes[g] - rec_mean))
            print(json.dumps({"is_global_probe": probes,
                              "recorded": rec_mean,
                              "chosen": chosen_global}))
        else:
            chosen_global = args.is_global == "true"

    lls = evaluate(args.n_test, is_global=chosen_global)
    row = {
        "model": args.variant,
        "kernel": args.kernel,
        "ported_pretrained_mean_ll": float(lls.mean()),
        "ported_pretrained_std": float(lls.std()),
        "reference_recorded_mean_ll": float(ref_eval.mean()),
        "n_test": int(lls.size),
    }
    if chosen_global is not None:
        row["convlnp_is_global"] = bool(chosen_global)
    print(json.dumps(row))
    if args.append:
        with open("results/ported_bars.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()

"""Generate the reference's qualitative visual artifacts from our trained
checkpoints: per-model posterior-sample figures over a context-size sweep,
with the oracle-GP overlay, plus the sweep GIF (reference jupyter/gifs/*,
produced by utils/ntbks_helpers.py `plot_multi_posterior_samples_1d` /
`multi_posterior_gp_gif` — our viz/visualize_1d.py + viz/helpers.giffify).

Runs on CPU from checked-in run artifacts; writes results/viz/.

Usage:
  python experiments/make_viz.py --kernel RBF_Kernel --model ConvCNP
  python experiments/make_viz.py --all   # every run dir with params.msgpack
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")

import flax.serialization
import jax
import matplotlib.pyplot as plt
import numpy as np

N_CNTXT_SWEEP = (1, 2, 5, 10, 30, 50)


def viz_run(kernel: str, model_name: str, run: int = 0, out_dir: str = "results/viz"):
    from experiments.reproduce_gp import build_model, criterion_for
    from npf_gwwaveform_tpu.data import GPSampler
    from npf_gwwaveform_tpu.data.gp import KERNEL_CONFIGS
    from npf_gwwaveform_tpu.notebooks import get_n_cntxt
    from npf_gwwaveform_tpu.training import create_train_state, make_optimizer
    from npf_gwwaveform_tpu.viz.helpers import giffify, plot_config
    from npf_gwwaveform_tpu.viz.visualize_1d import plot_posterior_samples_1d

    run_dir = f"results/{kernel}/{model_name}/run_{run}"
    with open(os.path.join(run_dir, "params.msgpack"), "rb") as f:
        raw = f.read()
    extra_path = os.path.join(run_dir, "extra_vars.msgpack")
    raw_extra = open(extra_path, "rb").read() if os.path.exists(extra_path) else None

    import json

    summary = json.load(open(os.path.join(run_dir, "summary.json")))
    if "_ELBO" in model_name:
        from npf_gwwaveform_tpu.configs import gp_model_variant

        base = model_name.split("_ELBO")[0]
        flags = {
            "ELBO": "_ELBOTrue" in model_name,
            "LatLB": "_LatLBTrue" in model_name,
            "SigLB": "_SigLBTrue" in model_name,
        }
        model = gp_model_variant(
            base, flags["ELBO"], flags["LatLB"], flags["SigLB"],
            cnn_norm_eps=summary.get("norm_eps", 1e-3),
            headline_arch=summary.get("ablation_arch") == "headline",
        )
    else:
        model = build_model(model_name, norm_eps=summary.get("norm_eps", 1e-3))

    # mirror the training-time init scheme so param TREE matches the ckpt
    from npf_gwwaveform_tpu.utils import init as winit

    winit.set_realized_init(summary.get("init") == "realized")

    if kernel == "All_Kernels":
        sampler = GPSampler(n_points=128, **KERNEL_CONFIGS["RBF_Kernel"])
        oracle = sampler
    else:
        sampler = GPSampler(n_points=128, **KERNEL_CONFIGS[kernel])
        oracle = sampler

    tx = make_optimizer(lr=1e-3, decay_lr=None)
    key = jax.random.PRNGKey(7)
    splitter0 = get_n_cntxt(10)
    x, y = sampler.sample(key, 4)
    state = create_train_state(model, tx, splitter0(key, x, y), seed=0)
    params = flax.serialization.from_bytes(jax.device_get(state.params), raw)
    variables = {"params": params}
    if raw_extra is not None:
        extra = flax.serialization.from_bytes(
            jax.device_get(state.extra_vars), raw_extra
        )
        variables.update(extra)

    os.makedirs(out_dir, exist_ok=True)

    def single_fig(n_cntxt):
        batch = get_n_cntxt(n_cntxt)(jax.random.PRNGKey(3), x, y)
        fig, ax = plt.subplots(figsize=(8, 4.5))
        plot_posterior_samples_1d(
            batch, model, variables,
            gp_sampler=oracle if sampler.kernel != "variable_matern" else None,
            n_samples=3 if model.has_latent else 1,
            ax=ax,
            title=f"{model_name} | {kernel} | C={n_cntxt}",
            key=jax.random.PRNGKey(11),
        )
        fig.tight_layout()
        return fig

    with plot_config():
        for n in (2, 10, 50):
            fig = single_fig(n)
            fig.savefig(
                os.path.join(out_dir, f"{kernel}_{model_name}_c{n}.png"), dpi=90
            )
            plt.close(fig)
        giffify(
            os.path.join(out_dir, f"{kernel}_{model_name}.gif"),
            single_fig,
            "n_cntxt",
            N_CNTXT_SWEEP,
        )
    print(f"viz ok: {out_dir}/{kernel}_{model_name}*.png + .gif")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", default="RBF_Kernel")
    ap.add_argument("--model", default="ConvCNP")
    ap.add_argument("--run", type=int, default=0)
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()
    if args.all:
        for p in sorted(glob.glob("results/*_Kernel/*/run_0/params.msgpack")):
            parts = p.split(os.sep)
            try:
                viz_run(parts[1], parts[2])
            except Exception as e:
                print(f"viz FAILED {parts[1]}/{parts[2]}: {e}")
    else:
        viz_run(args.kernel, args.model, run=args.run)


if __name__ == "__main__":
    main()

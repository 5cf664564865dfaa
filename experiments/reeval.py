"""Re-evaluate finished GP runs from their persisted params under the
CURRENT eval protocol (per-function context counts, GetRandomIndcs.is_indep_n
— see that docstring for why the original per-batch-count eval was a biased,
high-variance estimate of the same expectation).

Scans results/{kernel}/{model}/run_0/params.msgpack for known GP kernels,
rewrites eval.csv and updates summary.json in place (training metadata kept,
`eval_protocol` field added).

Usage: python experiments/reeval.py [--only RBF_Kernel/AttnCNP ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def reeval_run(kernel: str, model_name: str, out="results/", n_test=10_000):
    import flax.serialization
    import jax
    import jax.numpy as jnp

    from experiments.reproduce_gp import build_model, criterion_for
    from npf_gwwaveform_tpu.data import (
        CntxtTrgtSplitter,
        GetRandomIndcs,
        GPSampler,
        get_all_indcs,
    )
    from npf_gwwaveform_tpu.data.gp import KERNEL_CONFIGS, MixtureGPSampler
    from npf_gwwaveform_tpu.training import Trainer, create_train_state, make_optimizer

    run_dir = os.path.join(out, kernel, model_name, "run_0")
    with open(os.path.join(run_dir, "params.msgpack"), "rb") as f:
        raw = f.read()
    extra_path = os.path.join(run_dir, "extra_vars.msgpack")
    raw_extra = None
    if os.path.exists(extra_path):
        with open(extra_path, "rb") as f:
            raw_extra = f.read()
    if "Conv" in model_name and raw_extra is None:
        # batchnorm running stats were not persisted: params alone re-eval
        # with INIT stats and score garbage — refuse rather than clobber
        print(json.dumps({"kernel": kernel, "model": model_name,
                          "skipped": "no extra_vars.msgpack (batchnorm stats)"}))
        return None

    if kernel == "All_Kernels":
        eval_samplers = [
            GPSampler(n_points=128, **KERNEL_CONFIGS[k])
            for k in ("RBF_Kernel", "Periodic_Kernel", "Noisy_Matern_Kernel")
        ]
        sampler = MixtureGPSampler(components=tuple(eval_samplers))
    else:
        sampler = GPSampler(n_points=128, **KERNEL_CONFIGS[kernel])
        eval_samplers = [sampler]

    # rebuild at the config the run was trained with (summary.json;
    # runs predating a knob trained at its default)
    run_summary = {}
    spath0 = os.path.join(run_dir, "summary.json")
    if os.path.exists(spath0):
        with open(spath0) as f:
            run_summary = json.load(f)
    norm_eps = run_summary.get("norm_eps", 1e-3)
    if "_ELBO" in model_name:
        # objective-ablation variant (Losses.ipynb grid): rebuild via
        # gp_model_variant from the encoded flags, e.g.
        # LNP_ELBOTrue_LatLBTrue_SigLBFalse — at the recorded arch (the
        # ConvLNP NPML cell is checked in with ablation_arch='headline';
        # the notebook arch's param tree would fail from_bytes)
        from npf_gwwaveform_tpu.configs import gp_model_variant
        from npf_gwwaveform_tpu.losses import ELBOLossLNPF, NLLLossLNPF

        base, *flag_parts = model_name.split("_")
        flags = {}
        for part in flag_parts:
            val = part.endswith("True")
            flags[part[: -len("True" if val else "False")]] = val
        model = gp_model_variant(
            base, flags["ELBO"], flags["LatLB"], flags["SigLB"],
            cnn_norm_eps=norm_eps,
            headline_arch=run_summary.get("ablation_arch") == "headline",
        )
        criterion = ELBOLossLNPF() if flags["ELBO"] else NLLLossLNPF()
    else:
        model = build_model(model_name, norm_eps=norm_eps)
        criterion = criterion_for(model_name)
    eval_splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=0.0, b=50, is_indep_n=True),
        targets_getter=get_all_indcs,
    )
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, criterion, tx, splitter=eval_splitter)

    key = jax.random.PRNGKey(0)
    x0, y0 = sampler.sample(key, 32)
    state = create_train_state(model, tx, eval_splitter(key, x0, y0), seed=0)
    params = flax.serialization.from_bytes(jax.device_get(state.params), raw)
    state = state.replace(params=jax.device_put(params))
    if raw_extra is not None:
        extra = flax.serialization.from_bytes(
            jax.device_get(state.extra_vars), raw_extra
        )
        state = state.replace(extra_vars=jax.device_put(extra))

    eval_bs = 256
    n_eval_batches = n_test // eval_bs
    k_data, k_split = jax.random.split(jax.random.PRNGKey(123))

    def make_run_eval(ev_sampler, comp):
        @jax.jit
        def run_eval(state):
            def body(_, i):
                kd = k_data if comp == 0 else jax.random.fold_in(k_data, comp)
                ks = k_split if comp == 0 else jax.random.fold_in(k_split, comp)
                x, y = ev_sampler.sample(jax.random.fold_in(kd, i), eval_bs)
                return None, trainer._eval_step(state, x, y, jax.random.fold_in(ks, i))

            _, nlls = jax.lax.scan(body, None, jnp.arange(n_eval_batches))
            return -nlls.reshape(-1)

        return run_eval

    lls = np.concatenate(
        [np.asarray(make_run_eval(ev, c)(state)) for c, ev in enumerate(eval_samplers)]
    )
    np.savetxt(os.path.join(run_dir, "eval.csv"), lls, delimiter=",")
    spath = os.path.join(run_dir, "summary.json")
    summary = {}
    if os.path.exists(spath):
        with open(spath) as f:
            summary = json.load(f)
    summary.update(
        mean_test_ll=float(lls.mean()),
        std_test_ll=float(lls.std()),
        n_test=int(lls.size),
        eval_protocol="indep_n",
    )
    with open(spath, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({"kernel": kernel, "model": model_name, **{
        k: summary[k] for k in ("mean_test_ll", "n_test")}}))
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="kernel/model pairs, e.g. RBF_Kernel/AttnCNP")
    ap.add_argument("--out", default="results/")
    args = ap.parse_args()

    from npf_gwwaveform_tpu.data.gp import KERNEL_CONFIGS

    known_kernels = set(KERNEL_CONFIGS) | {"All_Kernels"}
    targets = []
    if args.only:
        targets = [tuple(x.split("/")) for x in args.only]
    else:
        for p in sorted(glob.glob(os.path.join(args.out, "*", "*", "run_0", "params.msgpack"))):
            parts = p.split(os.sep)
            kernel, model_name = parts[-4], parts[-3]
            if kernel in known_kernels:
                # skip runs already on the current protocol
                spath = os.path.join(os.path.dirname(p), "summary.json")
                if os.path.exists(spath):
                    with open(spath) as f:
                        if json.load(f).get("eval_protocol") == "indep_n":
                            continue
                targets.append((kernel, model_name))
    for kernel, model_name in targets:
        try:
            reeval_run(kernel, model_name, out=args.out)
        except ValueError as e:
            # unknown model name: skip instead of aborting the batch rescore
            # mid-way (some eval.csvs would already have been rewritten)
            print(json.dumps({"kernel": kernel, "model": model_name,
                              "skipped": f"build failed: {e}"}))


if __name__ == "__main__":
    main()

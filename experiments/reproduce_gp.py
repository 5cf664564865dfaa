"""Reproduce the reference's 1-D GP benchmarks on TPU.

Trains {CNP, LNP, AttnCNP, AttnLNP, ConvCNP, ConvLNP} on the reference's GP
tasks with its exact recipe (BASELINE.md: Adam 1e-3, exp LR decay x10 over
the run, batch 32, 100 epochs x 50k fresh functions, context ~U{0..50} of
128 points, targets = all 128, eval = NPML n_z=32 on 10k fixed functions,
per-function summed LL) and writes eval.csv in the reference's results
layout so numbers are directly comparable to BASELINE.md.

TPU-first: functions are sampled on device INSIDE the compiled step and 50
steps run per dispatch via lax.scan — the whole 5M-function run takes ~1-2
minutes per model on one v5e chip.

Usage: python experiments/reproduce_gp.py --model CNP --kernel RBF_Kernel \
           [--epochs 100] [--out results/]
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


def build_model(name: str, dtype=None, norm_eps=1e-3):
    """Notebook-parity architectures (parameter counts verified equal to the
    reference's notebook configs — see npf_gwwaveform_tpu/configs.py)."""
    from npf_gwwaveform_tpu.configs import gp_model_1d

    return gp_model_1d(name, dtype=dtype, cnn_norm_eps=norm_eps)


def criterion_for(name: str):
    from npf_gwwaveform_tpu.configs import gp_criterion

    return gp_criterion(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="CNP")
    ap.add_argument("--kernel", default="RBF_Kernel")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--fns-per-epoch", type=int, default=50_000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-test", type=int, default=10_000)
    ap.add_argument("--out", default="results/")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument(
        "--decay-lr", type=float, default=10.0,
        help="total LR decay factor over the run (reference: x10 over 100 "
        "epochs). For runs longer than 100 epochs pass 10**(epochs/100) to "
        "keep the reference's PER-EPOCH decay rate — a x10 factor stretched "
        "over 250 epochs keeps the LR high so long that attention models "
        "diverge (observed: AttnCNP/RBF collapsed at ~epoch 130).",
    )
    ap.add_argument(
        "--per-super", type=int, default=80,
        help="chunks (x50 steps) per dispatch; smaller for heavy models",
    )
    ap.add_argument(
        "--init", choices=["intended", "realized"], default="intended",
        help="weight-init scheme: 'intended' = the reference's documented "
        "activation-gain init; 'realized' = what its init code actually "
        "does (torch defaults everywhere except MLP out layers — see "
        "utils/init.py docstring)",
    )
    ap.add_argument(
        "--norm-eps", type=float, default=1e-3,
        help="BatchNorm eps for conv-family CNNs (our stability default "
        "1e-3; the reference trained at torch's 1e-5 — sharper scales on "
        "noise-free kernels)",
    )
    ap.add_argument(
        "--ablation", default=None,
        help="objective-ablation variant 'ELBO{T|F}_LatLB{T|F}_SigLB{T|F}' "
        "(Losses.ipynb grid), e.g. ELBOFalse_LatLBTrue_SigLBFalse; "
        "only for LNP/AttnLNP/ConvLNP",
    )
    ap.add_argument(
        "--ablation-arch", default="notebook", choices=("notebook", "headline"),
        help="ConvLNP ablation architecture: 'notebook' = the current "
        "Losses.ipynb cell (z_dim=16, no global latent); 'headline' = the "
        "z_dim=128 architecture the reference's checked-in ablation "
        "checkpoints were actually trained with",
    )
    ap.add_argument(
        "--loss", default="default", choices=("default", "sumo"),
        help="objective override: 'sumo' trains with the SUMO Russian-"
        "roulette unbiased log-marginal estimator (ref losses.py:207-276) "
        "on the NPML model config (prior-sampled z, n_z > m=5); artifact "
        "dir {model}_SUMO. Latent models only",
    )
    ap.add_argument("--run", type=int, default=0,
                    help="run index (artifact dir run_{N}; reference keeps run_0)")
    ap.add_argument(
        "--resume-from", default=None,
        help="warm-start from another run dir's params.msgpack(+extra_vars) "
        "— e.g. a ported reference checkpoint written by eval_pretrained.py "
        "--port-to. Optimizer state and LR schedule restart at --lr; "
        "recorded as summary.resumed_from",
    )
    ap.add_argument("--lr", type=float, default=1e-3,
                    help="Adam peak LR (reference recipe: 1e-3; warm-start "
                    "probes of a converged optimum want its END-of-decay LR, "
                    "1e-4, to test stability rather than re-kick training)")
    args = ap.parse_args()

    from npf_gwwaveform_tpu.data import (
        CntxtTrgtSplitter,
        GetRandomIndcs,
        GPSampler,
        get_all_indcs,
    )
    from npf_gwwaveform_tpu.data.gp import KERNEL_CONFIGS, MixtureGPSampler
    from npf_gwwaveform_tpu.training import Trainer, create_train_state, make_optimizer

    if args.kernel == "All_Kernels":
        # reference All_Kernels = DatasetMerger(RBF, Periodic, Noisy_Matern)
        # (ntbks_helpers.py:118-126): train on the uniform kernel mixture,
        # eval = per-kernel fixed test chunks concatenated (10k each -> 30k)
        eval_samplers = [
            GPSampler(n_points=128, **KERNEL_CONFIGS[k])
            for k in ("RBF_Kernel", "Periodic_Kernel", "Noisy_Matern_Kernel")
        ]
        sampler = MixtureGPSampler(components=tuple(eval_samplers))
    else:
        sampler = GPSampler(n_points=128, **KERNEL_CONFIGS[args.kernel])
        eval_samplers = [sampler]
    from npf_gwwaveform_tpu.utils import init as winit

    winit.set_realized_init(args.init == "realized")
    dtype = jnp.bfloat16 if args.bf16 else None
    run_name = args.model
    if args.ablation:
        from npf_gwwaveform_tpu.configs import gp_model_variant, variant_name
        from npf_gwwaveform_tpu.losses import ELBOLossLNPF, NLLLossLNPF

        flags = dict(
            (k[: -len(v)], v == "True")
            for part in args.ablation.split("_")
            for k, v in [(part, "True" if part.endswith("True") else "False")]
        )
        is_elbo = flags["ELBO"]
        model = gp_model_variant(
            args.model, is_elbo, flags["LatLB"], flags["SigLB"], dtype=dtype,
            cnn_norm_eps=args.norm_eps,
            headline_arch=args.ablation_arch == "headline",
        )
        criterion = ELBOLossLNPF() if is_elbo else NLLLossLNPF()
        run_name = variant_name(args.model, is_elbo, flags["LatLB"], flags["SigLB"])
    elif args.loss == "sumo":
        # SUMO needs n_z > m=5 z-draws; the NPML variant config supplies
        # them (n_z_train = 32/8/16 for LNP/AttnLNP/ConvLNP) with the
        # headline scale transforms (LatLB/SigLB True)
        from npf_gwwaveform_tpu.configs import gp_model_variant
        from npf_gwwaveform_tpu.losses import SUMOLossLNPF

        model = gp_model_variant(
            args.model, is_elbo=False, is_lat_lb=True, is_sig_lb=True,
            dtype=dtype, cnn_norm_eps=args.norm_eps,
        )
        criterion = SUMOLossLNPF()
        run_name = f"{args.model}_SUMO"
    else:
        model = build_model(args.model, dtype=dtype, norm_eps=args.norm_eps)
        criterion = criterion_for(args.model)
    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=0.0, b=50), targets_getter=get_all_indcs
    )
    # eval draws the context count PER FUNCTION (same U{0..50} marginal the
    # reference evaluates under, but unbiased: per-batch shared counts over
    # 39 eval batches realize a mean of 28.5 instead of 25 — see
    # GetRandomIndcs.is_indep_n)
    eval_splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=0.0, b=50, is_indep_n=True),
        targets_getter=get_all_indcs,
    )

    steps_per_epoch = args.fns_per_epoch // args.batch
    grad_clip = 1.0 if args.model == "ConvLNP" else None
    tx = make_optimizer(
        lr=args.lr,
        decay_lr=args.decay_lr,
        max_epochs=args.epochs,
        steps_per_epoch=steps_per_epoch,
        grad_clip_norm=grad_clip,
    )
    trainer = Trainer(model, criterion, tx, splitter=splitter)
    eval_trainer = Trainer(model, criterion, tx, splitter=eval_splitter)

    key = jax.random.PRNGKey(args.seed)
    x0, y0 = sampler.sample(key, args.batch)
    state = create_train_state(model, tx, splitter(key, x0, y0), seed=args.seed)
    run_dir = os.path.join(args.out, args.kernel, run_name, f"run_{args.run}")
    if args.resume_from:
        if os.path.abspath(args.resume_from) == os.path.abspath(run_dir):
            ap.error(f"--resume-from resolves to this run's own output dir "
                     f"({run_dir}); pass a different --run")
        from npf_gwwaveform_tpu.training import load_run_params

        state = load_run_params(args.resume_from, state)

    def one_step(state, k):
        x, y = sampler.sample(k, args.batch)
        new_state, m = trainer._train_step(state, x, y)
        return new_state, m["loss"]

    # fixed valid set for best-checkpoint retention (the reference reloads
    # the best-valid-loss epoch before eval, utils/train.py:208-221, 270-271)
    k_valid = jax.random.PRNGKey(777)
    xv, yv = sampler.sample(k_valid, 1024)

    inner = 50
    total_steps = steps_per_epoch * args.epochs
    n_chunks = max(1, total_steps // inner)
    print(
        f"{args.model} on {args.kernel}: {total_steps} steps "
        f"({args.epochs} epochs x {args.fns_per_epoch} fns), {n_chunks} chunks"
    )

    # The training loop is a few medium-size dispatches of nested scans —
    # dispatch latency amortized, single executions short enough for the
    # transport. The carry is snapshotted to host after every dispatch so a
    # dropped execution (UNAVAILABLE device error) can be retried from the
    # last good state.
    def chunk_body(state, chunk_key):
        state, losses = jax.lax.scan(
            one_step, state, jax.random.split(chunk_key, inner)
        )
        return state, jnp.mean(losses)

    per_super = max(1, min(args.per_super, n_chunks))
    n_super = (n_chunks + per_super - 1) // per_super

    # Valid-loss check + best-params tracking ONCE per super (~epoch
    # granularity, matching the reference's per-epoch checkpoint monitor).
    # Checking every chunk is both slow (a full NPML eval every 50 steps)
    # and statistically biased: min-selection over thousands of correlated
    # checks on a fixed valid set picks flukes (observed: best-valid -204
    # vs honest test 81 on a diverged AttnCNP run). FIXED split key so
    # valid losses are comparable across checks.
    @jax.jit
    def run_super(carry, key):
        state, best_v, best_params = carry
        state, chunk_losses = jax.lax.scan(
            chunk_body, state, jax.random.split(key, per_super)
        )
        v = jnp.mean(eval_trainer._eval_step(state, xv, yv, k_valid))
        better = v < best_v
        best_params = jax.tree.map(
            lambda b, p: jnp.where(better, p, b), best_params, state.params
        )
        return (state, jnp.minimum(v, best_v), best_params), (chunk_losses, v)

    t0 = time.time()
    carry = (state, jnp.inf, state.params)
    carry_host = jax.device_get(carry)
    first_last = [None, None]
    hist = []
    s = 0
    retries = 0
    while s < n_super:
        try:
            if carry is None:
                # restore from the host snapshot after a drop. This MUST be
                # inside the try: the device can still be unavailable when
                # the retry fires (observed: UNAVAILABLE from device_put 5s
                # after a dropped execution killed a 19-min run)
                carry = jax.device_put(carry_host)
            carry, (chunk_losses, v_sup) = run_super(
                carry, jax.random.PRNGKey(1000 + s)
            )
            jax.block_until_ready(chunk_losses)
            # the snapshot itself can hit a dropped-device error too — keep
            # it INSIDE the retry guard (observed: FAILED_PRECONDITION from
            # device_get after a successful super)
            carry_host = jax.device_get(carry)
            cl_host = np.asarray(chunk_losses)
            v_host = float(v_sup)
        except Exception as e:  # dropped execution: retry from host snapshot
            retries += 1
            if retries > 5:
                raise
            print(f"  super {s + 1} failed ({type(e).__name__}); retrying", flush=True)
            time.sleep(15 * retries)  # back off: device blips outlast 5s
            carry = None
            continue
        cl = cl_host
        hist.append({
            "epoch": round((s + 1) * per_super * inner / steps_per_epoch, 2),
            "dur": time.time() - t0,
            "train_loss": float(cl.mean()),
            "valid_loss": v_host,
        })
        if first_last[0] is None:
            first_last[0] = float(cl[0])
        first_last[1] = float(cl[-1])
        s += 1
        print(
            f"  super {s}/{n_super} loss {cl.mean():.2f} "
            f"({(s * per_super * inner * args.batch) / (time.time() - t0):.0f} fns/s)",
            flush=True,
        )
    state, best_valid, best_params = carry
    train_time = time.time() - t0
    state = state.replace(params=best_params)
    print(
        f"  train done in {train_time:.1f}s  best valid {float(best_valid):.2f} "
        f"loss first/last: {first_last[0]:.2f}/{first_last[1]:.2f}"
    )

    # ---- evaluation: fixed 10k test functions, seed-123 splits, NPML n_z=32
    # (single dispatch: scan over eval batches on device)
    eval_bs = 256
    n_eval_batches = args.n_test // eval_bs
    k_data, k_split = jax.random.split(jax.random.PRNGKey(123))

    def make_run_eval(ev_sampler, comp):
        @jax.jit
        def run_eval(state):
            def body(_, i):
                # comp 0 keeps the exact round-1 test chunks (same fold_in)
                kd = k_data if comp == 0 else jax.random.fold_in(k_data, comp)
                ks = k_split if comp == 0 else jax.random.fold_in(k_split, comp)
                x, y = ev_sampler.sample(jax.random.fold_in(kd, i), eval_bs)
                return None, eval_trainer._eval_step(
                    state, x, y, jax.random.fold_in(ks, i)
                )

            _, nlls = jax.lax.scan(body, None, jnp.arange(n_eval_batches))
            return -nlls.reshape(-1)

        return run_eval

    # one fixed test chunk per component sampler, rows concatenated
    # (= the reference's DatasetMerger test set for All_Kernels)
    lls = np.concatenate(
        [
            np.asarray(make_run_eval(ev, c)(state))
            for c, ev in enumerate(eval_samplers)
        ]
    )

    os.makedirs(run_dir, exist_ok=True)
    np.savetxt(os.path.join(run_dir, "eval.csv"), lls, delimiter=",")
    from npf_gwwaveform_tpu.training import write_history, write_model_summary

    write_model_summary(run_dir, model, state.params)
    write_history(run_dir, hist)
    # persist best params (reference layout keeps params.pt; ours msgpack)
    import flax.serialization

    with open(os.path.join(run_dir, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(state.params)))
    # batchnorm models (Conv* family) need the trained running statistics
    # too — params alone re-evals with INIT batch stats and scores garbage
    with open(os.path.join(run_dir, "extra_vars.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(state.extra_vars)))
    summary = {
        "model": run_name,
        "kernel": args.kernel,
        "mean_test_ll": float(lls.mean()),
        "std_test_ll": float(lls.std()),
        "n_test": int(lls.size),
        "train_seconds": train_time,
        "fns_per_sec": args.epochs * args.fns_per_epoch / train_time,
        "epochs": args.epochs,
        "eval_protocol": "indep_n",
        "norm_eps": args.norm_eps,
        "init": args.init,
    }
    if args.ablation:
        summary["ablation_arch"] = args.ablation_arch
    if args.loss != "default":
        summary["loss"] = args.loss
    if args.resume_from:
        summary["resumed_from"] = args.resume_from
    if args.lr != 1e-3:
        summary["lr"] = args.lr
    if args.decay_lr != 10.0:
        # Non-default decay schedules (the x100-1000 deep-decay recipe that
        # closed Periodic AttnCNP) must be reconstructible from results/
        # alone: epochs is recorded, so decay_lr recovers the per-epoch rate
        # (ADVICE round-4; reproduce_gw.py records this identically).
        summary["decay_lr"] = args.decay_lr
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

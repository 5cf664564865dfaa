"""GW waveform NP experiment: train a model on IMRPhenomD-style waveforms
and report the north-star quality metrics — held-out NLL and waveform
MISMATCH of the NP reconstruction (BASELINE.json).

The mismatch protocol: for each held-out waveform, reveal a random context
subset of the time samples, let the NP predict the full waveform (posterior
mean), and compute the matched-filter mismatch between prediction and truth.

Usage:
  python experiments/reproduce_gw.py --model ConvCNP --steps 20000 \
      [--mode time|freq_ap] [--cond] [--bf16] [--out results/]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ConvCNP",
                    choices=["CNP", "AttnCNP", "LNP", "AttnLNP", "ConvCNP", "ConvLNP"])
    ap.add_argument("--mode", default="time", choices=["time", "freq_ap"])
    ap.add_argument("--steps", type=int, default=20_000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-points", type=int, default=256)
    ap.add_argument("--n-context", type=int, default=64)
    ap.add_argument("--n-test", type=int, default=2048)
    ap.add_argument("--cond", action="store_true", help="condition on mass/spin")
    ap.add_argument(
        "--cond-mode", default="add", choices=["add", "film"],
        help="add: global embedding added to R; film: per-position "
        "modulation of the induced grid before the CNN (ConvCNP family)",
    )
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument(
        "--density", type=int, default=None,
        help="ConvCNP induced-grid density (default 64 -> 192-pt grid over "
        "[-1.5,1.5], i.e. HALF the 256-sample signal resolution over "
        "[-1,1]; 128+ resolves the late-inspiral chirp the coarse grid "
        "aliases — the identified mismatch-tail lever)",
    )
    ap.add_argument(
        "--cnn-kernel", type=int, default=None,
        help="ConvCNP grid-CNN kernel size (default 19). Scale with "
        "--density to preserve the PHYSICAL receptive field: at density "
        "128 the default 5xk19 CNN covers half the time span it does at "
        "64, which degrades the mismatch median even as resolution helps "
        "the tail",
    )
    ap.add_argument(
        "--cnn-dilations", default=None,
        help="comma-separated per-block dilations for the grid CNN, e.g. "
        "'1,1,2,4,8' (ConvCNP has 5 blocks). Multi-scale alternative to "
        "--cnn-kernel: undilated early blocks keep fine phase resolution "
        "while dilated late blocks restore the physical receptive field a "
        "dense grid shrinks — targets getting BOTH the d64 median and the "
        "d128 tail (RESULTS.md GW analysis)",
    )
    ap.add_argument(
        "--cnn-arch", default="cnn", choices=["cnn", "unet"],
        help="grid-CNN architecture: 'cnn' = reference flat stack, 'unet' = "
        "multi-scale UnetCNN (pooled deep blocks get a large physical RF, "
        "full-resolution skips keep local phase detail — the other "
        "multi-scale lever for the GW low-Mc tail)",
    )
    ap.add_argument(
        "--banded", action="store_true",
        help="MXU banded-matmul lowering of the grid CNN's depthwise convs "
        "(ops/cnn.py _BandedDepthwise): throughput lever on moderate "
        "induced grids; same params/math to f32 rounding",
    )
    ap.add_argument(
        "--remat", action="store_true",
        help="rematerialize grid-CNN blocks on the backward pass "
        "(jax.checkpoint) — cuts peak HBM ~n_blocks x block activations in "
        "long-waveform/dense-grid configs; numerics unchanged",
    )
    ap.add_argument(
        "--loss", default=None, choices=[None, "elbo"],
        help="latent models: train with NPVI/ELBO (q(z|C,T) posterior "
        "sampling, n_z_train=1, per-sample reconstruction gradients) "
        "instead of the default NPML — causal probe for the GW latent "
        "plateau (NPML's logsumexp concentrates gradient on the best z "
        "sample, which can stall phase learning; eval still forces NPML)",
    )
    ap.add_argument(
        "--duration", type=float, default=1.0,
        help="seconds of time-domain waveform at 1024 Hz; with --n-points "
        "matching duration*1024 this is the long-waveform configuration "
        "(e.g. --duration 2 --n-points 2048)",
    )
    ap.add_argument(
        "--pallas", action="store_true",
        help="use the Pallas fused SetConv (the long-context kernel: wins "
        "end-to-end once the induced grid scales with waveform length, "
        "BENCH_DETAIL.json long_context rows; XLA wins at flagship shapes)",
    )
    ap.add_argument(
        "--no-lat-lb", action="store_true",
        help="latent models: drop the 0.1+0.9*sigmoid lower bound on the "
        "q(z) scale (the Losses.ipynb LatLBFalse form, 1e-4+softplus). "
        "Hypothesis lever for the GW ConvLNP marginal-collapse: the 0.1 "
        "per-grid-point latent noise floor may exceed the phase precision "
        "the task needs",
    )
    ap.add_argument(
        "--eval-only", action="store_true",
        help="skip training: load params.msgpack from the run dir this "
        "config maps to, re-run the eval block, and merge the new metric "
        "keys into the existing summary.json (used to rescore frozen runs "
        "when the eval protocol gains metrics, e.g. mismatch_zdraw_*)",
    )
    ap.add_argument(
        "--resume-from", default=None,
        help="warm-start training from another run dir's params.msgpack "
        "(+extra_vars). The optimizer state and LR decay schedule RESTART "
        "(reference skorch is_continue_train reloads optimizer.pt too; here "
        "the continuation re-peaks at --lr and decays over --steps — pass a "
        "lower --lr for a pure fine-tune). Recorded as summary.resumed_from",
    )
    ap.add_argument("--lr", type=float, default=1e-3,
                    help="Adam peak LR (default matches the reference's 1e-3; "
                    "small-batch long-waveform configs can need lower)")
    ap.add_argument(
        "--decay-lr", type=float, default=10.0,
        help="total LR decay factor over the run (default x10, the "
        "reference's). Doubling --steps halves the per-epoch decay rate, "
        "which keeps LR high twice as long — measured to destabilize "
        "UnetCNN at 200k steps (loss oscillates 3.5-5.6k where the 100k "
        "run descends; flat CNNs tolerate it). Scale this with the step "
        "budget (e.g. 100 for 2x steps) to preserve the per-epoch rate, "
        "as reproduce_gp.py's flag documents for GP attention models",
    )
    ap.add_argument("--clip", type=float, default=None,
                    help="grad-norm clip (default: 1.0 for ConvLNP like the "
                    "reference's GradientNormClipping, else none)")
    ap.add_argument("--out", default="results/")
    ap.add_argument("--run", type=int, default=0,
                    help="run index (artifact dir run_{i}; reference layout)")
    args = ap.parse_args()
    if args.eval_only and args.resume_from:
        # eval-only would silently win the resume elif; refuse the ambiguous
        # combination instead of evaluating the wrong params (ADVICE r3)
        ap.error("--eval-only and --resume-from are mutually exclusive: "
                 "eval-only rescores run_dir's own frozen params")

    from experiments.reproduce_gp import build_model, criterion_for
    from npf_gwwaveform_tpu.data import (
        CntxtTrgtSplitter,
        GetRandomIndcs,
        GWParameterSpace,
        GWWaveformGenerator,
        get_all_indcs,
        mismatch,
        mismatch_fd,
        psd_aligo,
    )
    from npf_gwwaveform_tpu.training import Trainer, create_train_state, make_optimizer
    from npf_gwwaveform_tpu.utils.predict import SamplePredictor

    gen = GWWaveformGenerator(duration=args.duration, sample_rate=1024.0)
    space = GWParameterSpace()
    y_dim = 1 if args.mode == "time" else 2

    dtype = jnp.bfloat16 if args.bf16 else None
    # --cnn-kernel must go through gp_model_1d: the notebook-parity configs
    # build the CNN via a CNNFactory closure, so cloning the model's
    # cnn_kernel_size field after the fact is a silent no-op (the factory's
    # captured k=19 wins — bug found when a k=37 run reproduced the k=19
    # metrics bit-for-bit under fixed seeds).
    dilations = (
        tuple(int(d) for d in args.cnn_dilations.split(",")) if args.cnn_dilations else None
    )
    if (args.cnn_kernel or dilations or args.cnn_arch != "cnn" or args.remat
            or args.banded):
        from npf_gwwaveform_tpu.configs import gp_model_1d

        model = gp_model_1d(
            args.model,
            dtype=dtype,
            cnn_kernel_size=args.cnn_kernel or 19,
            cnn_dilations=dilations,
            cnn_arch=args.cnn_arch,
            cnn_remat=args.remat,
            cnn_banded=args.banded,
        )
    else:
        model = build_model(args.model, dtype=dtype)
    model = model.clone(
        y_dim=y_dim,
        cond_dim=4 if args.cond else 0,
        cond_mode=args.cond_mode,
        **({"use_pallas_setconv": True} if args.pallas else {}),
        **({"density_induced": args.density} if args.density else {}),
        **(
            {"lat_scale_transform": "softplus", "min_lat_sigma": 1e-4}
            if args.no_lat_lb
            else {}
        ),
    )
    criterion = criterion_for(args.model)
    if args.loss == "elbo":
        from npf_gwwaveform_tpu.losses import ELBOLossLNPF

        model = model.clone(is_q_zCct=True, n_z_samples_train=1)
        criterion = ELBOLossLNPF()
    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=0.0, b=args.n_context),
        targets_getter=get_all_indcs,
    )
    # per-waveform context counts at eval (unbiased; GetRandomIndcs.is_indep_n)
    eval_splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=0.0, b=args.n_context, is_indep_n=True),
        targets_getter=get_all_indcs,
    )

    steps_per_epoch = 1562
    tx = make_optimizer(
        lr=args.lr, decay_lr=args.decay_lr,
        max_epochs=max(1, args.steps // steps_per_epoch),
        steps_per_epoch=steps_per_epoch,
        grad_clip_norm=(
            args.clip
            if args.clip is not None
            else (1.0 if args.model == "ConvLNP" else None)
        ),
    )
    trainer = Trainer(model, criterion, tx, splitter=splitter)

    n_points = args.n_points
    stride = gen.n_time // n_points
    x_grid = jnp.linspace(-1.0, 1.0, n_points)

    def make_batch(key, n, return_aux=False):
        theta = space.sample(key, n)
        aux = None
        if args.mode == "time":
            _, h = gen.time_domain(theta)
            h = h[..., -n_points * stride :: stride][..., :n_points]
            y = h[..., None]
        else:
            fd = gen.frequency_domain(theta, n_f=n_points)
            psi = fd.phase
            sigma = jnp.std(psi, -1, keepdims=True)
            psi = (psi - jnp.mean(psi, -1, keepdims=True)) / (sigma + 1e-8)
            y = jnp.stack([fd.amplitude, psi], axis=-1)
            # per-waveform phase scale: the freq_ap targets are standardized
            # (mean/std are the task's normalization convention, like the
            # amplitude's peak norm); eval denormalizes BOTH prediction and
            # truth with the same true sigma to reconstruct h(f) for the
            # physics metric
            aux = sigma[..., 0]
        x = jnp.broadcast_to(x_grid[None, :, None], (n, n_points, 1))
        if return_aux:
            return x, y, space.normalize(theta), aux
        return x, y, space.normalize(theta)

    key = jax.random.PRNGKey(0)
    x0, y0, p0 = make_batch(key, args.batch)
    ex = splitter(key, x0, y0, condition=p0 if args.cond else None)
    state = create_train_state(model, tx, ex, seed=0)

    tag = f"GW_{args.mode}" + (
        ("_cond" if args.cond_mode == "add" else "_cond_film") if args.cond else ""
    )
    tag += f"_ctx{args.n_context}"
    if args.density:
        tag += f"_d{args.density}"
    if args.cnn_kernel:
        tag += f"_k{args.cnn_kernel}"
    if dilations:
        tag += "_dil" + "-".join(str(d) for d in dilations)
    if args.cnn_arch != "cnn":
        tag += f"_{args.cnn_arch}"
    if args.banded:
        tag += "_banded"
    if args.no_lat_lb:
        tag += "_latlbF"
    if args.loss == "elbo":
        tag += "_elbo"
    if args.duration != 1.0:
        tag += f"_T{args.duration:g}s"
    if args.n_points != 256:
        tag += f"_np{args.n_points}"
    if args.pallas:
        tag += "_pallas"
    run_dir = os.path.join(args.out, tag, args.model, f"run_{args.run}")

    if args.resume_from and (
        os.path.abspath(args.resume_from) == os.path.abspath(run_dir)
    ):
        # same tag + same --run would overwrite the parent's artifacts in
        # place; force the continuation into a fresh run index (ADVICE r3)
        ap.error(f"--resume-from resolves to this run's own output dir "
                 f"({run_dir}); pass a different --run for the continuation")
    if args.eval_only:
        from npf_gwwaveform_tpu.training import load_run_params

        state = load_run_params(run_dir, state)
    elif args.resume_from:
        from npf_gwwaveform_tpu.training import load_run_params

        state = load_run_params(args.resume_from, state)

    def one_step(state, k):
        x, y, p = make_batch(k, args.batch)
        if args.cond:
            s, m = trainer._train_step_cond(state, x, y, p)
        else:
            s, m = trainer._train_step(state, x, y)
        return s, m["loss"]

    # small --steps (smoke runs) still train: shrink the dispatch chunk
    # rather than silently skipping the whole training block
    inner = max(1, min(50, args.steps))

    @jax.jit
    def run_chunk(state, key):
        return jax.lax.scan(one_step, state, jax.random.split(key, inner))

    n_chunks = 0 if args.eval_only else max(1, args.steps // inner)
    hist = []
    train_time = float("nan")
    if n_chunks:
        t0 = time.time()
        state, losses = run_chunk(state, key)
        jax.block_until_ready(losses)
        print(
            f"compile+chunk0: {time.time()-t0:.1f}s loss {float(losses.mean()):.2f}",
            flush=True,
        )
        t0 = time.time()
        # host snapshot + retry-from-snapshot so a dropped device execution
        # (UNAVAILABLE blips observed on the tunnel) resumes instead of dying
        state_host = jax.device_get(state)
        i, retries = 1, 0
        while i < n_chunks:
            try:
                if state is None:
                    state = jax.device_put(state_host)
                state, losses = run_chunk(state, jax.random.PRNGKey(10 + i))
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
                "step": (i + 1) * inner,
                "dur": time.time() - t0,
                "train_loss": float(losses.mean()),
            })
            if i % max(1, n_chunks // 10) == 0:
                # mid-run checkpoint in the run dir's resume format: a run
                # killed by a tunnel outage (observed: executions hang >20
                # min mid-chunk, then the queue timeout reaps the process)
                # warm-resumes from the last decile via --resume-from
                # instead of losing the whole leg
                import flax.serialization as _ser

                os.makedirs(run_dir, exist_ok=True)
                with open(os.path.join(run_dir, "params.msgpack"), "wb") as f:
                    f.write(_ser.to_bytes(state_host.params))
                with open(os.path.join(run_dir, "extra_vars.msgpack"), "wb") as f:
                    f.write(_ser.to_bytes(state_host.extra_vars))
                print(
                    f"chunk {i}/{n_chunks} loss {float(losses.mean()):.2f} "
                    f"({(i*inner*args.batch)/(time.time()-t0):.0f} wf/s)",
                    flush=True,
                )
            i += 1
        jax.block_until_ready(state.params)
        train_time = time.time() - t0

    # ------------------------- eval: NLL + waveform mismatch ----------------
    @jax.jit
    def eval_batch(state, key):
        kd, ks, kl = jax.random.split(key, 3)
        x, y, p, aux = make_batch(kd, 256, return_aux=True)
        batch = eval_splitter(ks, x, y, condition=p if args.cond else None)
        out, _ = trainer._apply(state.params, state.extra_vars, batch, kl, train=False)
        # per-waveform NLL with the eval criterion (NPML forced)
        nll = trainer.eval_criterion(out, batch["Y_trgt"], batch["mask_trgt"], train=False)
        # posterior-mean reconstruction for the mismatch metric
        pred = jnp.mean(out.p_yCc.loc, axis=0)  # [B, N, y_dim] over z
        if args.mode == "time":
            mm = mismatch(pred[..., 0], y[..., 0])
            # per-z-draw mismatch: a latent model's z samples each carry a
            # coherent phase, but their MIXTURE mean cancels (incoherent
            # averaging) — score each posterior draw's reconstruction and
            # average the scores, not the waveforms. For n_z=1 (CNPF
            # models) this equals the mixture-mean metric exactly.
            mm_z = jax.vmap(lambda l: mismatch(l, y[..., 0]))(out.p_yCc.loc[..., 0])
            mm_zdraw = jnp.mean(mm_z, axis=0)
        else:
            # dual-output physics metric: reconstruct h(f) = A exp(-i psi)
            # from predicted amplitude + standardized phase (denormalized
            # with the true per-waveform phase scale — the normalization
            # convention, as the amplitude's peak norm is) and score the
            # PSD-weighted FD match maximized over time/phase shifts —
            # makes the y_dim=2 config comparable to the time-domain
            # flagship on the matched-filter metric
            freqs = gen.freqs(n_points)
            psd = psd_aligo(freqs)
            sigma = aux[:, None]

            def recon(ap_):
                return ap_[..., 0] * jnp.exp(-1j * ap_[..., 1] * sigma)

            h_true = recon(y)
            mm = mismatch_fd(recon(pred), h_true, psd=psd)
            mm_z = jax.vmap(lambda l: mismatch_fd(recon(l), h_true, psd=psd))(
                out.p_yCc.loc
            )
            mm_zdraw = jnp.mean(mm_z, axis=0)
        return nll, mm, mm_zdraw

    nlls, mms, mms_zdraw, thetas = [], [], [], []
    # eval batches are a fixed 256 waveforms; at least one so smoke runs
    # with --n-test < 256 still produce eval artifacts (production n_test
    # is a multiple of 256 and is unaffected)
    for i in range(max(1, args.n_test // 256)):
        kd = jax.random.fold_in(jax.random.PRNGKey(123), i)
        nll, mm, mm_zdraw = eval_batch(state, kd)
        nlls.append(np.asarray(nll))
        # raw physical parameters of this eval batch (same kd split as
        # eval_batch's make_batch) for tail/failure-mode analysis
        thetas.append(np.asarray(space.sample(jax.random.split(kd, 3)[0], 256)))
        mms.append(np.asarray(mm))
        mms_zdraw.append(np.asarray(mm_zdraw))
    nlls = np.concatenate(nlls)

    summary = {
        "model": args.model,
        "mode": args.mode,
        "conditioned": bool(args.cond),
        "cond_mode": args.cond_mode if args.cond else None,
        "n_context": args.n_context,
        "steps": args.steps,
        "train_wf_per_sec": args.steps * args.batch / train_time,
        "test_nll_per_wf": float(nlls.mean()),
        "test_ll_per_wf": float(-nlls.mean()),
    }
    if mms:
        mm = np.concatenate(mms)
        mm_zdraw = np.concatenate(mms_zdraw)
        summary["mismatch_median"] = float(np.median(mm))
        summary["mismatch_mean"] = float(mm.mean())
        summary["mismatch_p90"] = float(np.percentile(mm, 90))
        summary["mismatch_p99"] = float(np.percentile(mm, 99))
        summary["frac_below_0.03"] = float((mm < 0.03).mean())
        summary["frac_below_0.1"] = float((mm < 0.1).mean())
        summary["mismatch_zdraw_median"] = float(np.median(mm_zdraw))
        summary["mismatch_zdraw_p90"] = float(np.percentile(mm_zdraw, 90))
        summary["zdraw_frac_below_0.03"] = float((mm_zdraw < 0.03).mean())

    if args.density:
        summary["density_induced"] = args.density
    if args.cnn_kernel:
        summary["cnn_kernel_size"] = args.cnn_kernel
    if dilations:
        summary["cnn_dilations"] = list(dilations)
    if args.cnn_arch != "cnn":
        summary["cnn_arch"] = args.cnn_arch
    if args.banded:
        summary["cnn_banded"] = True
    if args.no_lat_lb:
        summary["no_lat_lb"] = True
    if args.loss:
        summary["train_loss_objective"] = args.loss
    if args.duration != 1.0:
        summary["duration"] = args.duration
        summary["n_points"] = args.n_points
    if args.pallas:
        summary["use_pallas_setconv"] = True
    if args.resume_from:
        summary["resumed_from"] = args.resume_from
    if args.lr != 1e-3:
        summary["lr"] = args.lr
    if args.decay_lr != 10.0:
        summary["decay_lr"] = args.decay_lr
    if args.clip is not None:
        summary["grad_clip_norm"] = args.clip
    os.makedirs(run_dir, exist_ok=True)
    if args.eval_only:
        # merge new metric keys into the frozen run's summary, preserving
        # its training-time fields: `steps` does not enter the run-dir tag,
        # so a rescore invoked without repeating --steps must NOT overwrite
        # the recorded training length (nor the recorded throughput)
        with open(os.path.join(run_dir, "summary.json")) as f:
            old = json.load(f)
        train_fields = {"steps", "train_wf_per_sec"}
        summary = {**old, **{k: v for k, v in summary.items()
                             if k not in train_fields
                             and not (isinstance(v, float) and np.isnan(v))}}
    np.savetxt(os.path.join(run_dir, "eval.csv"), -nlls, delimiter=",")
    if not args.eval_only:
        from npf_gwwaveform_tpu.training import write_history, write_model_summary

        write_model_summary(run_dir, model, state.params)
        write_history(run_dir, hist)
        import flax.serialization

        with open(os.path.join(run_dir, "params.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(jax.device_get(state.params)))
        with open(os.path.join(run_dir, "extra_vars.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(jax.device_get(state.extra_vars)))
    if mms:
        # per-waveform mismatch alongside the physical parameters
        # (m1, m2, chi1, chi2 columns) — the tail is physics-correlated;
        # this is the artifact failure-mode analysis reads
        np.savetxt(
            os.path.join(run_dir, "mismatch_theta.csv"),
            np.concatenate([np.concatenate(mms)[:, None],
                            np.concatenate(thetas, axis=0)], axis=1),
            delimiter=",",
            header="mismatch,m1,m2,chi1,chi2",
        )
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

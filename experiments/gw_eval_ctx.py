"""Context-budget sweep on a FROZEN GW run: mismatch quantiles vs eval-time
context count.

The mismatch tail is concentrated at low chirp mass (gw_tail_analysis.py):
low-Mc systems put more in-band cycles on the same grid, so each phase cycle
gets fewer observed points. This probes the other side of the
resolution-vs-observation question: with the trained model FIXED, does
giving eval more context points (the model is a set function — SetConv
consumes any count) recover the tail? If yes, the tail is
observation-budget-limited (a task-spec knob); if no, it is
model-resolution-limited (an architecture lever).

Usage:
  python experiments/gw_eval_ctx.py [run_dir] --ctx 16,32,64,128,192 --n-test 1024
  python experiments/gw_eval_ctx.py --plot run_dir [run_dir ...]
Writes <run_dir>/ctx_sweep.json and prints one JSON line per budget; --plot
overlays the saved sweeps into results/viz/gw_ctx_sweep.png.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

FLAGSHIP = "results/GW_time_cond_film_ctx64/ConvCNP/run_0"


PALETTE = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]  # fixed categorical order


def plot(run_dirs, out="results/viz/gw_ctx_sweep.png", fixed=False):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    name = "ctx_sweep_fixed.json" if fixed else "ctx_sweep.json"
    if fixed:
        out = out.replace(".png", "_fixed.png")
    fig, axes = plt.subplots(1, 2, figsize=(9.5, 3.6), sharex=True)
    for (rd, color) in zip(run_dirs, PALETTE):
        rows = json.load(open(os.path.join(rd, name)))
        label = os.path.basename(os.path.dirname(os.path.dirname(rd.rstrip("/"))))
        label = label.replace("GW_time_cond_film_", "")
        ctx = [r["n_context"] for r in rows]
        for ax, key in zip(axes, ("p50", "p90")):
            ax.plot(ctx, [r[key] for r in rows], color=color, lw=2, marker="o",
                    ms=5, label=label)
    for ax, (key, bar, barlabel) in zip(
        axes,
        [("p50", 0.03, "matched-filter bar (0.03)"), ("p90", 0.1, "tail target (0.1)")],
    ):
        ax.axhline(bar, color="#8a8a85", lw=1, ls="--")
        ax.text(17, bar * 1.08, barlabel, fontsize=8, color="#6a6a66")
        ax.set_yscale("log")
        ax.set_xlabel("eval context budget (points of 256)")
        ax.set_title(f"mismatch {key}", fontsize=10)
        ax.grid(True, which="both", color="#ebebe6", lw=0.6)
        ax.set_axisbelow(True)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
    axes[0].set_ylabel("mismatch")
    axes[0].legend(fontsize=8, frameon=False, loc="lower left")
    fig.suptitle(
        "Frozen-checkpoint context sweeps: the fine grid absorbs observations, "
        "the coarse one saturates",
        fontsize=10,
    )
    fig.tight_layout()
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.savefig(out, dpi=130)
    print(json.dumps({"figure": out}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", nargs="*", default=[FLAGSHIP])
    ap.add_argument("--ctx", default="16,32,64,128,192")
    ap.add_argument(
        "--fixed", action="store_true",
        help="use EXACTLY n context points per waveform instead of the "
        "training protocol's U{0..n} draw. The U-draw tail is dominated "
        "by near-empty-context waveforms (a task-spec floor); fixed "
        "counts isolate the model's capability at a known observation "
        "budget. Writes ctx_sweep_fixed.json.",
    )
    ap.add_argument("--n-test", type=int, default=1024)
    ap.add_argument("--n-points", type=int, default=None,
                    help="eval waveform length (default: the run's n_points)")
    ap.add_argument("--plot", action="store_true",
                    help="overlay saved ctx_sweep.json files into one figure")
    args = ap.parse_args()
    if args.plot:
        plot(args.run_dir, fixed=args.fixed)
        return
    args.run_dir = args.run_dir[0]

    import flax.serialization
    import jax
    import jax.numpy as jnp

    from npf_gwwaveform_tpu.data import (
        CntxtTrgtSplitter,
        GetRandomIndcs,
        GWParameterSpace,
        GWWaveformGenerator,
        get_all_indcs,
    )
    from npf_gwwaveform_tpu.data.gw import mismatch
    from npf_gwwaveform_tpu.losses import CNPFLoss
    from npf_gwwaveform_tpu.training import (
        Trainer, create_train_state, load_run_params, make_optimizer,
    )

    with open(os.path.join(args.run_dir, "summary.json")) as f:
        summary = json.load(f)
    conditioned = bool(summary.get("conditioned"))
    # single rebuild path for frozen runs — restores EVERY recorded knob
    # (kernel/dilations/arch/density/no_lat_lb/elbo/pallas), configs.py
    from npf_gwwaveform_tpu.configs import gw_model_from_summary

    model = gw_model_from_summary(summary)

    # score on the run's own task: long-waveform runs record duration /
    # n_points (a 2 s model scored on the default 1 s signals would run
    # fine and mean nothing)
    gen = GWWaveformGenerator(
        duration=float(summary.get("duration", 1.0)), sample_rate=1024.0
    )
    space = GWParameterSpace()
    n_points = (
        args.n_points
        if args.n_points is not None
        else int(summary.get("n_points", 256))
    )
    stride = gen.n_time // n_points
    x_grid = jnp.linspace(-1.0, 1.0, n_points)

    def make_batch(key, n):
        theta = space.sample(key, n)
        _, h = gen.time_domain(theta)
        h = h[..., -n_points * stride :: stride][..., :n_points]
        x = jnp.broadcast_to(x_grid[None, :, None], (n, n_points, 1))
        return x, h[..., None], theta

    # restore once (splitter used only for state init shape)
    init_splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=0.0, b=64), targets_getter=get_all_indcs
    )
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, CNPFLoss(), tx, splitter=init_splitter)
    key = jax.random.PRNGKey(0)
    x0, y0, th0 = make_batch(key, 16)
    ex = init_splitter(
        key, x0, y0, condition=space.normalize(th0) if conditioned else None
    )
    state = create_train_state(model, tx, ex, seed=0)
    state = load_run_params(args.run_dir, state)

    bs = 256
    rows = []
    for n_ctx in [int(c) for c in args.ctx.split(",")]:
        splitter = CntxtTrgtSplitter(
            # per-waveform independent draw in [0, n_ctx] mirrors the run's
            # eval protocol (reproduce_gw.py eval_splitter, is_indep_n);
            # --fixed pins the count to exactly n_ctx instead
            contexts_getter=GetRandomIndcs(
                a=float(n_ctx) if args.fixed else 0.0,
                b=n_ctx,
                is_indep_n=not args.fixed,
            ),
            targets_getter=get_all_indcs,
        )

        @jax.jit
        def eval_batch(state, key):
            kd, ks, kl = jax.random.split(key, 3)
            x, y, theta = make_batch(kd, bs)
            cond = space.normalize(theta) if conditioned else None
            batch = splitter(ks, x, y, condition=cond)
            out, _ = trainer._apply(
                state.params, state.extra_vars, batch, kl, train=False
            )
            pred = jnp.mean(out.p_yCc.loc, axis=0)
            return mismatch(pred[..., 0], y[..., 0]), theta

        mms, mcs = [], []
        for i in range(max(1, args.n_test // bs)):
            kd = jax.random.fold_in(jax.random.PRNGKey(123), i)
            mm, theta = eval_batch(state, kd)
            mms.append(np.asarray(mm))
            th = np.asarray(theta)
            mcs.append((th[:, 0] * th[:, 1]) ** 0.6 / (th[:, 0] + th[:, 1]) ** 0.2)
        mm = np.concatenate(mms)
        mc = np.concatenate(mcs)
        lo = mc <= np.percentile(mc, 33.3)
        row = {
            "n_context": n_ctx,
            "p50": float(np.median(mm)),
            "p90": float(np.percentile(mm, 90)),
            "p99": float(np.percentile(mm, 99)),
            "low_mc_tercile_p50": float(np.median(mm[lo])),
            "low_mc_tercile_p90": float(np.percentile(mm[lo], 90)),
            "frac_below_0.03": float((mm < 0.03).mean()),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    name = "ctx_sweep_fixed.json" if args.fixed else "ctx_sweep.json"
    with open(os.path.join(args.run_dir, name), "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()

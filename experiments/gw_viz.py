"""Qualitative GW reconstruction figure from a finished reproduce_gw run.

For a handful of test waveforms spanning the chirp-mass range (the axis the
mismatch tail concentrates on — RESULTS.md GW analysis), plot the true
h+(t), the model's posterior-mean reconstruction with a +-2 sigma band, and
the observed context points, annotated with the per-waveform mismatch. This
is the GW counterpart of the 1-D posterior plots the reference renders for
every GP model (reference utils/visualize/visualize_1d.py:99; no GW viz
exists in the reference — this fork snapshot has no GW code).

Usage:
    python experiments/gw_viz.py [run_dir] [--n-context 64] [--out results/viz]
Defaults to the flagship run (results/GW_time_cond_film_ctx64/ConvCNP/run_0).
Works on CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/gw_viz.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

FLAGSHIP = "results/GW_time_cond_film_ctx64/ConvCNP/run_0"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", nargs="?", default=FLAGSHIP)
    ap.add_argument("--n-context", type=int, default=None,
                    help="context points per waveform (default: the run's)")
    ap.add_argument("--n-points", type=int, default=None,
                    help="waveform length (default: the run's n_points)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="results/viz")
    args = ap.parse_args()

    import flax.serialization
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

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
    if summary.get("mode", "time") != "time":
        raise SystemExit("gw_viz supports time-domain runs only")
    conditioned = bool(summary.get("conditioned"))
    n_context = args.n_context or int(summary.get("n_context", 64))

    # single rebuild path for frozen runs — restores EVERY recorded knob
    # (kernel/dilations/arch/density/no_lat_lb/elbo/pallas), configs.py
    from npf_gwwaveform_tpu.configs import gw_model_from_summary

    model_name = summary["model"]
    model = gw_model_from_summary(summary)

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

    # pick parameters spanning the chirp-mass axis: low-Mc equal-mass (the
    # tail regime: most in-band cycles), a mid case, and a high-Mc case
    theta = jnp.asarray(
        [
            [14.0, 12.0, 0.1, 0.0],  # Mc ~ 11.3 — tail regime
            [32.0, 25.0, 0.2, -0.1],  # Mc ~ 24.6
            [60.0, 45.0, 0.0, 0.3],  # Mc ~ 45.0 — easy regime
        ]
    )
    Mc = (theta[:, 0] * theta[:, 1]) ** 0.6 / (theta[:, 0] + theta[:, 1]) ** 0.2
    _, h = gen.time_domain(theta)
    h = h[..., -n_points * stride :: stride][..., :n_points]
    y = h[..., None]
    B = theta.shape[0]
    x = jnp.broadcast_to(x_grid[None, :, None], (B, n_points, 1))
    cond = space.normalize(theta) if conditioned else None

    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=n_context, b=n_context),
        targets_getter=get_all_indcs,
    )
    key = jax.random.PRNGKey(args.seed)
    batch = splitter(key, x, y, condition=cond)

    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, CNPFLoss(), tx, splitter=splitter)
    state = create_train_state(model, tx, batch, seed=0)
    state = load_run_params(args.run_dir, state)

    out, _ = trainer._apply(
        state.params, state.extra_vars, batch, jax.random.PRNGKey(1), train=False
    )
    loc = np.asarray(jnp.mean(out.p_yCc.loc, axis=0), dtype=np.float32)
    scale = np.asarray(jnp.mean(out.p_yCc.scale, axis=0), dtype=np.float32)
    mm = np.asarray(mismatch(jnp.asarray(loc[..., 0]), y[..., 0]))

    xs = np.asarray(x_grid)
    mask_c = np.asarray(batch["mask_cntxt"])
    xc = np.asarray(batch["X_cntxt"][..., 0])
    yc = np.asarray(batch["Y_cntxt"][..., 0])

    fig, axes = plt.subplots(B, 1, figsize=(10, 2.6 * B), sharex=True)
    for i, ax in enumerate(np.atleast_1d(axes)):
        ax.plot(xs, np.asarray(y[i, :, 0]), color="k", lw=1.0, label="true $h_+(t)$")
        ax.plot(xs, loc[i, :, 0], color="tab:blue", lw=1.0, label="posterior mean")
        ax.fill_between(
            xs,
            loc[i, :, 0] - 2 * scale[i, :, 0],
            loc[i, :, 0] + 2 * scale[i, :, 0],
            color="tab:blue",
            alpha=0.25,
            lw=0,
            label=r"$\pm 2\sigma$",
        )
        sel = mask_c[i]
        ax.scatter(xc[i][sel], yc[i][sel], s=12, color="tab:red", zorder=3,
                   label=f"context ({int(sel.sum())} pts)")
        ax.set_ylabel("strain (norm.)")
        ax.set_title(
            f"$\\mathcal{{M}}_c$ = {float(Mc[i]):.1f} $M_\\odot$   "
            f"mismatch = {float(mm[i]):.3g}",
            fontsize=10,
        )
        if i == 0:
            ax.legend(loc="upper left", fontsize=8, ncol=4)
    np.atleast_1d(axes)[-1].set_xlabel("t (normalized to [-1, 1])")
    tag = os.path.basename(os.path.dirname(os.path.dirname(args.run_dir.rstrip("/"))))
    fig.suptitle(f"{tag} / {model_name} — ctx {n_context}", fontsize=11)
    fig.tight_layout()
    os.makedirs(args.out, exist_ok=True)
    suffix = "" if args.n_context is None else f"_evalctx{n_context}"
    out_path = os.path.join(args.out, f"gw_recon_{tag}{suffix}.png")
    fig.savefig(out_path, dpi=130)
    print(json.dumps({"figure": out_path, "mismatches": [float(v) for v in mm],
                      "chirp_masses": [float(v) for v in Mc]}))


if __name__ == "__main__":
    main()

"""Figure: the extrapolation contrast made visible (the reference's
signature ConvCNP demo — its website gifs show context in the training
range and targets beyond; npf convnp.py:170-181 set_extrapolation,
visualize_1d.py:499-514 boundary lines).

One shared RBF function sampled over 2x the training range; each panel is
one frozen RBF run_0 checkpoint predicting the full range from context
confined to |x| <= 1, with the exact-GP oracle overlay. Quantitative
counterpart: experiments/eval_extrapolation.py / results/extrapolation_*.json.

Usage: python experiments/viz_extrapolation.py  (CPU is fine)
Writes results/viz/extrapolation_1d.png.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main():
    import flax.serialization
    import jax
    import jax.numpy as jnp

    from experiments.reproduce_gp import build_model
    from npf_gwwaveform_tpu.data.gp import KERNEL_CONFIGS, GPSampler
    from npf_gwwaveform_tpu.viz.visualize_1d import plot_posterior_samples_1d

    models = ["CNP", "AttnCNP", "ConvCNP", "ConvLNP"]
    sampler = GPSampler(n_points=256, **KERNEL_CONFIGS["RBF_Kernel"])
    lo, hi = sampler.min_max
    key = jax.random.PRNGKey(11)
    x, y = sampler.sample(key, 1, min_max=(2.0 * lo, 2.0 * hi))

    # context: ~25 random points inside the training range
    kc = jax.random.PRNGKey(3)
    inner = np.asarray(jnp.abs(x[0, :, 0]) <= 1.0)
    idx = np.flatnonzero(inner)
    sel = np.asarray(
        jax.random.choice(kc, idx, shape=(25,), replace=False)
    )
    mask_c = np.zeros((1, x.shape[1]), bool)
    mask_c[0, sel] = True

    batch = dict(
        X_cntxt=x, Y_cntxt=y, mask_cntxt=jnp.asarray(mask_c),
        X_trgt=x, Y_trgt=y, mask_trgt=jnp.ones_like(jnp.asarray(mask_c)),
    )

    fig, axes = plt.subplots(1, len(models), figsize=(4.4 * len(models), 3.6),
                             sharey=True)
    for name, ax in zip(models, np.atleast_1d(axes)):
        run_dir = os.path.join("results", "RBF_Kernel", name, "run_0")
        model = build_model(name)
        if hasattr(model, "induced_range"):
            model = model.clone(
                induced_range=tuple(2.0 * v for v in model.induced_range)
            )
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)},
            batch["X_cntxt"], batch["Y_cntxt"], batch["X_trgt"],
            mask_cntxt=batch["mask_cntxt"], mask_trgt=batch["mask_trgt"],
            train=False,
        )
        variables = dict(variables)
        with open(os.path.join(run_dir, "params.msgpack"), "rb") as f:
            variables["params"] = flax.serialization.from_bytes(
                jax.device_get(variables["params"]), f.read()
            )
        extra_path = os.path.join(run_dir, "extra_vars.msgpack")
        if os.path.exists(extra_path) and "batch_stats" in variables:
            with open(extra_path, "rb") as f:
                extra = flax.serialization.from_bytes(
                    jax.device_get({"batch_stats": variables["batch_stats"]}),
                    f.read(),
                )
            variables.update(extra)
        plot_posterior_samples_1d(
            batch, model, variables, gp_sampler=sampler,
            n_samples=3 if name.endswith("LNP") else 1,
            ax=ax, key=jax.random.PRNGKey(5), title=name,
        )
        ax.set_ylim(-3, 3)
    fig.suptitle(
        "Extrapolation at 2x the training range (context only in |x|<=1): "
        "conv models revert to the oracle prior, set/attn models do not",
        fontsize=11,
    )
    fig.tight_layout()
    out = "results/viz/extrapolation_1d.png"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.savefig(out, dpi=130)
    print(json.dumps({"figure": out}))


if __name__ == "__main__":
    main()

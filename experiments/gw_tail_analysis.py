"""Failure-mode analysis of the GW mismatch tail: which physical parameters
drive the worst reconstructions (reads mismatch_theta.csv written by
reproduce_gw.py).

Reports mismatch quantiles binned by chirp mass / total mass / effective
spin, plus quantiles of each parameter among the tail (worst decile) vs the
bulk. The chirp mass sets the number of in-band cycles (low Mc -> fast
chirp, more cycles to phase-track on the coarse grid), so a tail
concentrated at low Mc implicates grid resolution; a spin-correlated tail
implicates conditioning capacity.

Usage: python experiments/gw_tail_analysis.py results/GW_.../ConvCNP/run_0
       python experiments/gw_tail_analysis.py --plot run_dir [run_dir ...]
         (writes results/viz/gw_tail_mc.png overlaying mismatch-vs-Mc for
          each run — the failure-mode evidence figure)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def analyze(run_dir):
    path = os.path.join(run_dir, "mismatch_theta.csv")
    d = np.loadtxt(path, delimiter=",", skiprows=1)
    mm, m1, m2, chi1, chi2 = d.T
    mtot = m1 + m2
    eta = m1 * m2 / mtot**2
    mc = mtot * eta**0.6
    chi_eff = (m1 * chi1 + m2 * chi2) / mtot

    out = {"run": run_dir, "n": int(mm.size),
           "p50": float(np.median(mm)),
           "p90": float(np.percentile(mm, 90)),
           "p99": float(np.percentile(mm, 99))}

    tail = mm >= np.percentile(mm, 90)
    for name, v in [("chirp_mass", mc), ("total_mass", mtot),
                    ("chi_eff", chi_eff), ("mass_ratio", m2 / m1)]:
        out[f"{name}_tail_median"] = float(np.median(v[tail]))
        out[f"{name}_bulk_median"] = float(np.median(v[~tail]))

    # mismatch quantiles by chirp-mass tercile
    qs = np.percentile(mc, [33.3, 66.7])
    for i, sel in enumerate([mc < qs[0], (mc >= qs[0]) & (mc < qs[1]),
                             mc >= qs[1]]):
        out[f"mc_tercile{i}_p50"] = float(np.median(mm[sel]))
        out[f"mc_tercile{i}_p90"] = float(np.percentile(mm[sel], 90))
    return out


def plot(run_dirs, out_path="results/viz/gw_tail_mc.png"):
    """Median mismatch vs chirp-mass decile, one line per run, log-y, with
    the 0.03 matched-filter threshold. Labels derive from the run tag."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.2))
    for run_dir in run_dirs:
        d = np.loadtxt(os.path.join(run_dir, "mismatch_theta.csv"),
                       delimiter=",", skiprows=1)
        mm, m1, m2 = d[:, 0], d[:, 1], d[:, 2]
        mtot = m1 + m2
        mc = mtot * (m1 * m2 / mtot**2) ** 0.6
        edges = np.percentile(mc, np.linspace(0, 100, 11))
        mids, med = [], []
        for lo, hi in zip(edges[:-1], edges[1:]):
            sel = (mc >= lo) & (mc <= hi)
            mids.append(np.median(mc[sel]))
            med.append(np.median(mm[sel]))
        label = run_dir.rstrip("/").split(os.sep)[-3].replace("GW_time_", "")
        ax.plot(mids, med, marker="o", label=label)
    ax.axhline(0.03, color="k", ls="--", lw=0.8, label="0.03 threshold")
    ax.set_yscale("log")
    ax.set_xlabel(r"chirp mass $\mathcal{M}_c$ [$M_\odot$] (decile medians)")
    ax.set_ylabel("median mismatch")
    ax.set_title("GW reconstruction tail is a low-chirp-mass resolution limit")
    ax.legend(fontsize=8)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    fig.savefig(out_path, dpi=110)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--plot":
        plot(args[1:])
    else:
        for run_dir in args:
            print(json.dumps(analyze(run_dir)))

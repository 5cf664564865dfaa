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


if __name__ == "__main__":
    for run_dir in sys.argv[1:]:
        print(json.dumps(analyze(run_dir)))

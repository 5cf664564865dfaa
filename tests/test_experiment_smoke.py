"""Smoke tests for the L5 experiment entry points (SURVEY.md §1: the
reference's 'CLI' is its reproducibility notebooks; ours is
experiments/*.py — these tests keep those scripts runnable end-to-end).

Each script is exercised the way a user would run it, in a subprocess on
CPU with tiny budgets, asserting the artifact contract (the reference's
results/{data}/{model}/run_{i} layout, utils/train.py:194,315-329) holds.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "PALLAS_AXON_POOL_IPS": "",
    # single CPU device is enough and compiles faster than the 8-device
    # mesh the in-process test config forces
    "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
}


def run(args, timeout=600):
    r = subprocess.run(
        [sys.executable] + args,
        cwd=REPO,
        env=ENV,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert r.returncode == 0, f"{' '.join(args)}\nSTDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-2000:]}"
    return r


@pytest.fixture(scope="module")
def gw_smoke_run(tmp_path_factory):
    """One tiny reproduce_gw.py run shared by the chained analysis tests."""
    out = tmp_path_factory.mktemp("gw_smoke")
    run([
        "experiments/reproduce_gw.py", "--model", "CNP", "--steps", "50",
        "--batch", "8", "--n-test", "64", "--out", str(out),
    ])
    run_dir = out / "GW_time_ctx64" / "CNP" / "run_0"
    assert run_dir.is_dir(), f"missing run dir under {out}"
    return run_dir


def test_reproduce_gw_artifact_contract(gw_smoke_run):
    summary = json.loads((gw_smoke_run / "summary.json").read_text())
    # the north-star metrics must be present and finite
    for key in ("test_ll_per_wf", "mismatch_median", "mismatch_p90",
                "train_wf_per_sec"):
        assert key in summary and np.isfinite(summary[key]), key
    lls = np.loadtxt(gw_smoke_run / "eval.csv", delimiter=",")
    assert lls.shape == (256,) and np.isfinite(lls).all()
    mt = np.loadtxt(gw_smoke_run / "mismatch_theta.csv", delimiter=",",
                    skiprows=1)
    assert mt.shape == (256, 5)  # mismatch + (m1, m2, chi1, chi2)
    assert (gw_smoke_run / "params.msgpack").stat().st_size > 0
    assert (gw_smoke_run / "model_summary.txt").stat().st_size > 0


def test_gw_eval_ctx_on_frozen_run(gw_smoke_run):
    run([
        "experiments/gw_eval_ctx.py", str(gw_smoke_run),
        "--ctx", "16,64", "--n-test", "64",
    ])
    rows = json.loads((gw_smoke_run / "ctx_sweep.json").read_text())
    assert [r["n_context"] for r in rows] == [16, 64]
    for r in rows:
        assert 0.0 <= r["p50"] <= 1.0 and r["p50"] <= r["p90"] <= 1.0


def test_reproduce_gw_eval_only_rescore(gw_smoke_run):
    """--eval-only reloads the frozen run and merges new metric keys into
    its summary (the path used to rescore old runs when the eval protocol
    gains metrics), preserving training-time fields."""
    before = json.loads((gw_smoke_run / "summary.json").read_text())
    out_root = gw_smoke_run.parent.parent.parent  # .../gw_smoke
    run([
        "experiments/reproduce_gw.py", "--model", "CNP", "--steps", "50",
        "--batch", "8", "--n-test", "64", "--out", str(out_root),
        "--eval-only",
    ])
    after = json.loads((gw_smoke_run / "summary.json").read_text())
    # training fields preserved, not overwritten by the (untrained) rescore
    assert after["train_wf_per_sec"] == before["train_wf_per_sec"]
    # new per-z-draw keys present; for a deterministic model (n_z=1) the
    # z-draw metric must equal the mixture-mean metric exactly
    assert np.isclose(after["mismatch_zdraw_median"], after["mismatch_median"])
    assert np.isclose(after["mismatch_zdraw_p90"], after["mismatch_p90"])
    # params were NOT rewritten by the eval-only pass
    assert (gw_smoke_run / "params.msgpack").stat().st_size > 0


def test_reproduce_gw_resume_from(gw_smoke_run):
    """--resume-from warm-starts a NEW run from a frozen run's params (the
    long-waveform continuation path). Wiring check: the continuation run
    trains, writes its own artifacts under run_1, and records its parent.
    The params round-trip itself is covered by the load_run_params test."""
    out_root = gw_smoke_run.parent.parent.parent
    run([
        "experiments/reproduce_gw.py", "--model", "CNP", "--steps", "1",
        "--batch", "8", "--n-test", "64", "--out", str(out_root),
        "--run", "1", "--resume-from", str(gw_smoke_run),
    ])
    cont_dir = gw_smoke_run.parent / "run_1"
    summary = json.loads((cont_dir / "summary.json").read_text())
    assert summary["resumed_from"] == str(gw_smoke_run)
    # the continuation's params must sit ONE Adam step (~lr=1e-3 per leaf)
    # from the parent's trained params — a silent fresh-init restart would
    # leave O(0.1) init-scale differences on every weight matrix
    from flax.serialization import msgpack_restore

    parent_p = msgpack_restore((gw_smoke_run / "params.msgpack").read_bytes())
    cont_p = msgpack_restore((cont_dir / "params.msgpack").read_bytes())
    import jax

    diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(a - b))), parent_p, cont_p
    )
    assert max(jax.tree.leaves(diffs)) < 0.05, diffs


def test_reproduce_gw_rejects_ambiguous_resume_flags(gw_smoke_run):
    """--eval-only + --resume-from is refused (eval-only used to silently
    win, evaluating the wrong params — ADVICE r3); --resume-from resolving
    to the run's own output dir is refused (it would overwrite the parent's
    artifacts in place)."""
    out_root = gw_smoke_run.parent.parent.parent

    def expect_error(extra, match):
        r = subprocess.run(
            [sys.executable, "experiments/reproduce_gw.py", "--model", "CNP",
             "--steps", "1", "--batch", "8", "--out", str(out_root)] + extra,
            cwd=REPO, env=ENV, capture_output=True, text=True, timeout=600,
        )
        assert r.returncode != 0
        assert match in r.stderr, r.stderr[-800:]

    expect_error(["--eval-only", "--resume-from", str(gw_smoke_run)],
                 "mutually exclusive")
    expect_error(["--run", "0", "--resume-from", str(gw_smoke_run)],
                 "own output dir")


def test_reproduce_gp_resume_from(tmp_path):
    """reproduce_gp --resume-from warm-starts from another run dir (the
    ported-checkpoint bar-stability probe path) and records the parent;
    summaries with resumed_from are excluded from the results table's
    best-run selection (they are diagnostics, not from-scratch results)."""
    out = tmp_path / "results"
    args = ["experiments/reproduce_gp.py", "--model", "CNP",
            "--kernel", "RBF_Kernel", "--epochs", "1",
            "--fns-per-epoch", "320", "--batch", "32", "--n-test", "256",
            "--out", str(out)]
    run(args)
    parent = out / "RBF_Kernel" / "CNP" / "run_0"
    assert parent.is_dir()
    run(args + ["--run", "1", "--resume-from", str(parent), "--lr", "1e-4"])
    cont = out / "RBF_Kernel" / "CNP" / "run_1"
    summary = json.loads((cont / "summary.json").read_text())
    assert summary["resumed_from"] == str(parent)
    assert summary["lr"] == 1e-4
    # warm start really loaded the parent (not fresh init): params stay close
    from flax.serialization import msgpack_restore
    import jax

    parent_p = msgpack_restore((parent / "params.msgpack").read_bytes())
    cont_p = msgpack_restore((cont / "params.msgpack").read_bytes())
    diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(a - b))), parent_p, cont_p
    )
    assert max(jax.tree.leaves(diffs)) < 0.05, diffs
    # the table's GP-cell selector must skip the warm-start probe: it reads
    # results/{kernel}/{model}/run_* relative to cwd
    sys.path.insert(0, REPO)
    from experiments.results_table import load_ours

    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        ll, meta = load_ours("RBF_Kernel", "CNP")
        assert meta.get("run", "run_0") == "run_0"
        assert "resumed_from" not in meta
    finally:
        os.chdir(cwd)


def test_gw_eval_ctx_fixed_counts(gw_smoke_run):
    """--fixed pins the context count (capability at a known observation
    budget, vs the U{0..n} protocol's near-empty-draw floor)."""
    run([
        "experiments/gw_eval_ctx.py", str(gw_smoke_run),
        "--ctx", "16,64", "--n-test", "64", "--fixed",
    ])
    rows = json.loads((gw_smoke_run / "ctx_sweep_fixed.json").read_text())
    assert [r["n_context"] for r in rows] == [16, 64]
    for r in rows:
        assert 0.0 <= r["p50"] <= 1.0 and r["p50"] <= r["p90"] <= 1.0


def test_gw_tail_analysis(gw_smoke_run):
    r = run(["experiments/gw_tail_analysis.py", str(gw_smoke_run)])
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n"] == 256
    assert out["p50"] <= out["p90"] <= out["p99"]
    assert "chirp_mass_tail_median" in out


def test_eval_extrapolation_oracle_and_cnp(tmp_path):
    """The extrapolation scorer's oracle row (masked exact-GP posterior,
    big-diagonal trick) and a frozen-checkpoint model row both produce
    finite interp/extrap LLs with the right ordering (oracle >= model on
    interpolation; everything's extrapolation LL is far below its
    interpolation LL at 2x range). --out tmp_path: smoke numbers must
    never clobber the checked-in full-protocol artifact."""
    r = run([
        "experiments/eval_extrapolation.py", "--models", "oracle,CNP",
        "--n-test", "256", "--n-points", "64", "--out", str(tmp_path),
    ], timeout=420)
    rows = [json.loads(l) for l in r.stdout.strip().splitlines()
            if l.startswith("{")]
    byname = {row["model"]: row for row in rows if "interp_ll_per_fn" in row}
    assert "oracle_gp" in byname
    o = byname["oracle_gp"]
    assert np.isfinite(o["interp_ll_per_fn"]) and np.isfinite(o["extrap_ll_per_fn"])
    assert o["interp_ll_per_fn"] > o["extrap_ll_per_fn"]
    if "CNP" in byname:  # checkpoint present in the results tree
        c = byname["CNP"]
        assert o["interp_ll_per_fn"] >= c["interp_ll_per_fn"]


def test_results_table_full_grid():
    """The checked-in results tree must regenerate the full 6x6 grid."""
    r = run(["experiments/results_table.py", "--markdown"], timeout=120)
    rows = [l for l in r.stdout.splitlines() if l.startswith("|")]
    cells = [l for l in rows if l.split("|")[1].strip() in (
        "RBF", "Periodic", "Noisy_Matern", "Matern", "Variable_Matern",
        "All_Kernels")]
    assert len(cells) == 36, f"expected 36 grid cells, got {len(cells)}"


def test_gw_model_from_summary_restores_every_knob():
    """Frozen-run consumers (gw_eval_ctx/gw_viz) rebuild the model through
    configs.gw_model_from_summary; the helper must restore every recorded
    architecture knob. Regression for two real bugs: a hand rebuild that
    dropped no_lat_lb (re-applying the 0.1 sigmoid floor — the diagnosed
    latent-collapse cause) and one that ignored duration/n_points."""
    from npf_gwwaveform_tpu.configs import gw_model_from_summary

    # latent-scale transform (the no_lat_lb runs)
    m = gw_model_from_summary(
        {"model": "ConvLNP", "conditioned": True, "cond_mode": "film",
         "no_lat_lb": True}
    )
    assert m.lat_scale_transform == "softplus" and m.min_lat_sigma == 1e-4
    # default keeps the reference's 0.1+0.9*sigmoid floor
    m0 = gw_model_from_summary(
        {"model": "ConvLNP", "conditioned": True, "cond_mode": "film"}
    )
    assert m0.lat_scale_transform != "softplus"
    # NPVI: q(z|C∪T) restored
    m1 = gw_model_from_summary(
        {"model": "ConvLNP", "conditioned": True,
         "train_loss_objective": "elbo"}
    )
    assert m1.is_q_zCct and m1.n_z_samples_train == 1
    # long-waveform knobs: kernel, density, pallas
    m2 = gw_model_from_summary(
        {"model": "ConvCNP", "conditioned": True, "cond_mode": "film",
         "cnn_kernel_size": 37, "density_induced": 512,
         "use_pallas_setconv": True}
    )
    assert m2.density_induced == 512 and m2.use_pallas_setconv
    # freq_ap mode -> y_dim 2
    m3 = gw_model_from_summary(
        {"model": "ConvCNP", "conditioned": True, "mode": "freq_ap"}
    )
    assert m3.y_dim == 2
    # unconditioned
    m4 = gw_model_from_summary({"model": "ConvCNP"})
    assert m4.cond_dim == 0


def test_gp_model_1d_rejects_unet_incompatible_knobs():
    """cnn_dilations/cnn_banded silently dropped under cnn_arch='unet' would
    let run artifacts claim an architecture that was never built."""
    import pytest

    from npf_gwwaveform_tpu.configs import gp_model_1d

    with pytest.raises(ValueError, match="unet"):
        gp_model_1d("ConvCNP", cnn_arch="unet", cnn_dilations=(1, 2))
    with pytest.raises(ValueError, match="unet"):
        gp_model_1d("ConvCNP", cnn_arch="unet", cnn_banded=True)

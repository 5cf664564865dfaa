"""Benchmark: NP training throughput in waveforms/sec/chip (the north-star
metric of BASELINE.json), plus MFU accounting.

Workload: the flagship GW config — ConvCNP (r_dim=128, 5 ResConvBlocks k=19,
induced grid 192 @ density 64) regressing IMRPhenomD-style h+(t) with 256
points/waveform, CNPF loss, fresh on-device waveform batches every step. One
fused jitted step = waveform generation + context/target split + forward +
loss + Adam update; 50 steps run per dispatch via lax.scan.

vs_baseline: the reference records ~150 functions/s for its closest measured
1-D conv-family training row (ConvLNP NPML, 50k fns/epoch, batch 16, GPU —
BASELINE.md throughput table); the reference-CPU number the north star
references is strictly lower, so this denominator is conservative.

Default: prints ONE json line {"metric", "value", "unit", "vs_baseline"}.
`--detail`: additionally writes BENCH_DETAIL.json with the XLA-vs-Pallas
SetConv A/B, a batch-size sweep, and FLOPs/MFU per config.
"""

import argparse
import json
import os
import time

import jax

BASELINE_FNS_PER_SEC = 150.0

# bf16 peak matmul throughput per chip, FLOP/s (public spec sheets)
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
}


def _peak_flops():
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_FLOPS.items():
        if kind.lower().startswith(k.lower()):
            return v, kind
    return None, kind


def measure(
    batch_size=32,
    n_points=256,
    use_pallas=False,
    n_inner=50,
    n_chunks=4,
    n_context=64,
    duration=1.0,
    density_induced=64,
    remat=False,
    banded=False,
    fused_mlp=False,
):
    """Train-throughput measurement of the flagship config. Returns a dict
    with waveforms/sec/chip, per-step FLOPs (XLA cost analysis of ONE
    compiled train step), and MFU when the chip's peak is known.

    The workload construction (model/splitter/trainer/make_batch, bf16
    compute with f32 params + f32 log-prob reductions) is shared with the
    profiling scripts via experiments/_flagship.build_flagship — one
    definition, so a config tweak can never leave this bench measuring a
    stale workload."""
    from experiments._flagship import build_flagship
    from npf_gwwaveform_tpu.training import create_train_state

    parts = build_flagship(
        batch_size,
        n_points=n_points,
        density_induced=density_induced,
        n_context=n_context,
        duration=duration,
        use_pallas=use_pallas,
        remat=remat,
        banded=banded,
        fused_mlp=fused_mlp,
    )
    model, splitter, tx, trainer, make_batch = (
        parts["model"], parts["splitter"], parts["tx"], parts["trainer"],
        parts["make_batch"],
    )

    key = jax.random.PRNGKey(0)
    x, y = jax.jit(make_batch)(key)
    ex_batch = splitter(key, x, y)
    state = create_train_state(model, tx, ex_batch, seed=0)

    def one_step(state, key):
        x, y = make_batch(key)
        new_state, m = trainer._train_step(state, x, y)
        return new_state, m["loss"]

    @jax.jit
    def run_chunk(state, key):
        keys = jax.random.split(key, n_inner)
        return jax.lax.scan(one_step, state, keys)

    # FLOPs of ONE full train step (datagen + split + fwd/bwd + Adam) from
    # XLA's own cost model. The single step must be lowered SEPARATELY:
    # cost_analysis() of the scanned program counts the while-loop body once
    # regardless of trip count (verified: identical flops at scan lengths
    # 1/10/50), so dividing the chunk program's flops by n_inner understates
    # true FLOPs by n_inner x (the round-2 bug this replaces).
    try:
        step_compiled = jax.jit(one_step).lower(state, key).compile()
        flops_step = float(step_compiled.cost_analysis()["flops"])
    except Exception:
        flops_step = float("nan")

    state, losses = run_chunk(state, key)  # warmup/compile
    jax.block_until_ready(losses)

    t0 = time.perf_counter()
    for i in range(n_chunks):
        state, losses = run_chunk(state, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0

    n_chips = max(1, len(jax.devices()))
    wf_per_sec = n_chunks * n_inner * batch_size / dt / n_chips
    flops_per_sec = flops_step * n_inner * n_chunks / dt / n_chips
    peak, kind = _peak_flops()
    out = {
        "batch_size": batch_size,
        "n_points": n_points,
        "density_induced": density_induced,
        "use_pallas_setconv": use_pallas,
        **({"remat": True} if remat else {}),
        **({"banded": True} if banded else {}),
        **({"fused_mlp": True} if fused_mlp else {}),
        "waveforms_per_sec_per_chip": round(wf_per_sec, 2),
        "flops_per_step": flops_step,
        "tflops_per_sec": round(flops_per_sec / 1e12, 2),
        "device_kind": kind,
    }
    if peak and flops_step == flops_step:
        out["mfu"] = round(flops_per_sec / peak, 4)
    return out


def measure_inference(
    batch_size=512,
    n_points=256,
    n_context=192,
    density_induced=128,
    n_inner=200,
    n_chunks=4,
    use_pallas=False,
    duration=1.0,
):
    """Serving-side throughput: posterior reconstruction (loc + scale over
    all target points) at a FIXED observation budget — the quality
    operating point's eval shape (ctx 192 of 256, density 128 by default;
    RESULTS.md GW fixed-budget sweeps). Forward-only, no optimizer; the
    batch (waveform synthesis + fixed-count split) is generated on device
    inside the same scan, which mirrors the train bench's accounting and
    costs ~10% of a TRAIN step (PROFILE_STEP.json), i.e. a conservative
    reconstructions/s number."""
    import jax.numpy as jnp

    from experiments._flagship import build_flagship
    from npf_gwwaveform_tpu.data import (
        CntxtTrgtSplitter,
        GetRandomIndcs,
        get_all_indcs,
    )

    parts = build_flagship(
        batch_size,
        n_points=n_points,
        density_induced=density_induced,
        n_context=n_context,
        duration=duration,
        use_pallas=use_pallas,
    )
    model, make_batch = parts["model"], parts["make_batch"]
    # serving protocol: EXACTLY n_context observed points per waveform
    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=float(n_context), b=n_context),
        targets_getter=get_all_indcs,
    )

    key = jax.random.PRNGKey(0)
    x, y = jax.jit(make_batch)(key)
    b0 = splitter(key, x, y)
    variables = model.init(
        {"params": key, "latent": key},
        b0["X_cntxt"], b0["Y_cntxt"], b0["X_trgt"],
        mask_cntxt=b0["mask_cntxt"], mask_trgt=b0["mask_trgt"], train=False,
    )

    def one_infer(carry, key):
        kd, ks = jax.random.split(key)
        x, y = make_batch(kd)
        b = splitter(ks, x, y)
        out = model.apply(
            variables,
            b["X_cntxt"], b["Y_cntxt"], b["X_trgt"],
            mask_cntxt=b["mask_cntxt"], mask_trgt=b["mask_trgt"], train=False,
        )
        # DCE guard: the emitted scalar must depend on the full predictive
        # (loc AND scale) or XLA deletes the untouched head
        s = jnp.sum(out.p_yCc.loc.astype(jnp.float32)) + jnp.sum(
            out.p_yCc.scale.astype(jnp.float32)
        )
        return carry + s, None

    @jax.jit
    def run_chunk(key):
        acc, _ = jax.lax.scan(
            one_infer, jnp.float32(0.0), jax.random.split(key, n_inner)
        )
        return acc

    try:
        compiled = jax.jit(
            lambda c, k: one_infer(c, k)[0]
        ).lower(jnp.float32(0.0), key).compile()
        flops_step = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops_step = float("nan")

    jax.block_until_ready(run_chunk(key))  # warmup/compile
    t0 = time.perf_counter()
    for i in range(n_chunks):
        acc = run_chunk(jax.random.PRNGKey(2 + i))
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0

    n_chips = max(1, len(jax.devices()))
    wf_per_sec = n_chunks * n_inner * batch_size / dt / n_chips
    flops_per_sec = flops_step * n_inner * n_chunks / dt / n_chips
    peak, kind = _peak_flops()
    out = {
        "batch_size": batch_size,
        "n_points": n_points,
        "n_context": n_context,
        "density_induced": density_induced,
        "use_pallas_setconv": use_pallas,
        "reconstructions_per_sec_per_chip": round(wf_per_sec, 2),
        "flops_per_step": flops_step,
        "tflops_per_sec": round(flops_per_sec / 1e12, 2),
        "device_kind": kind,
    }
    if peak and flops_step == flops_step:
        out["mfu"] = round(flops_per_sec / peak, 4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detail", action="store_true",
                    help="write BENCH_DETAIL.json with pallas A/B + batch sweep")
    ap.add_argument("--detail-fast", action="store_true",
                    help="reduced detail: flagship-batch A/B + long-context "
                    "rows only (merged into an existing BENCH_DETAIL.json)")
    # 256 = the measured throughput-optimal batch on v5e (BENCH_DETAIL.json
    # sweep: 2.1x the batch-32 rate, 512 regresses); data is generated on
    # device so batch scaling is accuracy-neutral free throughput
    ap.add_argument("--batch", type=int, default=256)
    # 200 = measured sweet spot of the dispatch-amortization sweep on v5e
    # (50: 124.3k, 100: 129.4k, 200: 132.3k, 400: 133.6k wf/s — asymptote;
    # 200 keeps per-dispatch latency reasonable for ~the same throughput)
    ap.add_argument(
        "--inner", type=int, default=200,
        help="train steps fused per dispatch (lax.scan length); higher "
        "amortizes tunnel dispatch latency further",
    )
    ap.add_argument(
        "--infer", action="store_true",
        help="measure serving throughput (posterior reconstruction at "
        "fixed ctx 192, density-128 quality operating point) instead of "
        "training; merges an 'inference' section into BENCH_DETAIL.json",
    )
    args = ap.parse_args()

    if args.infer:
        rows = [
            measure_inference(batch_size=512),
            measure_inference(batch_size=512, density_induced=64),
        ]
        if os.path.exists("BENCH_DETAIL.json"):
            with open("BENCH_DETAIL.json") as f:
                detail = json.load(f)
            detail["inference"] = rows
            with open("BENCH_DETAIL.json", "w") as f:
                json.dump(detail, f, indent=2)
        print(json.dumps({
            "metric": "gw_convcnp_inference_throughput",
            "value": rows[0]["reconstructions_per_sec_per_chip"],
            "unit": "reconstructions/sec/chip",
            "detail": rows,
        }))
        return

    if args.detail or args.detail_fast:
        detail = {"flagship": None, "sweep": [], "long_context": []}
        if os.path.exists("BENCH_DETAIL.json"):
            with open("BENCH_DETAIL.json") as f:
                prev = json.load(f)
            # keep rows/sections this mode doesn't re-measure (e.g. the
            # banded/variants A/B merged in by other runs). long_context
            # rows are expensive (~hours); keep the old ones and REPLACE
            # per-config as re-measurements land, so a wedged TPU claim
            # mid-run never leaves the file emptier than it started.
            detail["long_context"] = prev.get("long_context", [])
            for k, v in prev.items():
                if k not in ("flagship", "sweep", "long_context"):
                    detail[k] = v
            if args.detail_fast:
                detail["sweep"] = prev.get("sweep", [])

        def put_long_context(r):
            def cfg(row):
                return (
                    row.get("density_induced"),
                    bool(row.get("use_pallas_setconv", row.get("use_pallas"))),
                    bool(row.get("remat")),
                    row.get("batch_size"),
                    row.get("n_points"),
                )

            detail["long_context"] = [
                row for row in detail["long_context"] if cfg(row) != cfg(r)
            ] + [r]

        def flush():
            ok = [r for r in detail["sweep"] if "error" not in r]
            if ok:
                # prefer rows with full MFU accounting (older merged rows may
                # predate the corrected FLOPs counter and lack the field)
                detail["flagship"] = max(
                    ok, key=lambda r: ("mfu" in r, r["waveforms_per_sec_per_chip"])
                )
            with open("BENCH_DETAIL.json", "w") as f:
                json.dump(detail, f, indent=2)

        def safe_measure(**kw):
            # one failing config (e.g. a compile OOM) must not discard the
            # rows already measured — record it and keep the file current
            try:
                return measure(**kw)
            except Exception as e:
                r = {**kw, "error": f"{type(e).__name__}: {e}"[:500]}
                # normalize the kwarg name so dedup/readers see one key
                if "use_pallas" in r:
                    r["use_pallas_setconv"] = r.pop("use_pallas")
                return r

        batches = (256,) if args.detail_fast else (32, 64, 128, 256, 512)
        for bs in batches:
            for use_pallas in (False, True):
                r = safe_measure(batch_size=bs, use_pallas=use_pallas)
                detail["sweep"] = [
                    s for s in detail["sweep"]
                    if not (s["batch_size"] == bs
                            and s.get("use_pallas_setconv",
                                      s.get("use_pallas")) == use_pallas)
                ] + [r]
                print(json.dumps(r), flush=True)
                flush()
        # long-waveform regime (2048-point waveforms, contexts up to 1024).
        # The induced grid must SCALE with waveform length for ConvCNP's
        # 3x-density grid semantics to hold over long signals — this is the
        # regime where the Pallas SetConv's O(B*(Q+K)*C) memory vs XLA's
        # materialized [B,Q,K] pairwise tensor matters. Two grid scalings:
        # density 512 preserves grid resolution per sample (grid 1536);
        # density 2048 is the PROFILE_OPS op-level-win shape (grid 6144).
        for density in (512, 2048):
            for use_pallas in (False, True):
                r = safe_measure(
                    batch_size=16,
                    n_points=2048,
                    n_context=1024,
                    duration=2.0,
                    use_pallas=use_pallas,
                    density_induced=density,
                )
                r.setdefault("density_induced", density)
                put_long_context(r)
                print(json.dumps(r), flush=True)
                flush()
        # remat A/B at the largest long-context shape (XLA SetConv path):
        # trades one extra CNN forward for ~n_blocks x lower activation HBM
        r = safe_measure(
            batch_size=16,
            n_points=2048,
            n_context=1024,
            duration=2.0,
            use_pallas=False,
            density_induced=2048,
            remat=True,
        )
        r.setdefault("density_induced", 2048)
        put_long_context(r)
        print(json.dumps(r), flush=True)
        flush()
        return

    r = measure(batch_size=args.batch, n_inner=args.inner)
    line = {
        "metric": "gw_convcnp_train_throughput",
        "value": r["waveforms_per_sec_per_chip"],
        "unit": "waveforms/sec/chip",
        "vs_baseline": round(r["waveforms_per_sec_per_chip"] / BASELINE_FNS_PER_SEC, 2),
    }
    if "mfu" in r:
        line["mfu"] = r["mfu"]
    print(json.dumps(line))


def _wait_for_chip(max_attempts=12, sleep_s=180):
    """Retry the TPU claim before benchmarking. The axon tunnel's claim can
    be transiently wedged (observed: UNAVAILABLE for >1h after a killed
    run); the driver runs this script once at round end, so a cold failure
    there loses the round's benchmark. JAX caches a failed backend init, so
    retrying within the process is useless — re-exec instead."""
    import subprocess
    import sys

    attempt = int(os.environ.get("BENCH_CLAIM_ATTEMPT", "0"))
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True,
            timeout=300,
        )
        rc, err = probe.returncode, probe.stderr
    except subprocess.TimeoutExpired:
        # the claim can also wedge by HANGING rather than erroring
        rc, err = -1, b"probe timed out after 300s (hung claim)"
    if rc == 0:
        return
    if attempt + 1 >= max_attempts:
        sys.stderr.write("bench: TPU claim unavailable after retries\n")
        sys.stderr.write(err.decode(errors="replace")[-2000:] + "\n")
        # machine-readable record of the outage (no fabricated numbers):
        print(json.dumps({
            "metric": "gw_convcnp_train_throughput",
            "value": None,
            "unit": "waveforms/sec/chip",
            "error": "TPU claim unavailable (tunnel outage); last measured "
                     "run in BENCH_DETAIL.json",
        }))
        sys.exit(1)
    sys.stderr.write(
        f"bench: TPU claim unavailable (attempt {attempt + 1}/{max_attempts}), "
        f"retrying in {sleep_s}s\n"
    )
    time.sleep(sleep_s)
    os.environ["BENCH_CLAIM_ATTEMPT"] = str(attempt + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    if not os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        _wait_for_chip()
    main()

"""A/B the PRNG implementation on the training hot path: threefry2x32
(jax default, high dispatch-count safety margin) vs rbg (XLA
RngBitGenerator — hardware-accelerated on TPU).

Motivation: the honest step breakdown (PROFILE_STEP.json) shows the
context/target mask draw costing MORE than the whole waveform synthesis
(261 vs 181 us/step at batch 256), and both stages are RNG-heavy. Threefry
computes 20+ rounds of 32-bit ALU per block on the VPU; rbg lowers to the
TPU's native RNG instruction. Distributional quality is equivalent for
training purposes (rbg is a Philox-class generator); threefry stays the
default everywhere reproducibility against existing artifacts matters.

Each measurement is a 50-step lax.scan (same dispatch amortization as
bench.py) — per-dispatch tunnel latency (~250us) would otherwise dominate
and equalize every variant (the round-3 lesson from bench_step_variants'
mask rows).

Usage: python experiments/bench_prng.py   (on the TPU)
Writes results/prng_bench.json.
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


def measure(impl: str, batch_size: int = 256, n_inner: int = 50, n_chunks: int = 4):
    from experiments._flagship import build_flagship
    from npf_gwwaveform_tpu.training import create_train_state

    fl = build_flagship(batch_size)
    model, splitter, tx, trainer, make_batch = (
        fl["model"], fl["splitter"], fl["tx"], fl["trainer"], fl["make_batch"]
    )

    key = jax.random.key(0, impl=impl)
    x0, y0 = jax.jit(make_batch)(key)
    ex_batch = splitter(key, x0, y0)
    state = create_train_state(model, tx, ex_batch, seed=0)
    # the train step draws split/latent randomness from state.rng, which
    # create_train_state seeds with a default-impl key — swap in an
    # impl-matched one so the full-step row actually exercises `impl`
    state = state.replace(rng=jax.random.fold_in(key, 7))

    def stage_split(_, k):
        batch = splitter(k, x0, y0)
        return None, jnp.sum(batch["mask_cntxt"])

    def stage_datagen(_, k):
        x, y = make_batch(k)
        return None, jnp.sum(y) + jnp.max(x)

    def stage_full(st, k):
        x, y = make_batch(k)
        st, m = trainer._train_step(st, x, y)
        return st, m["loss"]

    out = {"prng_impl": impl, "batch_size": batch_size}
    for name, (fn, carry0) in {
        "split": (stage_split, None),
        "datagen": (stage_datagen, None),
        "full_step": (stage_full, state),
    }.items():
        @jax.jit
        def run(carry, k, fn=fn):
            return jax.lax.scan(fn, carry, jax.random.split(k, n_inner))

        carry, ys = run(carry0, key)
        jax.block_until_ready(ys)
        t0 = time.perf_counter()
        for i in range(n_chunks):
            carry, ys = run(carry0, jax.random.fold_in(key, i))
        jax.block_until_ready(ys)
        out[name + "_us_per_step"] = round(
            (time.perf_counter() - t0) / (n_chunks * n_inner) * 1e6, 1
        )
    out["wf_per_sec_full"] = round(
        batch_size * 1e6 / out["full_step_us_per_step"], 1
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    rows = [measure(impl, args.batch) for impl in ("threefry2x32", "rbg")]
    for r in rows:
        print(json.dumps(r), flush=True)
    with open("results/prng_bench.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()

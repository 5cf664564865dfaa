"""Decompose the flagship bench step's wall time into pipeline stages to
find the non-MXU bottleneck behind the remaining (1 - MFU) fraction and the
batch-512 throughput regression (BENCH_DETAIL sweep).

Each stage is measured as its own jitted 50-step scan on device (same
dispatch amortization as bench.py), so stage times are directly comparable
and their sum ~= the full step time when the pipeline is compute-bound:

  datagen   — GW parameter draw + IMRPhenomD-style waveform synthesis
  split     — context/target mask draw
  fwd       — model forward + CNPF loss
  fwd+bwd   — loss + gradients
  full      — bench.py's one_step (datagen + split + grad + Adam update)

Prints one JSON line per batch size; run on the real chip.

Usage: python experiments/profile_step_breakdown.py [--batches 256 512]
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


def profile(batch_size, n_points=256, n_inner=50, n_chunks=4):
    from experiments._flagship import build_flagship
    from npf_gwwaveform_tpu.training import create_train_state

    fl = build_flagship(batch_size, n_points=n_points)
    model, splitter, tx, trainer, make_batch = (
        fl["model"], fl["splitter"], fl["tx"], fl["trainer"], fl["make_batch"]
    )

    key = jax.random.PRNGKey(0)
    x0, y0 = jax.jit(make_batch)(key)
    ex_batch = splitter(key, x0, y0)
    state = create_train_state(model, tx, ex_batch, seed=0)

    def loss_only(params, batch, k):
        out, _ = trainer._apply(params, state.extra_vars, batch, k, train=True)
        return jnp.mean(
            trainer.criterion(out, batch["Y_trgt"], batch["mask_trgt"], train=True)
        )

    # each stage: scan n_inner iterations. Every stage must emit a value
    # that DEPENDS ON ALL of its work or XLA dead-code-eliminates the rest
    # (the shared DCE guard lives in _flagship.use_all — see its docstring).
    from _flagship import use_all as _use_all

    def stage_datagen(_, k):
        x, y = make_batch(k)
        return None, jnp.sum(y) + jnp.max(x)

    def stage_split(_, k):
        batch = splitter(k, x0, y0)
        return None, jnp.sum(batch["mask_cntxt"])

    def stage_fwd(_, k):
        batch = splitter(k, x0, y0)
        return None, loss_only(state.params, batch, k)

    def stage_bwd(_, k):
        batch = splitter(k, x0, y0)
        return None, _use_all(jax.grad(loss_only)(state.params, batch, k))

    # optimizer in isolation: Adam moment update + param write traffic on
    # frozen grads (carries the real state so the update chain is live)
    grads0 = jax.jit(jax.grad(loss_only))(state.params, ex_batch, key)

    def stage_adam(st, k):
        import optax

        updates, opt_state = tx.update(grads0, st.opt_state, st.params)
        st = st.replace(
            params=optax.apply_updates(st.params, updates), opt_state=opt_state
        )
        return st, _use_all(st.params)

    def stage_full(st, k):
        x, y = make_batch(k)
        st, m = trainer._train_step(st, x, y)
        return st, m["loss"]

    stages = {
        "datagen": (stage_datagen, None),
        "split": (stage_split, None),
        "split+fwd": (stage_fwd, None),
        "split+fwd+bwd": (stage_bwd, None),
        "adam": (stage_adam, state),
        "full_step": (stage_full, state),
    }
    out = {"batch_size": batch_size}
    for name, (fn, carry0) in stages.items():
        @jax.jit
        def run(carry, key, fn=fn):
            return jax.lax.scan(fn, carry, jax.random.split(key, n_inner))

        carry, ys = run(carry0, key)  # compile + warmup
        jax.block_until_ready(ys)
        t0 = time.perf_counter()
        for i in range(n_chunks):
            carry, ys = run(carry0, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(ys)
        dt = time.perf_counter() - t0
        out[name + "_us_per_step"] = round(dt / (n_chunks * n_inner) * 1e6, 1)
    out["wf_per_sec_full"] = round(
        batch_size * 1e6 / out["full_step_us_per_step"], 1
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[64, 256, 512])
    args = ap.parse_args()
    rows = []
    for bs in args.batches:
        r = profile(bs)
        rows.append(r)
        print(json.dumps(r), flush=True)
    with open("PROFILE_STEP.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()

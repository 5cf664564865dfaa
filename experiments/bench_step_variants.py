"""A/B microbench of train-step composition variants on the live chip.

Motivated by experiments/profile_step_breakdown.py (RESULTS.md): at the
flagship batch-256 operating point the context/target split costs ~17% of
the step (362us) and the FUSED step runs 1.4x slower than the sum of its
stages (2.1x at batch 512) — an XLA scheduling/liveness pathology of the
combined program.

Two candidate fixes, each timed here against the incumbent:

1. split: `GetRandomIndcs` computes per-point ranks via DOUBLE argsort of
   uniform scores (datasplit.py:140). Variants:
     - scatter-iota: one argsort + scatter of iota<n into original positions
       (bit-identical masks: same sort, same tie-breaking);
     - sort-threshold: value-only sort + per-row gather of the n-th order
       statistic as a threshold (equivalent in distribution; may differ
       bitwise when f32 score ties span the count boundary).
2. fused step: `lax.optimization_barrier` between on-device waveform
   generation and the model step, forcing XLA to retire the datagen stage
   (FFT workspace) before conv activations go live.

Writes results/step_variants.json and prints one JSON line per row.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def time_fn(fn, *args, n_rep=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_rep


def time_op_scanned(fn, key, n_inner=200, n_chunks=3):
    """Per-op timing via a lax.scan of n_inner iterations inside ONE jit:
    per-dispatch timing through the tunnel costs ~250us/call, which
    equalizes every sub-ms variant (the original mask rows all 'measured'
    ~260us identical). The summed output keeps each iteration live."""
    @jax.jit
    def run(key):
        def body(c, k):
            return c + jnp.sum(fn(k)), None
        out, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.int32), jax.random.split(key, n_inner)
        )
        return out

    jax.block_until_ready(run(key))
    t0 = time.perf_counter()
    for i in range(n_chunks):
        out = run(jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (n_chunks * n_inner)


# ------------------------------------------------------------ mask variants


def mask_double_argsort(key, B, N, a, b):
    kn, kp = jax.random.split(key)
    n = jax.random.randint(kn, (), a, b + 1)
    scores = jax.random.uniform(kp, (B, N))
    ranks = jnp.argsort(jnp.argsort(scores, axis=-1), axis=-1)
    return ranks < n


def mask_scatter_iota(key, B, N, a, b):
    kn, kp = jax.random.split(key)
    n = jax.random.randint(kn, (), a, b + 1)
    scores = jax.random.uniform(kp, (B, N))
    order = jnp.argsort(scores, axis=-1)
    sel = jnp.broadcast_to(jnp.arange(N)[None, :] < n, (B, N))
    mask = jnp.zeros((B, N), bool)
    rows = jnp.arange(B)[:, None]
    return mask.at[rows, order].set(sel)


def mask_sort_threshold(key, B, N, a, b):
    kn, kp = jax.random.split(key)
    n = jax.random.randint(kn, (), a, b + 1)
    scores = jax.random.uniform(kp, (B, N))
    padded = jnp.concatenate(
        [jnp.sort(scores, axis=-1), jnp.full((B, 1), jnp.inf)], axis=-1
    )
    thresh = padded[:, n]  # n-th order statistic (0-indexed: n smallest are < it)
    return scores < thresh[:, None]


def mask_topk_threshold(key, B, N, a, b):
    """No full sort at all: top_k at the STATIC max count b (the count draw
    n <= b), threshold on the n-th largest score. top_k is O(N*b) on the
    VPU vs the bitonic O(N log^2 N) full sort — a win whenever b << N
    (flagship: b=64 of N=256; long-context: b=64 of 2048). Same
    distribution as the incumbent (iid uniform scores => any exact-n
    subset is uniform)."""
    kn, kp = jax.random.split(key)
    n = jax.random.randint(kn, (), a, b + 1)
    scores = jax.random.uniform(kp, (B, N))
    top, _ = jax.lax.top_k(scores, b)  # [B, b] descending
    # index 0 -> +inf so n=0 selects nothing
    padded = jnp.concatenate([jnp.full((B, 1), jnp.inf), top], axis=1)
    thresh = padded[:, n]
    return scores >= thresh[:, None]


def mask_topk_scatter(key, B, N, a, b):
    """BIT-IDENTICAL to the incumbent double argsort, without the full
    sorts: top_k of the negated scores yields the indices of the b smallest
    scores in ascending order with the same lower-index-first tie-breaking
    as the stable argsort; scatter True into the first n of them. (The
    threshold variants above lose exact-count selection when f32 score
    ties straddle the count boundary; this one cannot.)"""
    kn, kp = jax.random.split(key)
    n = jax.random.randint(kn, (), a, b + 1)
    scores = jax.random.uniform(kp, (B, N))
    _, idx = jax.lax.top_k(-scores, b)  # [B, b] indices of b smallest
    sel = jnp.broadcast_to(jnp.arange(b)[None, :] < n, (B, b))
    rows = jnp.arange(B)[:, None]
    return jnp.zeros((B, N), bool).at[rows, idx].set(sel)


def mask_topk_threshold_lex(key, B, N, a, b):
    """The ADOPTED production construction (datasplit.exact_topn_mask,
    round 5): top_k threshold made bit-exact with a lexicographic
    (value, index) tiebreak — the topk_threshold speed without the
    tie-boundary over-selection, and no scatter."""
    from npf_gwwaveform_tpu.data.datasplit import exact_topn_mask

    kn, kp = jax.random.split(key)
    n = jax.random.randint(kn, (), a, b + 1)
    scores = jax.random.uniform(kp, (B, N))
    return exact_topn_mask(scores, n, b, B)


# ------------------------------------------------------------ fused GW step


def build_step(batch_size, barrier: bool, n_points=256, n_context=64):
    # workload construction shared with bench.py / the profilers — see
    # _flagship.build_flagship's docstring (config drift guard)
    from _flagship import build_flagship
    from npf_gwwaveform_tpu.training import create_train_state

    parts = build_flagship(
        batch_size, n_points=n_points, n_context=n_context
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
        if barrier:
            x, y = jax.lax.optimization_barrier((x, y))
        new_state, m = trainer._train_step(state, x, y)
        return new_state, m["loss"]

    n_inner = 50

    @jax.jit
    def run_chunk(state, key):
        keys = jax.random.split(key, n_inner)
        return jax.lax.scan(one_step, state, keys)

    return state, run_chunk, n_inner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-fused", action="store_true")
    args = ap.parse_args()
    rows = []

    # --- split variants at the flagship shape and the long-context shape
    for B, N in ((256, 256), (256, 128), (16, 2048)):
        for name, fn in (
            ("double_argsort", mask_double_argsort),
            ("scatter_iota", mask_scatter_iota),
            ("sort_threshold", mask_sort_threshold),
            ("topk_threshold", mask_topk_threshold),
            ("topk_scatter", mask_topk_scatter),
            ("topk_threshold_lex", mask_topk_threshold_lex),
        ):
            # correctness gate: the selected count must equal the drawn n
            # (same key => same n across variants; double_argsort is the
            # incumbent ground truth)
            m_ref = mask_double_argsort(jax.random.PRNGKey(9), B, N, 0, 64)
            m_new = fn(jax.random.PRNGKey(9), B, N, 0, 64)
            assert int(m_new.sum()) == int(m_ref.sum()), (name, B, N)
            dt = time_op_scanned(
                lambda k, fn=fn, B=B, N=N: fn(k, B, N, 0, 64),
                jax.random.PRNGKey(0),
            )
            row = {"bench": "mask", "variant": name, "B": B, "N": N,
                   "us": round(dt * 1e6, 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    # --- fused step with/without the datagen barrier
    if not args.skip_fused:
        for bs in (256, 512):
            for barrier in (False, True):
                state, run_chunk, n_inner = build_step(bs, barrier)
                state, losses = run_chunk(state, jax.random.PRNGKey(1))
                jax.block_until_ready(losses)
                t0 = time.perf_counter()
                n_chunks = 4
                for i in range(n_chunks):
                    state, losses = run_chunk(state, jax.random.PRNGKey(2 + i))
                jax.block_until_ready(losses)
                dt = time.perf_counter() - t0
                wf = n_chunks * n_inner * bs / dt
                row = {"bench": "fused_step", "batch": bs, "barrier": barrier,
                       "us_per_step": round(dt / (n_chunks * n_inner) * 1e6, 1),
                       "wf_per_sec": round(wf, 1)}
                rows.append(row)
                print(json.dumps(row), flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/step_variants.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()

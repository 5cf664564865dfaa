"""Test-time BatchNorm statistic re-estimation (AdaBN-style adaptation).

Motivated by a measured failure: the zsmms zero-shot eval collapses for
GridConvCNP because the train-canvas BatchNorm running averages misnormalize
activations on the 2.56x-larger two-digit test canvas — the SAME frozen
model scores +518 LL/image on its own canvas and +278 when evaluated with
batch statistics, vs -24 with the frozen averages (RESULTS.md zsmms
diagnosis, `experiments/zsmms_diag.py`).

`adapt_batch_stats` re-estimates the `batch_stats` collection on UNLABELED
inputs from the target domain (only the observed context grids flow through
the network — no target values are used beyond what the eval itself
reveals), then evaluation proceeds with the standard frozen-stats protocol.
This is the classic AdaBN recipe (Li et al. 2017, "Revisiting Batch
Normalization for Practical Domain Adaptation") expressed as one jitted
`lax.scan`: each pass applies the model in train mode with ONLY the
`batch_stats` collection mutable (params untouched, no optimizer), letting
the 0.9-momentum EMA converge onto the new domain's statistics (~50 passes
leave <1% of the stale estimate).

The reference has no counterpart (its zsmms eval inherits whatever stats
training left behind); this is a framework capability its per-canvas
BatchNorm failure mode calls for.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["adapt_batch_stats"]


def adapt_batch_stats(trainer, state, images, key, n_passes: int = 50,
                      batch_size: int = 32):
    """Return `state` with `batch_stats` re-estimated on `images`.

    trainer: a Trainer whose splitter builds eval batches (the context
        masker matters — normalization statistics depend on the masked
        context density the CNN actually sees).
    images: [N, *grid, y_dim] target-domain inputs (unlabeled use).
    n_passes: EMA updates; at flax's 0.9 momentum, 50 passes retain
        ~0.5% of the source-domain estimate.

    Only the `batch_stats` collection is touched; params and any other
    extra_vars collections pass through unchanged. Models without
    BatchNorm return the state unchanged.
    """
    if "batch_stats" not in state.extra_vars:
        # exact-key check to match the new_vars["batch_stats"] access below
        # (a substring guard could pass on a differently-named collection
        # and then KeyError inside the scan — ADVICE round-4)
        return state
    n = images.shape[0]

    def one_pass(extra_vars, k):
        ki, ks, kl = jax.random.split(k, 3)
        idx = jax.random.randint(ki, (batch_size,), 0, n)
        y = images[idx]
        batch = trainer._split(ks, y, y)
        _, new_vars = trainer._apply(state.params, extra_vars, batch, kl,
                                     train=True)
        # keep ONLY the batch_stats update; other mutable collections (if
        # any) stay at their frozen values
        merged = dict(extra_vars)
        merged["batch_stats"] = new_vars["batch_stats"]
        return merged, None

    @jax.jit
    def run(extra_vars, key):
        out, _ = jax.lax.scan(one_pass, extra_vars,
                              jax.random.split(key, n_passes))
        return out

    return state.replace(extra_vars=run(state.extra_vars, key))

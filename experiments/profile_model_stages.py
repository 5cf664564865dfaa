"""Decompose the flagship ConvCNP's fwd(+bwd) into its model-internal stages
on-chip, to size the remaining kernel-fusion opportunities:

  setconv_enc — cntxt_to_induced (ExpRBF SetConv context -> 192-pt grid)
  cnn         — induced_to_induced (5 ResConvBlocks k=19, BatchNorm, bf16)
  setconv_dec — induced_to_trgt (SetConv grid -> 256 targets)
  decoder     — the 4-hidden r_dim MLP head (XLA Dense chain vs fused Pallas)

Each stage is a jitted 50-step scan on realistic tensors with a
force-materialize reduction over ALL outputs/grads (the DCE and dispatch
pitfalls that invalidated earlier microbenches — see
profile_step_breakdown.py). fwd rows time the stage alone; grad rows time
value+grad wrt the stage's params. The decoder rows A/B the fused Pallas
MLP-chain kernel against the Dense path at identical params.

Writes PROFILE_MODEL_STAGES.json; run on the real chip.
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


from _flagship import use_all as _use_all  # DCE guard — see its docstring


def _time_scan(fn, n_inner=50, n_chunks=4):
    """fn(key) -> scalar depending on all of the stage's work."""

    @jax.jit
    def run(key):
        def body(_, k):
            return None, fn(k)

        return jax.lax.scan(body, None, jax.random.split(key, n_inner))[1]

    ys = run(jax.random.PRNGKey(1))
    jax.block_until_ready(ys)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        ys = run(jax.random.PRNGKey(2 + i))
    jax.block_until_ready(ys)
    dt = time.perf_counter() - t0
    return round(dt / (n_chunks * n_inner) * 1e6, 1)


def profile(batch_size=256, n_points=256, density=64):
    from npf_gwwaveform_tpu import ConvCNP

    n_grid = 3 * density
    rng = jax.random.PRNGKey(0)
    kx, kg, kt, kv = jax.random.split(rng, 4)
    x_c = jnp.sort(jax.random.uniform(kx, (batch_size, n_points, 1),
                                      minval=-1, maxval=1), axis=1)
    y_c = jax.random.normal(kv, (batch_size, n_points, 1))
    x_t = x_c
    mask_c = jax.random.uniform(kt, (batch_size, n_points)) < 0.25
    grid = jax.random.normal(kg, (batch_size, n_grid, 128)).astype(jnp.bfloat16)
    r_trgt = jax.random.normal(kg, (1, batch_size, n_points, 128)).astype(
        jnp.bfloat16)

    out = {"batch_size": batch_size, "n_points": n_points,
           "density_induced": density}

    for fused in (False, True):
        model = ConvCNP(y_dim=1, x_dim=1, r_dim=128, density_induced=density,
                        cnn_n_blocks=5, cnn_kernel_size=19,
                        dtype=jnp.bfloat16, fused_mlp=fused)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)},
            x_c, y_c, x_t, mask_cntxt=mask_c, train=False,
        )
        tag = "fused" if fused else "dense"

        def dec_fwd(k, model=model, variables=variables):
            r = r_trgt + jax.random.normal(k, (1,), dtype=jnp.bfloat16)
            y = model.apply(variables, x_t, r,
                            method=lambda m, xt, rr: m.decoder(xt, rr))
            return _use_all(y)

        def dec_loss(params, k, model=model, variables=variables):
            v = {**variables, "params": params}
            r = r_trgt + jax.random.normal(k, (1,), dtype=jnp.bfloat16)
            y = model.apply(v, x_t, r,
                            method=lambda m, xt, rr: m.decoder(xt, rr))
            return _use_all(y)

        def dec_bwd(k, model=model, variables=variables):
            val, g = jax.value_and_grad(dec_loss)(variables["params"], k)
            return val + _use_all(g["decoder"])

        out[f"decoder_{tag}_fwd_us"] = _time_scan(dec_fwd)
        out[f"decoder_{tag}_fwdbwd_us"] = _time_scan(dec_bwd)

        if fused:
            continue  # the remaining stages are identical across the A/B

        def cnn_fwd(k):
            g = grid + jax.random.normal(k, (1,), dtype=jnp.bfloat16)
            y = model.apply(
                variables, g,
                method=lambda m, gg: m.induced_to_induced(gg, train=False),
            )
            return _use_all(y)

        def cnn_loss(params, k):
            v = {**variables, "params": params}
            g = grid + jax.random.normal(k, (1,), dtype=jnp.bfloat16)
            y = model.apply(
                v, g,
                method=lambda m, gg: m.induced_to_induced(gg, train=False),
            )
            return _use_all(y)

        def cnn_bwd(k):
            val, g = jax.value_and_grad(cnn_loss)(variables["params"], k)
            return val + _use_all(g["induced_to_induced"])

        out["cnn_fwd_us"] = _time_scan(cnn_fwd)
        out["cnn_fwdbwd_us"] = _time_scan(cnn_bwd)

        x_ind = jnp.broadcast_to(
            jnp.linspace(-1.5, 1.5, n_grid)[None, :, None],
            (batch_size, n_grid, 1),
        )

        def enc_fwd(k):
            y2 = y_c + jax.random.normal(k, (1,))
            y = model.apply(
                variables, x_c, x_ind, y2,
                method=lambda m, a, b, c: m.cntxt_to_induced(
                    a, b, c, mask_keys=mask_c),
            )
            return _use_all(y)

        def dec_sc_fwd(k):
            g = grid.astype(jnp.float32) + jax.random.normal(k, (1,))
            y = model.apply(
                variables, x_ind, x_t, g,
                method=lambda m, a, b, c: m.induced_to_trgt(a, b, c),
            )
            return _use_all(y)

        out["setconv_enc_fwd_us"] = _time_scan(enc_fwd)
        out["setconv_dec_fwd_us"] = _time_scan(dec_sc_fwd)

    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[256])
    ap.add_argument("--n-points", type=int, default=256)
    ap.add_argument("--density", type=int, default=64)
    ap.add_argument("--out", default="PROFILE_MODEL_STAGES.json")
    args = ap.parse_args()
    rows = []
    for bs in args.batches:
        r = profile(bs, n_points=args.n_points, density=args.density)
        rows.append(r)
        print(json.dumps(r), flush=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()

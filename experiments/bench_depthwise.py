"""A/B microbench: depthwise conv1d vs its banded-matmul equivalent on TPU.

Motivation (profile_step_breakdown + RESULTS.md): fwd+bwd is ~45% of the
flagship step, and the grid CNN's ten depthwise k=19 convs (2 per
ResConvBlock x 5 blocks, ref cnn.py:126-215) are its non-matmul core.
On TPU, `feature_group_count=C` convolutions map poorly to the MXU (each
group is a 1-in/1-out conv — systolic array utilization ~1/128); the same
linear map is expressible as a per-channel banded [N, N] matmul, which IS
an MXU op: out[b, m, c] = sum_n x[b, n, c] * band[c, n, m], with
band[c, n, m] = w[c, n - m + k//2] scattered onto the k diagonals.
That trades 19/N sparsity for MXU throughput: 2*B*N*N*C FLOPs at ~200
TFLOP/s bf16 vs 2*B*N*k*C on the VPU — break-even when MXU/VPU speed
ratio exceeds N/k ~ 10 at the flagship grid (N=192, k=19).

Prints one JSON row per op (fwd and fwd+bwd), plus a numerical-equivalence
check, and writes results/depthwise_bench.json.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, *args, n_rep=100):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_rep


def band_from_kernel(w, n):
    """[k, C] depthwise taps -> [C, n, n] banded matrices (SAME padding).

    band[c, i, j] = w[i - j + k//2, c] when |i - j| <= k//2 else 0, so that
    einsum('bnc,cnm->bmc', x, band) == depthwise_conv1d(x, w, SAME)
    (XLA convs are cross-correlations: out[m] = sum_t x[m+t-k//2]*w[t]).
    """
    k = w.shape[0]
    half = k // 2
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    tap = i - j + half  # [n, n]; contribution of x[i] to out[j]
    valid = (tap >= 0) & (tap < k)
    tap = jnp.clip(tap, 0, k - 1)
    # [n, n, C] gather then move C first
    band = jnp.where(valid[..., None], w[tap], 0.0)
    return jnp.transpose(band, (2, 0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--n", type=int, default=192)
    ap.add_argument("--chan", type=int, default=128)
    ap.add_argument("--k", type=int, default=19)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    B, N, C, K = args.batch, args.n, args.chan, args.k
    dt = jnp.dtype(args.dtype)

    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (B, N, C), dt)
    w = jax.random.normal(kw, (K, C), jnp.float32) / np.sqrt(K)

    dn = jax.lax.conv_dimension_numbers((B, N, C), (K, 1, C), ("NWC", "WIO", "NWC"))

    def depthwise(x, w):
        return jax.lax.conv_general_dilated(
            x, w[:, None, :].astype(x.dtype), (1,), "SAME",
            dimension_numbers=dn, feature_group_count=C,
        )

    def banded(x, w):
        band = band_from_kernel(w, N).astype(x.dtype)
        return jnp.einsum("bnc,cnm->bmc", x, band)

    # --- numerical equivalence (f32 ground truth vs both lowerings)
    ref = np.asarray(depthwise(x.astype(jnp.float32), w))
    for name, fn in (("depthwise", depthwise), ("banded", banded)):
        got = np.asarray(fn(x, w)).astype(np.float32)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(json.dumps({"check": name, "rel_err": float(err)}), flush=True)
        assert err < 0.03, (name, err)  # bf16 rounding only

    rows = []

    def bench(name, fn, wa=w):
        f = jax.jit(fn)
        fwd = time_fn(f, x, wa)

        def loss(x, w):
            return jnp.sum(fn(x, w) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        bwd = time_fn(g, x, wa)
        row = {
            "op": name, "B": B, "N": N, "C": C, "k": K, "dtype": args.dtype,
            "fwd_us": round(fwd * 1e6, 1), "fwd_bwd_us": round(bwd * 1e6, 1),
            "device": jax.devices()[0].device_kind,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    bench("depthwise_conv", depthwise)
    bench("banded_matmul", banded)
    # the pointwise 1x1 for scale (pure MXU matmul, same tensor shape)
    wp = jax.random.normal(kw, (C, C), jnp.float32)
    bench("pointwise_matmul",
          lambda x, w: jnp.einsum("bnc,cd->bnd", x, w.astype(dt)), wa=wp)

    os.makedirs("results", exist_ok=True)
    with open("results/depthwise_bench.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()

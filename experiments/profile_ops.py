"""Profile the SURVEY §7.1 candidate-kernel ops on the real chip and record
whether XLA fusion already saturates them — the measured basis for shipping
ONE Pallas kernel (SetConv) instead of the three the survey sketched.

Ops measured at benchmark shapes, forward+backward, 50 iterations per
dispatch (dispatch latency amortized like the training loop):

1. masked set-encode + mean-pool (the CNP/LNP encoder hot op,
   ref np.py:86-101): pointwise MLP over [B,N,2r] + masked mean.
2. cross-attention decode over padded sets (the AttnCNP target path,
   ref attnnp.py:118-131): transformer attender K=Q=128pts.
3. SetConv context->grid (ref setcnn.py:234-268): XLA lowering vs the
   Pallas kernel, small and long-context shapes.

For each: wall time, XLA-cost-model FLOPs and bytes accessed, achieved
bandwidth vs the chip's ~820 GB/s HBM roofline (v5e), and achieved FLOP/s.
Writes PROFILE_OPS.json; run on TPU (the numbers are meaningless on CPU).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

HBM_GBPS = {"TPU v5 lite": 820.0, "TPU v5e": 820.0, "TPU v4": 1200.0}


def timed(fn, *args, n_outer=8):
    fn_j = jax.jit(fn)
    compiled = fn_j.lower(*args).compile()
    cost = {}
    try:
        ca = compiled.cost_analysis()
        cost = {
            "flops": float(ca.get("flops", float("nan"))),
            "bytes": float(ca.get("bytes accessed", float("nan"))),
        }
    except Exception:
        pass
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_outer):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_outer
    kind = jax.devices()[0].device_kind
    row = {"seconds_per_call": dt, **cost, "device_kind": kind}
    if cost.get("bytes") and cost["bytes"] == cost["bytes"]:
        bw = cost["bytes"] / dt / 1e9
        row["achieved_GBps"] = round(bw, 1)
        peak = next((v for k, v in HBM_GBPS.items() if kind.lower().startswith(k.lower())), None)
        if peak:
            row["hbm_roofline_frac"] = round(bw / peak, 3)
    if cost.get("flops") and cost["flops"] == cost["flops"]:
        row["achieved_TFLOPs"] = round(cost["flops"] / dt / 1e12, 3)
    return row


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny shapes, CPU shape check")
    args = ap.parse_args()

    from npf_gwwaveform_tpu.ops import MLP, get_attender
    from npf_gwwaveform_tpu.ops.setconv import ExpRBF, SetConv
    from npf_gwwaveform_tpu.utils.helpers import masked_mean

    key = jax.random.PRNGKey(0)
    results = {}
    B, N, R = (8, 16, 32) if args.smoke else (256, 128, 128)
    n_inner = 2 if args.smoke else 50

    # ---- 1. masked set-encode + mean-pool (fwd+bwd), CNP encoder shapes
    mlp = MLP(R, hidden_size=2 * R, n_hidden_layers=2)
    xy = jax.random.normal(key, (B, N, 2 * R), jnp.bfloat16)
    mask = jax.random.bernoulli(key, 0.4, (B, N))
    params = mlp.init(key, xy)

    def encode_pool_loss(params, xy):
        r = mlp.apply(params, xy)
        pooled = masked_mean(r, mask, axis=-2)
        return jnp.sum(pooled.astype(jnp.float32) ** 2)

    def many_encode(params, xy):
        def body(c, _):
            l, g = jax.value_and_grad(encode_pool_loss)(params, xy)
            return c + l, None
        return jax.lax.scan(body, 0.0, None, length=n_inner)[0]

    results["set_encode_meanpool"] = timed(many_encode, params, xy)

    # ---- 2. cross-attention decode over padded sets (fwd+bwd)
    att = get_attender("transformer", R, R, R)
    k_x = jax.random.normal(key, (B, N, R), jnp.bfloat16)
    q_x = jax.random.normal(key, (B, N, R), jnp.bfloat16)
    v_r = jax.random.normal(key, (B, N, R), jnp.bfloat16)
    att_params = att.init(key, k_x, q_x, v_r, mask_keys=mask)

    def attn_loss(p, k_, q_, v_):
        out = att.apply(p, k_, q_, v_, mask_keys=mask)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def many_attn(p, k_, q_, v_):
        def body(c, _):
            l, g = jax.value_and_grad(attn_loss)(p, k_, q_, v_)
            return c + l, None
        return jax.lax.scan(body, 0.0, None, length=n_inner)[0]

    results["cross_attention_decode"] = timed(many_attn, att_params, k_x, q_x, v_r)

    # ---- 3. SetConv context->grid: XLA vs Pallas, two shape regimes
    shape_grid = {
        "flagship": (256, 64, 192),
        "long_context": (16, 2048, 6144),
    }
    if args.smoke:
        shape_grid = {"flagship": (4, 8, 16)}
    for tag, (b, nc, ngrid) in shape_grid.items():
        for use_pallas in (False, True):
            sc = SetConv(out_channels=R, use_pallas=use_pallas)
            kx = jax.random.uniform(key, (b, nc, 1), minval=-1, maxval=1)
            qx = jnp.broadcast_to(
                jnp.linspace(-1, 1, ngrid)[None, :, None], (b, ngrid, 1)
            )
            vals = jax.random.normal(key, (b, nc, 2), jnp.float32)
            m = jax.random.bernoulli(key, 0.5, (b, nc))
            sp = sc.init(key, kx, qx, vals, mask_keys=m)

            def sc_loss(p, kx_, vals_):
                out = sc.apply(p, kx_, qx, vals_, mask_keys=m)
                return jnp.sum(out.astype(jnp.float32) ** 2)

            def many_sc(p, kx_, vals_):
                def body(c, _):
                    l, g = jax.value_and_grad(sc_loss)(p, kx_, vals_)
                    return c + l, None
                return jax.lax.scan(body, 0.0, None, length=n_inner)[0]

            results[f"setconv_{tag}_{'pallas' if use_pallas else 'xla'}"] = timed(
                many_sc, sp, kx, vals
            )

    for k, v in results.items():
        print(k, json.dumps(v))
    with open("PROFILE_OPS.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

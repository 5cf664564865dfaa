"""Fused Pallas TPU kernel for the ExpRBF SetConv — the #1 hot op of the
ConvCNP path (SURVEY.md §2.7, §5.7).

Fuses pairwise-distance -> RBF -> masked max-softmax -> weighted value
gather (MXU matmul) -> density channel into one kernel, tiled over the
query/grid axis. The XLA reference path materializes the [B, Q, K] weight
tensor in HBM (the reference's torch code does too, setcnn.py:253-260 with a
TODO admitting it); this kernel keeps each (TQ, K) tile in VMEM, so memory
stays O(B·(Q+K)·C) and long-waveform contexts (K in the thousands) become
feasible.

Backward pass: custom_vjp that recomputes per-query-tile weights in plain
XLA under `lax.map`, so the [B, Q, K] tensor is never materialized in the
backward either (chunked recompute-and-accumulate).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _round_up(x, m):
    return (x + m - 1) // m * m


# keys per in-kernel chunk when K is too large for (TQ, K) temporaries to
# fit the ~16MB scoped-VMEM budget (TQ=512: chunked path cuts peak scratch
# from 4·TQ·K·4B to ~4·TQ·TK·4B ≈ 8MB)
_TK_CHUNK = 2048

# tests set this to False to force real Mosaic lowering (via jax.export
# platforms=['tpu']) even when the process backend is CPU; None = interpret
# iff running on CPU
_INTERPRET_OVERRIDE = None


def _fwd_kernel(sigma_ref, keys_ref, queries_ref, values_ref, mask_ref,
                out_sig_ref, out_den_ref, *, p: int):
    sigma = sigma_ref[0, 0]
    tq = out_sig_ref.shape[1]
    q = queries_ref[0].reshape(tq, 1)  # (TQ, 1)
    K = keys_ref.shape[-1]

    def logits(kc, mc_raw):
        """(TQ, tk) masked log-weights for one key chunk (kc (1, tk))."""
        dist = jnp.abs(kc - q)
        if p == 2:
            inp = -((dist / sigma) ** 2)
        else:
            inp = -((dist / sigma) ** p)
        return inp, mc_raw > 0.5

    # NOTE: chunk loads use pl.ds on the REFS (not lax.dynamic_slice on
    # loaded arrays) — Mosaic has no lowering for the dynamic_slice
    # primitive inside a TPU kernel, only for dynamic ref indexing.
    def load_chunk(i):
        sl = pl.ds(i * _TK_CHUNK, _TK_CHUNK)
        kc = keys_ref[0, :, sl]          # (1, TK)
        mc = mask_ref[0, :, sl]          # (1, TK)
        return logits(kc, mc)

    if K <= _TK_CHUNK:
        inp, mc = logits(keys_ref[0], mask_ref[0])
        neg = jnp.where(mc, inp, NEG)
        m = jnp.max(neg, axis=1, keepdims=True)
        unnorm = jnp.exp(neg - m) * mc.astype(inp.dtype)
        wsum = jnp.sum(unnorm, axis=1, keepdims=True)
        w = unnorm / jnp.maximum(wsum, 1e-30)  # (TQ, K)
        out_sig_ref[0] = jnp.dot(
            w, values_ref[0], preferred_element_type=jnp.float32
        )
        # density: RAW exp sum (underflow far from context is the semantic)
        out_den_ref[0] = jnp.sum(
            jnp.exp(inp) * mc.astype(inp.dtype), axis=1
        ).reshape(1, tq)
        return

    # Large-K path: two passes over key chunks so peak scratch is
    # O(TQ·TK), exactly the softmax the vectorized path computes.
    n_chunks = pl.cdiv(K, _TK_CHUNK)  # K is static; assume padded to chunk

    def max_body(i, m):
        inp, mc = load_chunk(i)
        neg = jnp.where(mc, inp, NEG)
        return jnp.maximum(m, jnp.max(neg, axis=1, keepdims=True))

    m = jax.lax.fori_loop(
        0, n_chunks, max_body, jnp.full((tq, 1), NEG, jnp.float32)
    )

    def acc_body(i, carry):
        sig_acc, wsum, den = carry
        inp, mc = load_chunk(i)
        neg = jnp.where(mc, inp, NEG)
        unnorm = jnp.exp(neg - m) * mc.astype(inp.dtype)
        vc = values_ref[0, pl.ds(i * _TK_CHUNK, _TK_CHUNK), :]
        sig_acc = sig_acc + jnp.dot(
            unnorm, vc, preferred_element_type=jnp.float32
        )
        wsum = wsum + jnp.sum(unnorm, axis=1, keepdims=True)
        den = den + jnp.sum(jnp.exp(inp) * mc.astype(inp.dtype), axis=1)
        return sig_acc, wsum, den

    C = out_sig_ref.shape[-1]
    sig_acc, wsum, den = jax.lax.fori_loop(
        0, n_chunks, acc_body,
        (jnp.zeros((tq, C), jnp.float32), jnp.zeros((tq, 1), jnp.float32),
         jnp.zeros((tq,), jnp.float32)),
    )
    out_sig_ref[0] = sig_acc / jnp.maximum(wsum, 1e-30)
    out_den_ref[0] = den.reshape(1, tq)


def _setconv_pallas_fwd_impl(keys, queries, values, maskf, sigma, p):
    """keys [B,K], queries [B,Q], values [B,K,C], maskf [B,K] float,
    sigma scalar -> (signal [B,Q,C], density [B,Q])."""
    B, K = keys.shape
    Q = queries.shape[1]
    C = values.shape[-1]

    if K > _TK_CHUNK and K % _TK_CHUNK:
        # chunked kernel path slices K in _TK_CHUNK steps; pad with
        # masked-out keys (mask 0 -> zero weight and zero density)
        padk = _round_up(K, _TK_CHUNK) - K
        keys = jnp.pad(keys, ((0, 0), (0, padk)))
        maskf = jnp.pad(maskf, ((0, 0), (0, padk)))
        values = jnp.pad(values, ((0, 0), (0, padk), (0, 0)))
        K += padk

    TQ = min(512, _round_up(Q, 128))
    grid = (B, pl.cdiv(Q, TQ))

    sigma_arr = jnp.reshape(sigma.astype(jnp.float32), (1, 1))
    # TPU block shapes need the last two dims (8,128)-aligned or array-equal;
    # lift the per-batch 1-D arrays to [B, 1, N] so (1, 1, N) blocks are legal
    keys3 = keys[:, None, :]
    queries3 = queries[:, None, :]
    mask3 = maskf[:, None, :]

    out_sig, out_den = pl.pallas_call(
        functools.partial(_fwd_kernel, p=p),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, K), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, TQ), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, K, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, K), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TQ, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, TQ), lambda b, i: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Q, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Q), jnp.float32),
        ],
        interpret=(_INTERPRET_OVERRIDE if _INTERPRET_OVERRIDE is not None
                   else jax.default_backend() == "cpu"),
    )(sigma_arr, keys3, queries3, values.astype(jnp.float32), mask3)
    return out_sig, out_den[:, 0, :]


def _xla_tile(keys, values, maskf, sigma, p, q_tile):
    """Reference math for one query tile (used by the chunked backward).
    q_tile [B, TQ] -> (signal [B,TQ,C], density [B,TQ])."""
    dist = jnp.abs(keys[:, None, :] - q_tile[:, :, None])  # [B,TQ,K]
    inp = -((dist / sigma) ** p)
    msk = maskf[:, None, :] > 0.5
    neg = jnp.where(msk, inp, NEG)
    m = jax.lax.stop_gradient(jnp.max(neg, axis=-1, keepdims=True))
    unnorm = jnp.exp(neg - m) * msk.astype(inp.dtype)
    w = unnorm / jnp.maximum(jnp.sum(unnorm, -1, keepdims=True), 1e-30)
    sig = jnp.einsum("bqk,bkc->bqc", w, values)
    den = jnp.sum(jnp.exp(inp) * msk.astype(inp.dtype), axis=-1)
    return sig, den


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _setconv_core(keys, queries, values, maskf, sigma, p):
    return _setconv_pallas_fwd_impl(keys, queries, values, maskf, sigma, p)


def _core_fwd(keys, queries, values, maskf, sigma, p):
    out = _setconv_pallas_fwd_impl(keys, queries, values, maskf, sigma, p)
    return out, (keys, queries, values, maskf, sigma)


def _core_bwd(p, res, cts):
    keys, queries, values, maskf, sigma = res
    g_sig, g_den = cts
    B, Q = queries.shape
    TQ = min(512, Q)
    n_tiles = (Q + TQ - 1) // TQ
    pad = n_tiles * TQ - Q
    q_pad = jnp.pad(queries, ((0, 0), (0, pad)))
    gs_pad = jnp.pad(g_sig, ((0, 0), (0, pad), (0, 0)))
    gd_pad = jnp.pad(g_den, ((0, 0), (0, pad)))

    def tile_grads(i):
        q_t = jax.lax.dynamic_slice_in_dim(q_pad, i * TQ, TQ, axis=1)
        gs_t = jax.lax.dynamic_slice_in_dim(gs_pad, i * TQ, TQ, axis=1)
        gd_t = jax.lax.dynamic_slice_in_dim(gd_pad, i * TQ, TQ, axis=1)

        def f(args):
            k, q, v, s = args
            return _xla_tile(k, v, maskf, s, p, q)

        _, vjp = jax.vjp(lambda k, q, v, s: _xla_tile(k, v, maskf, s, p, q),
                         keys, q_t, values, sigma)
        dk, dq, dv, ds = vjp((gs_t, gd_t))
        return dk, dq, dv, ds

    dks, dqs, dvs, dss = jax.lax.map(tile_grads, jnp.arange(n_tiles))
    d_keys = jnp.sum(dks, axis=0)
    d_values = jnp.sum(dvs, axis=0)
    d_sigma = jnp.sum(dss, axis=0)
    d_queries = jnp.moveaxis(dqs, 0, 1).reshape(B, n_tiles * TQ)[:, :Q]
    return d_keys, d_queries, d_values, None, d_sigma


_setconv_core.defvjp(_core_fwd, _core_bwd)


def setconv_exprbf_pallas(keys_x, queries_x, values, mask_keys, sigma, p: int = 2):
    """Fused masked ExpRBF SetConv.

    keys_x [B,K,1], queries_x [B,Q,1], values [B,K,C], mask_keys [B,K]
    -> [B, Q, C+1] (signal channels + raw density channel), float32.
    """
    assert keys_x.shape[-1] == 1, "pallas SetConv supports x_dim==1"
    keys = keys_x[..., 0].astype(jnp.float32)
    queries = queries_x[..., 0].astype(jnp.float32)
    maskf = mask_keys.astype(jnp.float32)
    sig, den = _setconv_core(
        keys, queries, values.astype(jnp.float32), maskf,
        jnp.asarray(sigma, jnp.float32), p
    )
    return jnp.concatenate([sig, den[..., None]], axis=-1)

"""Fused Pallas TPU kernel for the relu MLP chain.

MEASURED OUTCOME (v5e, flagship shapes — PROFILE_MODEL_STAGES.json +
BENCH_DETAIL.json `variants`): this kernel LOSES to XLA's dense lowering
at the NPF decoder's shapes (565 vs 336 us fwd+bwd at [65536, 128] x five
128-wide layers; 111.1k vs 118.6k wf/s end-to-end). XLA already runs the
dense chain at ~60% of HBM bandwidth with MXU pipelining across dots; the
sequential row-tile grid here pays per-tile overhead on 167-MFLOP tiles
plus a full forward recompute in the backward. Kept flag-gated
(`MLP(fused=True)`, default off) as the shape-class probe — the win
regime is wider/deeper chains where inter-layer HBM traffic dominates,
not 128-wide NPF decoders.

Why: the NPF decoders/encoders are chains of [M, 128] x [128, 128] matmuls
(reference decoder: 4-hidden MLP, npf/neuralproc/base.py:157-175; ours
ops/mlp.py). XLA never fuses dot->dot, so every inter-layer activation makes
an HBM round trip: at the flagship shape (M = 256 x 256 targets, bf16) that
is ~16 MB per layer per direction against ~54 us of MXU work for the whole
chain — each matmul is ~4x HBM-bound. This kernel runs the ENTIRE MLP
(to_hidden -> relu -> hidden layers -> out) in one pallas_call: weights stay
resident in VMEM across the row-tile grid, activations never leave VMEM, HBM
traffic drops from ~2*(L+1) arrays to exactly read-x + write-out.

Backward: custom_vjp. The TPU Pallas grid is sequential on a core, so dW/db
accumulate across row tiles in revisited output blocks (constant index_map,
zero-initialized at program_id 0); activations are recomputed per tile in
VMEM (recompute is free here — the op is memory-bound). Gradient dots run in
the compute dtype with f32 accumulation, matching XLA's own bf16 backward
numerics; dW is accumulated and returned in f32 (the param dtype).

Semantics parity: exactly ops/mlp.py MLP.__call__ with dropout == 0 and
activation == relu (the notebook-parity decoder/xy-encoder configs;
reference mlp.py:95-109 order to_hidden -> act -> (linear -> act -> +res)*
-> out), for any n_hidden_layers >= 1 (at 1 there are no hidden-stack
layers: to_hidden -> relu -> out). Non-aligned dims are zero-padded to
lane/tile multiples (zero rows/cols are exact no-ops through relu chains).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tests set this to False to force real Mosaic lowering even on CPU;
# None = interpret iff running on CPU (same convention as setconv_kernel)
_INTERPRET_OVERRIDE = None


def _interpret():
    if _INTERPRET_OVERRIDE is not None:
        return _INTERPRET_OVERRIDE
    return jax.default_backend() == "cpu"


def _round_up(x, m):
    return (x + m - 1) // m * m


def _fwd_kernel(x_ref, w0_ref, b0_ref, wh_ref, bh_ref, wout_ref, bout_ref,
                out_ref, *, n_hid: int, is_res: bool, cdtype):
    """One row tile through the whole chain; weights are full-array blocks.

    relu/compare runs in f32 (the dot outputs are f32 already): Mosaic on
    v5e rejects cmpf on packed bf16 vectors ("Target does not support this
    comparison"), and max(x,0) commutes with the bf16 downcast exactly.
    """
    f32 = jnp.float32
    a = x_ref[:]
    h = jnp.dot(a, w0_ref[:], preferred_element_type=f32)
    a = jnp.maximum(h + b0_ref[:].astype(f32), 0).astype(cdtype)
    for i in range(n_hid):
        h = jnp.dot(a, wh_ref[i], preferred_element_type=f32)
        r = jnp.maximum(h + bh_ref[i][None, :].astype(f32), 0).astype(cdtype)
        a = r + a if is_res else r
    h = jnp.dot(a, wout_ref[:], preferred_element_type=f32)
    out_ref[:] = (h + bout_ref[:].astype(f32)).astype(cdtype)


def _bwd_kernel(x_ref, g_ref, w0_ref, b0_ref, wh_ref, bh_ref, wout_ref,
                dx_ref, dw0_ref, db0_ref, dwh_ref, dbh_ref, dwout_ref,
                dbout_ref, *, n_hid: int, is_res: bool, cdtype):
    """Recompute the tile's activations in VMEM, then backprop; dW/db
    accumulate across the (sequential) grid in constant-index blocks."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dw0_ref, db0_ref, dwh_ref, dbh_ref, dwout_ref, dbout_ref):
            if ref is not None:
                ref[:] = jnp.zeros(ref.shape, ref.dtype)

    f32 = jnp.float32
    x = x_ref[:]
    # forward recompute, keeping layer inputs a_i and relu masks m_i.
    # Comparisons run on the f32 pre-activations (bf16 cmpf is unsupported
    # on v5e Mosaic); masks are materialized as 0/1 in cdtype via select.
    h = jnp.dot(x, w0_ref[:], preferred_element_type=f32)
    h = h + b0_ref[:].astype(f32)
    m = jnp.where(h > 0, 1.0, 0.0).astype(cdtype)
    r = jnp.maximum(h, 0).astype(cdtype)
    acts = [r]  # a_1 == r_0 (no residual on the first layer, mlp.py:66-70)
    masks = [m]
    a = r
    for i in range(n_hid):
        h = jnp.dot(a, wh_ref[i], preferred_element_type=f32)
        h = h + bh_ref[i][None, :].astype(f32)
        masks.append(jnp.where(h > 0, 1.0, 0.0).astype(cdtype))
        r = jnp.maximum(h, 0).astype(cdtype)
        a = r + a if is_res else r
        acts.append(a)

    g = g_ref[:]
    # out layer: dwout += a_last^T g ; g -> g @ wout^T
    dwout_ref[:] += jax.lax.dot_general(
        acts[-1], g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbout_ref[:] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
    g = jax.lax.dot_general(
        g, wout_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdtype)

    for i in range(n_hid - 1, -1, -1):
        gpre = g * masks[i + 1]
        dwh_ref[i] += jax.lax.dot_general(
            acts[i], gpre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbh_ref[i] += jnp.sum(gpre.astype(jnp.float32), axis=0)
        gnext = jax.lax.dot_general(
            gpre, wh_ref[i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdtype)
        g = gnext + g if is_res else gnext

    gpre = g * masks[0]
    dw0_ref[:] += jax.lax.dot_general(
        x, gpre, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db0_ref[:] += jnp.sum(gpre.astype(jnp.float32), axis=0, keepdims=True)
    dx_ref[:] = jax.lax.dot_general(
        gpre, w0_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)


def _tile_m(M):
    return min(1024, _round_up(M, 128))


def _fwd_impl(x, w0, b0, wh, bh, wout, bout, is_res, cdtype):
    """Aligned shapes: x [M, C], w0 [C, H], b0 [1, H], wh [L1, H, H],
    bh [L1, H], wout [H, O], bout [1, O]; M % TILE == 0, C/H/O % 128 == 0."""
    M, C = x.shape
    H = w0.shape[1]
    L1, O = wh.shape[0], wout.shape[1]
    TM = _tile_m(M)
    const = lambda i: (0, 0)
    if L1:
        kern = functools.partial(_fwd_kernel, n_hid=L1, is_res=is_res,
                                 cdtype=cdtype)
        hid_specs = [pl.BlockSpec((L1, H, H), lambda i: (0, 0, 0)),
                     pl.BlockSpec((L1, H), const)]
        hid_args = [wh.astype(cdtype), bh.astype(cdtype)]
    else:
        # n_hidden_layers == 1: to_hidden -> relu -> out only
        def kern(x_ref, w0_ref, b0_ref, wout_ref, bout_ref, out_ref):
            _fwd_kernel(x_ref, w0_ref, b0_ref, None, None, wout_ref,
                        bout_ref, out_ref, n_hid=0, is_res=is_res,
                        cdtype=cdtype)
        hid_specs, hid_args = [], []
    return pl.pallas_call(
        kern,
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((TM, C), lambda i: (i, 0)),
            pl.BlockSpec((C, H), const),
            pl.BlockSpec((1, H), const),
            *hid_specs,
            pl.BlockSpec((H, O), const),
            pl.BlockSpec((1, O), const),
        ],
        out_specs=pl.BlockSpec((TM, O), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, O), cdtype),
        interpret=_interpret(),
    )(x.astype(cdtype), w0.astype(cdtype), b0.astype(cdtype),
      *hid_args, wout.astype(cdtype), bout.astype(cdtype))


def _bwd_impl(x, g, w0, b0, wh, bh, wout, is_res, cdtype):
    M, C = x.shape
    H = w0.shape[1]
    L1, O = wh.shape[0], wout.shape[1]
    TM = _tile_m(M)
    const = lambda i: (0, 0)
    f32 = jnp.float32
    if L1:
        kern = functools.partial(_bwd_kernel, n_hid=L1, is_res=is_res,
                                 cdtype=cdtype)
        hid_specs = [pl.BlockSpec((L1, H, H), lambda i: (0, 0, 0)),
                     pl.BlockSpec((L1, H), const)]
        hid_args = [wh.astype(cdtype), bh.astype(cdtype)]
        dhid_specs = list(hid_specs)
        dhid_shapes = [jax.ShapeDtypeStruct((L1, H, H), f32),
                       jax.ShapeDtypeStruct((L1, H), f32)]
    else:
        def kern(x_ref, g_ref, w0_ref, b0_ref, wout_ref, dx_ref, dw0_ref,
                 db0_ref, dwout_ref, dbout_ref):
            _bwd_kernel(x_ref, g_ref, w0_ref, b0_ref, None, None, wout_ref,
                        dx_ref, dw0_ref, db0_ref, None, None, dwout_ref,
                        dbout_ref, n_hid=0, is_res=is_res, cdtype=cdtype)
        hid_specs, hid_args, dhid_specs, dhid_shapes = [], [], [], []
    out = pl.pallas_call(
        kern,
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((TM, C), lambda i: (i, 0)),
            pl.BlockSpec((TM, O), lambda i: (i, 0)),
            pl.BlockSpec((C, H), const),
            pl.BlockSpec((1, H), const),
            *hid_specs,
            pl.BlockSpec((H, O), const),
        ],
        out_specs=[
            pl.BlockSpec((TM, C), lambda i: (i, 0)),
            pl.BlockSpec((C, H), const),
            pl.BlockSpec((1, H), const),
            *dhid_specs,
            pl.BlockSpec((H, O), const),
            pl.BlockSpec((1, O), const),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, C), x.dtype),
            jax.ShapeDtypeStruct((C, H), f32),
            jax.ShapeDtypeStruct((1, H), f32),
            *dhid_shapes,
            jax.ShapeDtypeStruct((H, O), f32),
            jax.ShapeDtypeStruct((1, O), f32),
        ],
        interpret=_interpret(),
    )(x.astype(cdtype), g.astype(cdtype), w0.astype(cdtype),
      b0.astype(cdtype), *hid_args, wout.astype(cdtype))
    if not L1:
        dx, dw0, db0, dwout, dbout = out
        zhw = jnp.zeros((0, H, H), f32)
        zhb = jnp.zeros((0, H), f32)
        return dx, dw0, db0, zhw, zhb, dwout, dbout
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _mlp_core(x, w0, b0, wh, bh, wout, bout, is_res, cdtype):
    return _fwd_impl(x, w0, b0, wh, bh, wout, bout, is_res, cdtype)


def _core_fwd(x, w0, b0, wh, bh, wout, bout, is_res, cdtype):
    out = _fwd_impl(x, w0, b0, wh, bh, wout, bout, is_res, cdtype)
    return out, (x, w0, b0, wh, bh, wout, bout)


def _core_bwd(is_res, cdtype, res, g):
    x, w0, b0, wh, bh, wout, bout = res
    dx, dw0, db0, dwh, dbh, dwout, dbout = _bwd_impl(
        x, g, w0, b0, wh, bh, wout, is_res, cdtype)
    return (dx, dw0.astype(w0.dtype), db0.astype(b0.dtype),
            dwh.astype(wh.dtype), dbh.astype(bh.dtype),
            dwout.astype(wout.dtype), dbout.astype(bout.dtype))


_mlp_core.defvjp(_core_fwd, _core_bwd)


def fused_relu_mlp(x, w0, b0, wh, bh, wout, bout, *, is_res=False,
                   compute_dtype=jnp.float32):
    """Run the full relu MLP chain in one fused kernel.

    x [..., C]; w0 [C, H], b0 [H]; wh [L1, H, H], bh [L1, H] (L1 >= 0 hidden
    layers beyond to_hidden); wout [H, O], bout [O]. Returns [..., O] in
    `compute_dtype`. Biases may be None (treated as zero). Arbitrary dims —
    zero-padded to hardware tiles internally.
    """
    C = x.shape[-1]
    H = w0.shape[1]
    L1, O = wh.shape[0], wout.shape[1]
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, C)

    Cp, Hp, Op = _round_up(C, 128), _round_up(H, 128), _round_up(O, 128)
    Mp = _round_up(max(M, 1), _tile_m(max(M, 1)))
    zeros = jnp.zeros
    f32 = jnp.float32
    b0 = zeros((H,), f32) if b0 is None else b0
    bh = zeros((L1, H), f32) if bh is None else bh
    bout = zeros((O,), f32) if bout is None else bout

    x2 = jnp.pad(x2, ((0, Mp - M), (0, Cp - C)))
    w0 = jnp.pad(w0, ((0, Cp - C), (0, Hp - H)))
    b0 = jnp.pad(b0, (0, Hp - H)).reshape(1, Hp)
    wh = jnp.pad(wh, ((0, 0), (0, Hp - H), (0, Hp - H)))
    bh = jnp.pad(bh, ((0, 0), (0, Hp - H)))
    wout = jnp.pad(wout, ((0, Hp - H), (0, Op - O)))
    bout = jnp.pad(bout, (0, Op - O)).reshape(1, Op)

    out = _mlp_core(x2, w0, b0, wh, bh, wout, bout, is_res, compute_dtype)
    return out[:M, :O].reshape(*lead, O)

"""Fused Pallas MLP-chain kernel vs the nn.Dense path: identical param tree,
forward and gradient parity (interpret mode on CPU; compiled on TPU), plus
a Mosaic lowering regression test via jax.export platforms=['tpu']."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npf_gwwaveform_tpu.ops import mlp as mlp_mod
from npf_gwwaveform_tpu.ops.mlp import MLP
from npf_gwwaveform_tpu.ops.pallas import mlp_chain_kernel as mk


def _pair(output_size, **kw):
    return (MLP(output_size, fused=False, **kw),
            MLP(output_size, fused=True, **kw))


CONFIGS = [
    # the flagship decoder: 4-hidden r_dim chain, out = 2*y_dim
    dict(output_size=2, hidden_size=128, n_hidden_layers=4, in_dim=128,
         lead=(2, 3, 50)),
    # xy-encoder shape (2-hidden)
    dict(output_size=128, hidden_size=128, n_hidden_layers=2, in_dim=128,
         lead=(4, 32)),
    # unaligned dims exercise the zero-padding path
    dict(output_size=5, hidden_size=40, n_hidden_layers=3, in_dim=7,
         lead=(11,)),
    # residual variant
    dict(output_size=6, hidden_size=64, n_hidden_layers=4, in_dim=64,
         lead=(3, 17), is_res=True),
    # n_hidden_layers == 1 (x-encoder / latent-encoder / resizer shape):
    # to_hidden -> relu -> out only
    dict(output_size=128, hidden_size=128, n_hidden_layers=1, in_dim=1,
         lead=(2, 40)),
]


def _build(cfg, dtype=None):
    kw = {k: v for k, v in cfg.items() if k not in ("in_dim", "lead")}
    ref, fused = _pair(dtype=dtype, **kw)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=cfg["lead"] + (cfg["in_dim"],)),
        jnp.float32,
    )
    variables = ref.init(jax.random.PRNGKey(0), x)
    return ref, fused, variables, x


@pytest.mark.parametrize("cfg", CONFIGS)
def test_param_tree_identical(cfg):
    ref, fused, variables, x = _build(cfg)
    fused_vars = fused.init(jax.random.PRNGKey(0), x)
    ref_tree = jax.tree.map(lambda a: (a.shape, a.dtype), variables)
    fused_tree = jax.tree.map(lambda a: (a.shape, a.dtype), fused_vars)
    assert ref_tree == fused_tree


@pytest.mark.parametrize("cfg", CONFIGS)
def test_forward_matches_dense_f32(cfg):
    ref, fused, variables, x = _build(cfg)
    out_ref = ref.apply(variables, x)
    out_fused = fused.apply(variables, x)
    assert out_fused.shape == out_ref.shape
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("cfg", CONFIGS)
def test_gradients_match_dense_f32(cfg):
    ref, fused, variables, x = _build(cfg)
    ct = jnp.asarray(
        np.random.default_rng(1).normal(size=ref.apply(variables, x).shape),
        jnp.float32,
    )

    def loss(mod):
        def f(v, xx):
            return jnp.sum(mod.apply(v, xx) * ct)
        return f

    g_ref, gx_ref = jax.grad(loss(ref), argnums=(0, 1))(variables, x)
    g_fused, gx_fused = jax.grad(loss(fused), argnums=(0, 1))(variables, x)
    np.testing.assert_allclose(
        np.asarray(gx_fused), np.asarray(gx_ref), rtol=1e-4, atol=1e-5
    )
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g_ref), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g_fused), key=lambda t: str(t[0])),
    ):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=str(pa),
        )


def test_forward_matches_dense_bf16():
    cfg = CONFIGS[0]
    ref, fused, variables, x = _build(cfg, dtype=jnp.bfloat16)
    out_ref = ref.apply(variables, x).astype(jnp.float32)
    out_fused = fused.apply(variables, x).astype(jnp.float32)
    # bf16 chains round differently per-op; bound the relative error on the
    # pre-activation scale
    scale = np.maximum(np.abs(np.asarray(out_ref)), 1.0)
    np.testing.assert_allclose(
        np.asarray(out_fused) / scale, np.asarray(out_ref) / scale, atol=0.05
    )


def test_dropout_falls_back_to_dense():
    """fused=True with dropout>0 must keep the reference semantics (dropout
    applied), i.e. silently use the Dense path."""
    mod = MLP(4, hidden_size=16, n_hidden_layers=3, dropout=0.5, fused=True)
    x = jnp.ones((8, 16))
    variables = mod.init(jax.random.PRNGKey(0), x)
    out_det = mod.apply(variables, x, deterministic=True)
    out_rng = mod.apply(
        variables, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert not np.allclose(np.asarray(out_det), np.asarray(out_rng))


def test_fused_mlp_lowers_for_tpu(monkeypatch):
    """Full fwd+bwd Mosaic lowering without a TPU device."""
    from jax import export

    monkeypatch.setattr(mk, "_INTERPRET_OVERRIDE", False)
    L1, H, C, O, M = 3, 128, 128, 128, 2048

    def loss(x, w0, b0, wh, bh, wout, bout):
        out = mk.fused_relu_mlp(x, w0, b0, wh, bh, wout, bout,
                                compute_dtype=jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6)))
    args = (
        jax.ShapeDtypeStruct((M, C), jnp.float32),
        jax.ShapeDtypeStruct((C, H), jnp.float32),
        jax.ShapeDtypeStruct((H,), jnp.float32),
        jax.ShapeDtypeStruct((L1, H, H), jnp.float32),
        jax.ShapeDtypeStruct((L1, H), jnp.float32),
        jax.ShapeDtypeStruct((H, O), jnp.float32),
        jax.ShapeDtypeStruct((O,), jnp.float32),
    )
    exported = export.export(fn, platforms=["tpu"])(*args)
    assert "tpu" in exported.platforms


def test_convcnp_fused_decoder_trains():
    """End-to-end: ConvCNP(fused_mlp=True) forward + grad step runs and its
    loss matches the unfused model at identical params (f32)."""
    from npf_gwwaveform_tpu import ConvCNP
    from npf_gwwaveform_tpu.losses import CNPFLoss

    B, N = 2, 32
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.sort(rng.uniform(-1, 1, (B, N, 1)), axis=1), jnp.float32)
    y = jnp.asarray(rng.normal(size=(B, N, 1)), jnp.float32)
    mask_c = jnp.asarray(rng.uniform(size=(B, N)) > 0.5)
    mask_t = jnp.ones((B, N), bool)

    kw = dict(y_dim=1, x_dim=1, r_dim=32, density_induced=16, cnn_n_blocks=2,
              cnn_kernel_size=5)
    m0 = ConvCNP(**kw)
    m1 = ConvCNP(fused_mlp=True, **kw)
    variables = m0.init(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)},
        x, y, x, mask_cntxt=mask_c, mask_trgt=mask_t, train=False,
    )

    def loss(mod, v):
        out = mod.apply(v, x, y, x, mask_cntxt=mask_c, mask_trgt=mask_t,
                        train=False, rngs={"latent": jax.random.PRNGKey(2)})
        return CNPFLoss()(out, y, mask_t)

    l0, g0 = jax.value_and_grad(lambda v: loss(m0, v))(variables)
    l1, g1 = jax.value_and_grad(lambda v: loss(m1, v))(variables)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    d0 = jax.tree_util.tree_leaves(g0["params"]["decoder"])
    d1 = jax.tree_util.tree_leaves(g1["params"]["decoder"])
    for a, b in zip(d0, d1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )

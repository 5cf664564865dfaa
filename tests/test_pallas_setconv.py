"""Pallas SetConv kernel vs the XLA reference path: forward and gradients
(runs in pallas interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npf_gwwaveform_tpu.ops.pallas.setconv_kernel import setconv_exprbf_pallas
from npf_gwwaveform_tpu.ops.setconv import ExpRBF, SetConv


def _xla_reference(keys_x, queries_x, values, mask, sigma, p=2):
    rbf = ExpRBF()
    params = {
        "length_scale_param": jnp.log(jnp.expm1(jnp.asarray([sigma - 1e-5])))
    }
    w, d = rbf.apply({"params": params}, keys_x, queries_x, mask)
    sig = jnp.einsum("bqk,bkc->bqc", w, values)
    return jnp.concatenate([sig, d], axis=-1)


@pytest.mark.parametrize("B,K,Q,C", [(2, 16, 48, 8), (1, 7, 130, 4)])
def test_pallas_forward_matches_xla(B, K, Q, C):
    rng = np.random.default_rng(0)
    keys = jnp.asarray(np.sort(rng.uniform(-1, 1, (B, K, 1)), axis=1), jnp.float32)
    queries = jnp.asarray(rng.uniform(-1.5, 1.5, (B, Q, 1)), jnp.float32)
    values = jnp.asarray(rng.normal(size=(B, K, C)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, K)) > 0.3)
    sigma = 0.05

    ours = setconv_exprbf_pallas(keys, queries, values, mask, sigma)
    ref = _xla_reference(keys, queries, values, mask, sigma)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_pallas_gradients_match_xla():
    rng = np.random.default_rng(1)
    B, K, Q, C = 2, 12, 40, 6
    keys = jnp.asarray(rng.uniform(-1, 1, (B, K, 1)), jnp.float32)
    queries = jnp.asarray(rng.uniform(-1.2, 1.2, (B, Q, 1)), jnp.float32)
    values = jnp.asarray(rng.normal(size=(B, K, C)), jnp.float32)
    mask = jnp.ones((B, K), bool)
    sigma = jnp.float32(0.08)

    def loss_pallas(k, q, v, s):
        return jnp.sum(setconv_exprbf_pallas(k, q, v, mask, s) ** 2)

    def loss_xla(k, q, v, s):
        return jnp.sum(_xla_reference(k, q, v, mask, s) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(keys, queries, values, sigma)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(keys, queries, values, sigma)
    for a, b, name in zip(gp, gx, ["keys", "queries", "values", "sigma"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3, err_msg=name
        )


def test_setconv_module_pallas_flag():
    """SetConv(use_pallas=True) must produce the same output as the default
    path with identical params."""
    rng = np.random.default_rng(2)
    B, K, Q = 2, 10, 33
    keys = jnp.asarray(rng.uniform(-1, 1, (B, K, 1)), jnp.float32)
    queries = jnp.asarray(rng.uniform(-1, 1, (B, Q, 1)), jnp.float32)
    values = jnp.asarray(rng.normal(size=(B, K, 2)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, K)) > 0.2)

    m_ref = SetConv(out_channels=16, use_pallas=False)
    m_pal = SetConv(out_channels=16, use_pallas=True)
    params = m_ref.init(jax.random.PRNGKey(0), keys, queries, values, mask)
    out_ref = m_ref.apply(params, keys, queries, values, mask)
    out_pal = m_pal.apply(params, keys, queries, values, mask)
    np.testing.assert_allclose(
        np.asarray(out_pal), np.asarray(out_ref), atol=1e-5
    )


def test_pallas_chunked_large_k_matches_xla(monkeypatch):
    """K > _TK_CHUNK takes the two-pass chunked path (VMEM-bounded scratch
    for long-context grids, e.g. 6144-key induced grids); force a tiny
    chunk so CPU interpret mode exercises chunking + K-padding cheaply."""
    import npf_gwwaveform_tpu.ops.pallas.setconv_kernel as sk

    monkeypatch.setattr(sk, "_TK_CHUNK", 32)
    rng = np.random.default_rng(2)
    B, K, Q, C = 2, 81, 96, 8  # K % chunk != 0 -> exercises mask padding
    keys = jnp.asarray(rng.uniform(-1, 1, (B, K, 1)), jnp.float32)
    queries = jnp.asarray(rng.uniform(-1.5, 1.5, (B, Q, 1)), jnp.float32)
    values = jnp.asarray(rng.normal(size=(B, K, C)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, K)) > 0.3)
    sigma = 0.05

    ours = sk.setconv_exprbf_pallas(keys, queries, values, mask, sigma)
    ref = _xla_reference(keys, queries, values, mask, sigma)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)

    # empty-context batch row must still give zero signal + zero density
    mask0 = mask.at[0].set(False)
    out0 = sk.setconv_exprbf_pallas(keys, queries, values, mask0, sigma)
    np.testing.assert_allclose(np.asarray(out0[0]), 0.0, atol=1e-6)


def test_pallas_chunked_real_shape_smoke():
    """One real >2048-key shape through the chunked path (interpret mode)."""
    rng = np.random.default_rng(3)
    B, K, Q, C = 1, 2176, 64, 4  # 2176 = 2048 + 128 -> padded to 4096
    keys = jnp.asarray(rng.uniform(-1, 1, (B, K, 1)), jnp.float32)
    queries = jnp.asarray(rng.uniform(-1.2, 1.2, (B, Q, 1)), jnp.float32)
    values = jnp.asarray(rng.normal(size=(B, K, C)), jnp.float32)
    mask = jnp.ones((B, K), bool)
    ours = setconv_exprbf_pallas(keys, queries, values, mask, 0.05)
    ref = _xla_reference(keys, queries, values, mask, 0.05)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)

"""TPU Mosaic lowering regression tests for the Pallas SetConv kernel.

`jax.export` with platforms=['tpu'] runs the full Pallas->Mosaic lowering
pass without needing a TPU device, so these tests catch "Unimplemented
primitive in Pallas TPU lowering" regressions (e.g. lax.dynamic_slice on a
loaded array, which Mosaic cannot lower — round-3 bug: the key-chunked
path silently broke every use_pallas_setconv=True TPU run) from the CPU
test environment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npf_gwwaveform_tpu.ops.pallas import setconv_kernel as sk


def _export_for_tpu(B, K, Q, C):
    """Lower the fused SetConv for the TPU platform (no execution)."""
    from jax import export

    fn = jax.jit(
        lambda k, q, v, m, s: sk.setconv_exprbf_pallas(k, q, v, m, s)
    )
    args = (
        jax.ShapeDtypeStruct((B, K, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, Q, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, K, 4), jnp.float32),
        jax.ShapeDtypeStruct((B, K), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
    )
    return export.export(fn, platforms=["tpu"])(*args)


@pytest.mark.parametrize(
    "B,K,Q,C",
    [
        (2, 256, 192, 4),       # flagship shape: small-K vectorized path
        (1, 2048, 6144, 4),     # long-context: K == _TK_CHUNK boundary
        (1, 4096, 1536, 4),     # chunked two-pass path (K > _TK_CHUNK)
        (1, 3000, 512, 4),      # chunked path with K padding
    ],
)
def test_setconv_lowers_for_tpu(B, K, Q, C, monkeypatch):
    monkeypatch.setattr(sk, "_INTERPRET_OVERRIDE", False)
    exported = _export_for_tpu(B, K, Q, C)
    assert "tpu" in exported.platforms


def test_setconv_train_step_lowers_for_tpu(monkeypatch):
    """The full fwd+bwd (custom_vjp chunked backward) must lower too."""
    from jax import export

    monkeypatch.setattr(sk, "_INTERPRET_OVERRIDE", False)

    def loss(keys, queries, values, mask, sigma):
        out = sk.setconv_exprbf_pallas(keys, queries, values, mask, sigma)
        return jnp.sum(out**2)

    fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 4)))
    args = (
        jax.ShapeDtypeStruct((2, 2048 + 1024, 1), jnp.float32),
        jax.ShapeDtypeStruct((2, 1536, 1), jnp.float32),
        jax.ShapeDtypeStruct((2, 2048 + 1024, 8), jnp.float32),
        jax.ShapeDtypeStruct((2, 2048 + 1024), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
    )
    exported = export.export(fn, platforms=["tpu"])(*args)
    assert "tpu" in exported.platforms


def test_chunked_path_matches_xla_reference():
    """Numerics of the K>_TK_CHUNK two-pass path vs the plain XLA tile
    (interpret mode; complements tests/test_pallas_setconv.py which covers
    the small-K path)."""
    rng = np.random.default_rng(0)
    B, K, Q, C = 1, sk._TK_CHUNK + 300, 256, 3
    keys = jnp.asarray(rng.uniform(-1, 1, (B, K, 1)), jnp.float32)
    queries = jnp.asarray(rng.uniform(-1.5, 1.5, (B, Q, 1)), jnp.float32)
    values = jnp.asarray(rng.normal(size=(B, K, C)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, K)) < 0.7, jnp.float32)
    sigma = jnp.float32(0.1)

    got = sk.setconv_exprbf_pallas(keys, queries, values, mask, sigma)
    sig, den = sk._xla_tile(
        keys[..., 0], values, mask, sigma, 2, queries[..., 0]
    )
    want = jnp.concatenate([sig, den[..., None]], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

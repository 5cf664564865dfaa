"""Unit tests for distributions, masked reductions, and losses against
scipy/naive references (SURVEY.md §4 'test strategy' item 1)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from npf_gwwaveform_tpu.distributions import NormalDiag, kl_normal_diag
from npf_gwwaveform_tpu.losses import (
    NPFOutput,
    cnpf_loss,
    elbo_loss,
    npml_loss,
    sum_log_prob_masked,
)
from npf_gwwaveform_tpu.utils.helpers import (
    logcumsumexp,
    masked_mean,
    masked_softmax,
    rescale_range,
)


def test_normal_logprob_vs_scipy(rng):
    loc = rng.normal(size=(3, 5, 2)).astype(np.float32)
    scale = rng.uniform(0.1, 2.0, size=(3, 5, 2)).astype(np.float32)
    x = rng.normal(size=(3, 5, 2)).astype(np.float32)
    ours = np.asarray(NormalDiag(jnp.array(loc), jnp.array(scale)).log_prob(jnp.array(x)))
    ref = scipy.stats.norm.logpdf(x, loc, scale).sum(-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_kl_vs_scipy_mc(rng):
    q = NormalDiag(jnp.array([[0.5, -0.2]]), jnp.array([[0.8, 1.3]]))
    p = NormalDiag(jnp.array([[0.0, 0.1]]), jnp.array([[1.0, 0.9]]))
    ours = float(kl_normal_diag(q, p)[0])
    # analytic KL of independent gaussians
    ref = 0.0
    for i in range(2):
        m1, s1 = float(q.loc[0, i]), float(q.scale[0, i])
        m2, s2 = float(p.loc[0, i]), float(p.scale[0, i])
        ref += math.log(s2 / s1) + (s1**2 + (m1 - m2) ** 2) / (2 * s2**2) - 0.5
    assert abs(ours - ref) < 1e-5


def test_rsample_reparameterized(key):
    d = NormalDiag(jnp.zeros((4, 2)), jnp.ones((4, 2)) * 2.0)
    z = d.sample(key, (1000,))
    assert z.shape == (1000, 4, 2)
    assert abs(float(z.std()) - 2.0) < 0.1


def test_masked_mean_matches_loop(rng):
    t = jnp.array(rng.normal(size=(2, 6, 3)).astype(np.float32))
    mask = jnp.array([[1, 1, 0, 1, 0, 0], [0, 0, 0, 0, 0, 0]], dtype=bool)
    out = np.asarray(masked_mean(t, mask))
    ref0 = np.asarray(t[0][np.array([0, 1, 3])]).mean(0)
    np.testing.assert_allclose(out[0], ref0, rtol=1e-5)
    np.testing.assert_allclose(out[1], 0.0)  # empty -> zero rep


def test_masked_softmax(rng):
    logits = jnp.array(rng.normal(size=(2, 3, 4)).astype(np.float32))
    mask = jnp.array([[True, True, False, True]] * 3)[None].repeat(2, 0)
    att = np.asarray(masked_softmax(logits, mask, axis=-1))
    np.testing.assert_allclose(att.sum(-1), 1.0, rtol=1e-5)
    assert (att[..., 2] == 0).all()
    # fully masked row -> zeros, not NaN
    att2 = np.asarray(masked_softmax(logits, jnp.zeros_like(mask), axis=-1))
    assert np.isfinite(att2).all() and (att2 == 0).all()


def test_logcumsumexp_vs_naive(rng):
    x = jnp.array(rng.normal(size=(7, 3)).astype(np.float32)) * 3
    ours = np.asarray(logcumsumexp(x, axis=0))
    ref = np.logaddexp.accumulate(np.asarray(x), axis=0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_rescale_range():
    x = jnp.array([-2.0, 0.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(rescale_range(x, (-2, 2), (-1, 1))), [-1, 0, 1]
    )


# ------------------------------------------------------------------ losses


def _fake_output(rng, n_z=4, b=3, nt=5, yd=2, latent=True, q_ct=False):
    loc = jnp.array(rng.normal(size=(n_z, b, nt, yd)).astype(np.float32))
    scale = jnp.array(rng.uniform(0.5, 1.5, size=(n_z, b, nt, yd)).astype(np.float32))
    p = NormalDiag(loc, scale)
    if latent:
        zl = jnp.array(rng.normal(size=(b, 1, 8)).astype(np.float32))
        zs = jnp.array(rng.uniform(0.5, 1.0, size=(b, 1, 8)).astype(np.float32))
        q_zCc = NormalDiag(zl, zs)
        z = q_zCc.sample(jax.random.PRNGKey(0), (n_z,))
        q_zCct = (
            NormalDiag(zl + 0.1, zs * 1.1) if q_ct else None
        )
        return NPFOutput(p, z, q_zCc, q_zCct)
    return NPFOutput(p, None, None, None)


def test_cnpf_loss_is_nll(rng):
    out = _fake_output(rng, n_z=1, latent=False)
    y = jnp.array(rng.normal(size=(3, 5, 2)).astype(np.float32))
    loss = np.asarray(cnpf_loss(out, y))
    ref = -np.asarray(out.p_yCc.log_prob(y))[0].sum(-1)
    np.testing.assert_allclose(loss, ref, rtol=1e-5)


def test_npml_equals_cnpf_for_single_sample(rng):
    """With n_z=1 and no importance weights NPML reduces to plain NLL."""
    out = _fake_output(rng, n_z=1, latent=True)
    y = jnp.array(rng.normal(size=(3, 5, 2)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(npml_loss(out, y)),
        np.asarray(-sum_log_prob_masked(out.p_yCc, y, None)[0]),
        rtol=1e-5,
    )


def test_npml_logsumexp(rng):
    out = _fake_output(rng, n_z=4)
    y = jnp.array(rng.normal(size=(3, 5, 2)).astype(np.float32))
    slp = np.asarray(sum_log_prob_masked(out.p_yCc, y, None))
    ref = -(scipy.special.logsumexp(slp, axis=0) - math.log(4))
    np.testing.assert_allclose(np.asarray(npml_loss(out, y)), ref, rtol=1e-5)


def test_elbo_needs_qzcct(rng):
    out = _fake_output(rng, q_ct=True)
    y = jnp.array(rng.normal(size=(3, 5, 2)).astype(np.float32))
    loss = np.asarray(elbo_loss(out, y))
    assert loss.shape == (3,) and np.isfinite(loss).all()


def test_masked_loss_ignores_padding(rng):
    out = _fake_output(rng, n_z=1, latent=False)
    y = jnp.array(rng.normal(size=(3, 5, 2)).astype(np.float32))
    mask = jnp.array([[1, 1, 1, 0, 0]] * 3, dtype=bool)
    # corrupt padded targets wildly; loss must not change
    y_bad = y.at[:, 3:].set(99.0)
    np.testing.assert_allclose(
        np.asarray(cnpf_loss(out, y, mask)),
        np.asarray(cnpf_loss(out, y_bad, mask)),
        rtol=1e-6,
    )


import scipy.special  # noqa: E402


def test_realized_init_matches_torch_defaults():
    """The 'realized' init scheme must reproduce the reference's ACTUAL
    init (torch defaults everywhere except MLP out layers — the reference's
    get_activation_name/weights_init bugs make its documented activation-gain
    init dead code; see utils/init.py docstring). Golden stds measured from
    torch: hidden Linear(128->128) ~0.051 (U(+-1/sqrt(128))), MLP out
    ~0.125 (kaiming-relu), Linear(1->128) ~0.577."""
    import jax
    import jax.numpy as jnp

    from npf_gwwaveform_tpu.configs import gp_model_1d
    from npf_gwwaveform_tpu.utils import init as winit

    def stds(realized):
        winit.set_realized_init(realized)
        try:
            m = gp_model_1d("AttnCNP")
            v = m.init(
                {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)},
                jnp.zeros((2, 5, 1)), jnp.zeros((2, 5, 1)), jnp.zeros((2, 7, 1)),
                mask_cntxt=jnp.ones((2, 5)), mask_trgt=jnp.ones((2, 7)),
                train=False,
            )["params"]
        finally:
            winit.set_realized_init(False)
        return (
            float(jnp.std(v["xy_encoder"]["MLP_0"]["to_hidden"]["kernel"])),
            float(jnp.std(v["xy_encoder"]["MLP_0"]["out"]["kernel"])),
            float(jnp.std(v["x_encoder"]["to_hidden"]["kernel"])),
        )

    hid, out, xenc = stds(realized=True)
    assert abs(hid - 0.051) < 0.006, hid     # torch default U(+-1/sqrt(128))
    assert abs(out - 0.125) < 0.012, out     # kaiming-relu U(+-sqrt(6/128))
    assert abs(xenc - 0.577) < 0.06, xenc    # torch default U(+-1), fan_in=1

    hid_i, out_i, xenc_i = stds(realized=False)
    assert abs(hid_i - 0.125) < 0.012, hid_i  # intended kaiming-relu
    assert abs(out_i - 0.088) < 0.01, out_i   # intended xavier
    assert abs(xenc_i - 1.414) < 0.15, xenc_i  # intended kaiming-relu fan_in=1

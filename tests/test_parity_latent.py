"""Golden-parity for the latent families and the transformer attender:
q(z|C) distributions must match exactly; predictive distributions must match
when both frameworks decode the SAME injected z samples."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

npf_torch = pytest.importorskip("npf")

from functools import partial

from npf.architectures import MLP as TMLP, merge_flat_input as tmerge

from npf_gwwaveform_tpu import AttnCNP, LNP
from npf_gwwaveform_tpu.configs import _xy_encoder
from npf_gwwaveform_tpu.utils.port_latent import (
    port_attncnp_transformer,
    port_lnp,
)

B, NC, NT, R = 2, 7, 11, 32
ATOL = 3e-4


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x_c = rng.uniform(-1, 1, (B, NC, 1)).astype(np.float32)
    y_c = rng.normal(size=(B, NC, 1)).astype(np.float32)
    x_t = rng.uniform(-1, 1, (B, NT, 1)).astype(np.float32)
    y_t = rng.normal(size=(B, NT, 1)).astype(np.float32)
    return x_c, y_c, x_t, y_t


def test_attncnp_transformer_parity():
    torch.manual_seed(3)
    tm = npf_torch.AttnCNP(
        x_dim=1, y_dim=1, r_dim=R, attention="transformer",
        XYEncoder=tmerge(partial(TMLP, n_hidden_layers=2, hidden_size=R), is_sum_merge=True),
    )
    tm.eval()
    params = port_attncnp_transformer(tm)
    model = AttnCNP(
        y_dim=1, x_dim=1, r_dim=R, attention="transformer",
        XYEncoder=lambda n_out: _xy_encoder(R)(n_out, name="xy_encoder"),
    )

    x_c, y_c, x_t, _ = _inputs(3)
    with torch.no_grad():
        p, *_ = tm(torch.from_numpy(x_c), torch.from_numpy(y_c), torch.from_numpy(x_t))
    t_loc = p.base_dist.loc.numpy()

    out = model.apply(
        {"params": params}, jnp.asarray(x_c), jnp.asarray(y_c), jnp.asarray(x_t),
        train=False, rngs={"latent": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(np.asarray(out.p_yCc.loc)[0], t_loc[0], atol=ATOL, rtol=1e-3)


def test_lnp_latent_distribution_parity():
    """q(z|C) must match the torch reference exactly (loc and scale)."""
    torch.manual_seed(4)
    tm = npf_torch.LNP(
        x_dim=1, y_dim=1, r_dim=R, is_q_zCct=False,
        n_z_samples_train=1, n_z_samples_test=1,
        XYEncoder=tmerge(partial(TMLP, n_hidden_layers=2, hidden_size=2 * R), is_sum_merge=True),
    )
    tm.eval()
    params = port_lnp(tm)
    from npf_gwwaveform_tpu.configs import _xy_encoder

    model = LNP(
        y_dim=1, x_dim=1, r_dim=R, n_z_samples_train=1, n_z_samples_test=1,
        XYEncoder=lambda n_out: _xy_encoder(2 * R)(n_out, name="xy_encoder"),
    )

    x_c, y_c, x_t, y_t = _inputs(4)
    with torch.no_grad():
        _, _, q_zCc_t, _ = tm(
            torch.from_numpy(x_c), torch.from_numpy(y_c), torch.from_numpy(x_t)
        )
    out = model.apply(
        {"params": params}, jnp.asarray(x_c), jnp.asarray(y_c), jnp.asarray(x_t),
        train=False, rngs={"latent": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(out.q_zCc.loc), q_zCc_t.base_dist.loc.numpy(), atol=ATOL, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.q_zCc.scale), q_zCc_t.base_dist.scale.numpy(), atol=ATOL, rtol=1e-4
    )


def test_lnp_decode_same_z_parity():
    """Decoding the SAME z samples must give identical predictives."""
    torch.manual_seed(5)
    tm = npf_torch.LNP(
        x_dim=1, y_dim=1, r_dim=R,
        XYEncoder=tmerge(partial(TMLP, n_hidden_layers=2, hidden_size=2 * R), is_sum_merge=True),
    )
    tm.eval()
    params = port_lnp(tm)
    from npf_gwwaveform_tpu.configs import _xy_encoder

    model = LNP(
        y_dim=1, x_dim=1, r_dim=R,
        XYEncoder=lambda n_out: _xy_encoder(2 * R)(n_out, name="xy_encoder"),
    )

    x_c, y_c, x_t, _ = _inputs(5)
    rng = np.random.default_rng(9)
    z = rng.normal(size=(3, B, 1, R)).astype(np.float32)  # [n_z, B, 1, z_dim]

    # torch: replicate internals (x-encode, trgt rep from z, decode)
    with torch.no_grad():
        xc_e = tm.x_encoder(torch.from_numpy(x_c))
        xt_e = tm.x_encoder(torch.from_numpy(x_t))
        R_t = tm.encode_globally(xc_e, torch.from_numpy(y_c))
        R_trgt = tm.trgt_dependent_representation(xc_e, torch.from_numpy(z), None, xt_e)
        p = tm.decode(xt_e, R_trgt)
    t_loc = p.base_dist.loc.numpy()
    t_scale = p.base_dist.scale.numpy()

    # jax: same path through apply(method=...)
    def decode_with_z(m, x_c_, y_c_, x_t_, z_):
        xc_e = m.x_encoder(x_c_)
        xt_e = m.x_encoder(x_t_)
        mask = jnp.ones(x_c_.shape[:2], bool)
        R_ = m.encode_globally(xc_e, y_c_, mask)
        R_trgt = m.trgt_dependent_representation(xc_e, z_, None, xt_e, mask)
        return m.decode(xt_e, R_trgt, jnp.ones(x_t_.shape[:2], bool))

    p_j = model.apply(
        {"params": params},
        jnp.asarray(x_c), jnp.asarray(y_c), jnp.asarray(x_t), jnp.asarray(z),
        method=decode_with_z,
    )
    np.testing.assert_allclose(np.asarray(p_j.loc), t_loc, atol=ATOL, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(p_j.scale), t_scale, atol=ATOL, rtol=1e-3)

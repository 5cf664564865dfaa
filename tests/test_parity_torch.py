"""Golden-value parity vs the PyTorch reference: port torch weights into the
flax models and require the predictive distributions to match to numerical
tolerance on identical inputs (the BASELINE.json parity requirement).

The reference package is imported from /root/reference (torch-cpu only, no
skorch needed for model forward passes).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

npf_torch = pytest.importorskip("npf")

from npf_gwwaveform_tpu import AttnCNP, CNP, ConvCNP
from npf_gwwaveform_tpu.utils.port import port_attncnp, port_cnp, port_convcnp

B, NC, NT, R = 3, 9, 14, 32
ATOL = 2e-4


def _inputs(seed=0, nc=NC):
    rng = np.random.default_rng(seed)
    x_c = rng.uniform(-1, 1, (B, nc, 1)).astype(np.float32)
    y_c = rng.normal(size=(B, nc, 1)).astype(np.float32)
    x_t = rng.uniform(-1, 1, (B, NT, 1)).astype(np.float32)
    return x_c, y_c, x_t


def _torch_forward(tm, x_c, y_c, x_t):
    tm.eval()
    with torch.no_grad():
        p, *_ = tm(
            torch.from_numpy(x_c), torch.from_numpy(y_c), torch.from_numpy(x_t)
        )
    return p.base_dist.loc.numpy(), p.base_dist.scale.numpy()


def _jax_forward(model, params, x_c, y_c, x_t, mask_cntxt=None):
    out = model.apply(
        {"params": params},
        jnp.asarray(x_c),
        jnp.asarray(y_c),
        jnp.asarray(x_t),
        mask_cntxt=mask_cntxt,
        train=False,
        rngs={"latent": jax.random.PRNGKey(0)},
    )
    return np.asarray(out.p_yCc.loc), np.asarray(out.p_yCc.scale)


def test_cnp_parity():
    torch.manual_seed(0)
    tm = npf_torch.CNP(x_dim=1, y_dim=1, r_dim=R)
    params = port_cnp(tm)
    model = CNP(y_dim=1, x_dim=1, r_dim=R)

    x_c, y_c, x_t = _inputs()
    t_loc, t_scale = _torch_forward(tm, x_c, y_c, x_t)
    j_loc, j_scale = _jax_forward(model, params, x_c, y_c, x_t)

    np.testing.assert_allclose(j_loc[0], t_loc[0], atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(j_scale[0], t_scale[0], atol=ATOL, rtol=1e-4)


def test_cnp_parity_masked_equals_torch_ragged():
    """Padded+masked context in JAX == gathered subset in torch: the mask
    machinery must reproduce ragged semantics exactly."""
    torch.manual_seed(0)
    tm = npf_torch.CNP(x_dim=1, y_dim=1, r_dim=R)
    params = port_cnp(tm)
    model = CNP(y_dim=1, x_dim=1, r_dim=R)

    x_c, y_c, x_t = _inputs()
    n_real = 5
    # torch sees only the first n_real context points
    t_loc, t_scale = _torch_forward(tm, x_c[:, :n_real], y_c[:, :n_real], x_t)
    # jax sees all NC with a mask selecting the first n_real
    mask = jnp.arange(NC)[None, :] < n_real
    mask = jnp.broadcast_to(mask, (B, NC))
    j_loc, j_scale = _jax_forward(model, params, x_c, y_c, x_t, mask_cntxt=mask)

    np.testing.assert_allclose(j_loc[0], t_loc[0], atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(j_scale[0], t_scale[0], atol=ATOL, rtol=1e-4)


def test_attncnp_parity():
    torch.manual_seed(1)
    tm = npf_torch.AttnCNP(x_dim=1, y_dim=1, r_dim=R, attention="scaledot")
    params = port_attncnp(tm)
    model = AttnCNP(y_dim=1, x_dim=1, r_dim=R, attention="scaledot")

    x_c, y_c, x_t = _inputs(seed=1)
    t_loc, t_scale = _torch_forward(tm, x_c, y_c, x_t)
    j_loc, j_scale = _jax_forward(model, params, x_c, y_c, x_t)

    np.testing.assert_allclose(j_loc[0], t_loc[0], atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(j_scale[0], t_scale[0], atol=ATOL, rtol=1e-4)


def test_attncnp_transformer_parity():
    """The notebook benchmark config's attender (attention='transformer',
    reference attention.py:530-588): ported weights must reproduce the torch
    forward exactly — covers multihead projections + head split/merge +
    residual/LayerNorm/MLP, which the scaledot test above does not."""
    from npf_gwwaveform_tpu.utils.port import port_attncnp_transformer

    torch.manual_seed(3)
    tm = npf_torch.AttnCNP(x_dim=1, y_dim=1, r_dim=R, attention="transformer")
    params = port_attncnp_transformer(tm)
    model = AttnCNP(y_dim=1, x_dim=1, r_dim=R, attention="transformer")

    x_c, y_c, x_t = _inputs(seed=3)
    t_loc, t_scale = _torch_forward(tm, x_c, y_c, x_t)
    j_loc, j_scale = _jax_forward(model, params, x_c, y_c, x_t)

    np.testing.assert_allclose(j_loc[0], t_loc[0], atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(j_scale[0], t_scale[0], atol=ATOL, rtol=1e-4)


def test_convcnp_parity():
    import torch.nn as nn
    from functools import partial
    from npf.architectures import CNN as TorchCNN, ResConvBlock as TorchRes

    torch.manual_seed(2)
    density = 8
    tm = npf_torch.ConvCNP(
        x_dim=1,
        y_dim=1,
        r_dim=R,
        density_induced=density,
        CNN=partial(
            TorchCNN,
            ConvBlock=TorchRes,
            Conv=nn.Conv1d,
            n_blocks=2,
            Normalization=nn.Identity,
            is_chan_last=True,
            kernel_size=5,
        ),
    )
    params = port_convcnp(tm)
    model = ConvCNP(
        y_dim=1, x_dim=1, r_dim=R, density_induced=density, cnn_n_blocks=2,
        cnn_kernel_size=5,
    )

    x_c, y_c, x_t = _inputs(seed=2)
    t_loc, t_scale = _torch_forward(tm, x_c, y_c, x_t)
    j_loc, j_scale = _jax_forward(model, params, x_c, y_c, x_t)

    np.testing.assert_allclose(j_loc[0], t_loc[0], atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(j_scale[0], t_scale[0], atol=5e-4, rtol=1e-3)


def test_res_normalized_conv_block_parity():
    """ResNormalizedConvBlock vs reference cnn.py:218-304: ported weights,
    identical [signal, confidence] outputs (channel-last here)."""
    import torch.nn as nn_t

    from npf.architectures import ResNormalizedConvBlock as TorchRNCB

    from npf_gwwaveform_tpu.ops.cnn import ResNormalizedConvBlock
    from npf_gwwaveform_tpu.utils.port import port_res_normalized_conv_block

    C, OUT, L, K = 4, 6, 16, 5
    torch.manual_seed(3)
    tb = TorchRNCB(C, OUT, nn_t.Conv1d, kernel_size=K, n_conv_layers=2)
    tb.eval()

    rng = np.random.default_rng(3)
    sig = rng.normal(size=(B, C, L)).astype(np.float32)
    conf = rng.uniform(0, 1, (B, C, L)).astype(np.float32)
    x_t = np.concatenate([sig, conf], axis=1)  # [B, 2C, L]

    with torch.no_grad():
        out_t = tb(torch.from_numpy(x_t)).numpy()  # [B, 2*OUT, L]

    model = ResNormalizedConvBlock(OUT, kernel_size=K)
    params = port_res_normalized_conv_block(tb)
    x_j = jnp.asarray(np.moveaxis(x_t, 1, -1))  # [B, L, 2C]
    out_j = model.apply({"params": params}, x_j, train=False)
    out_j = np.moveaxis(np.asarray(out_j), -1, 1)

    np.testing.assert_allclose(out_j, out_t, atol=1e-4, rtol=1e-3)


def test_res_conv_block_batchnorm_parity():
    """ResConvBlock with BatchNorm + n_conv_layers=2 (the notebook benchmark
    CNN config): ported weights AND running stats must reproduce the torch
    eval-mode forward — this is the path the pretrained Conv* checkpoints
    run through (port_res_conv_block_bn / port_convcnp_pretrained)."""
    from npf.architectures import ResConvBlock as TorchRes

    from npf_gwwaveform_tpu.ops.cnn import ResConvBlock
    from npf_gwwaveform_tpu.utils.port import port_res_conv_block_bn

    torch.manual_seed(7)
    tb = TorchRes(R, R, Conv=torch.nn.Conv1d, kernel_size=19,
                  Normalization=torch.nn.BatchNorm1d, n_conv_layers=2)
    tb.eval()
    with torch.no_grad():
        tb.norm1.running_mean.uniform_(-0.5, 0.5)
        tb.norm1.running_var.uniform_(0.5, 2.0)
        tb.norm2.running_mean.uniform_(-0.5, 0.5)
        tb.norm2.running_var.uniform_(0.5, 2.0)

    p, s = port_res_conv_block_bn(tb)
    jb = ResConvBlock(out_chan=R, kernel_size=19, n_conv_layers=2, norm="batch")
    x = np.random.default_rng(0).normal(size=(2, 50, R)).astype(np.float32)
    with torch.no_grad():
        t_out = tb(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    j_out = jb.apply({"params": p, "batch_stats": s}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-3, rtol=1e-3)


def test_attncnp_selfattn_image_parity():
    """The reference's IMAGE Attn* config (AttnCNP.ipynb model_2d:
    is_self_attn=True — 2-layer transformer self-attention xy-encoder with
    sum-merge resizer + resize linear). port_attncnp_selfattn must
    reproduce the torch forward exactly — the port behind the celeba32
    ported bars (eval_pretrained_rgb.py)."""
    from npf_gwwaveform_tpu.utils.port import port_attncnp_selfattn

    torch.manual_seed(5)
    tm = npf_torch.AttnCNP(
        x_dim=2, y_dim=3, r_dim=R, attention="transformer", is_self_attn=True
    )
    params = port_attncnp_selfattn(tm)
    model = AttnCNP(
        y_dim=3, x_dim=2, r_dim=R, attention="transformer",
        is_self_attn=True, XYEncoder=None,
    )

    rng = np.random.default_rng(5)
    x_c = rng.uniform(-1, 1, (B, NC, 2)).astype(np.float32)
    y_c = rng.normal(size=(B, NC, 3)).astype(np.float32)
    x_t = rng.uniform(-1, 1, (B, NT, 2)).astype(np.float32)
    t_loc, t_scale = _torch_forward(tm, x_c, y_c, x_t)
    j_loc, j_scale = _jax_forward(model, params, x_c, y_c, x_t)

    np.testing.assert_allclose(j_loc[0], t_loc[0], atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(j_scale[0], t_scale[0], atol=ATOL, rtol=1e-4)

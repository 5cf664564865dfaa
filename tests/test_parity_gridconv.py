"""Golden-parity for GridConvCNP: abs-weight depthwise conv context
embedding + CNN vs the torch reference on identical image batches."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

npf_torch = pytest.importorskip("npf")

from functools import partial

import torch.nn as nn

from npf.architectures import CNN as TCNN, ResConvBlock as TRes

from npf_gwwaveform_tpu import GridConvCNP
from npf_gwwaveform_tpu.utils.port import (
    _t2j,
    port_cnn,
    port_linear,
    port_mlp,
)

R = 16
ATOL = 5e-4


def _port_conv2d(conv):
    out = {"kernel": _t2j(conv.weight).transpose(2, 3, 1, 0)}
    if conv.bias is not None:
        out["bias"] = _t2j(conv.bias)
    return out


def _port_cnn2d(cnn):
    def block(b):
        return {
            "conv2_depthwise": _port_conv2d(b.conv2_depthwise),
            "conv2_pointwise": _port_conv2d(b.conv2_pointwise),
        }

    return {f"block_{i}": block(b) for i, b in enumerate(cnn.conv_blocks)}


def test_gridconvcnp_parity():
    torch.manual_seed(7)
    tm = npf_torch.GridConvCNP(
        x_dim=1, y_dim=1, r_dim=R,
        CNN=partial(
            TCNN, Conv=nn.Conv2d, Normalization=nn.Identity, n_blocks=2,
            kernel_size=5, ConvBlock=TRes, is_chan_last=True,
        ),
    )
    tm.eval()
    params = {
        "conv": {"kernel": _t2j(tm.conv.weight).transpose(2, 3, 1, 0)},
        "resizer": port_linear(tm.resizer),
        "induced_to_induced": _port_cnn2d(tm.induced_to_induced),
        "decoder": {"MLP_0": port_mlp(tm.decoder.destination)},
    }
    model = GridConvCNP(
        y_dim=1, x_dim=1, r_dim=R, cnn_n_blocks=2, cnn_kernel_size=5,
        conv_kernel_size=11,
    )

    rng = np.random.default_rng(7)
    H = W = 12
    mask = (rng.uniform(size=(2, H, W, 1)) > 0.6).astype(np.float32)
    img = rng.uniform(size=(2, H, W, 1)).astype(np.float32)

    with torch.no_grad():
        p, *_ = tm(
            torch.from_numpy(mask), torch.from_numpy(img),
            torch.from_numpy(np.ones_like(mask)),
        )
    t_loc = p.base_dist.loc.numpy()
    t_scale = p.base_dist.scale.numpy()

    out = model.apply(
        {"params": params},
        jnp.asarray(mask), jnp.asarray(img), jnp.asarray(np.ones_like(mask)),
        train=False, rngs={"latent": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(np.asarray(out.p_yCc.loc)[0], t_loc[0], atol=ATOL, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.p_yCc.scale)[0], t_scale[0], atol=ATOL, rtol=1e-3)


def test_gridconvcnp_zsmms_checkpoint_port_parity():
    """Golden parity for the REAL pretrained zsmms checkpoint (circular
    padding + BatchNorm eps 1e-2 + n_conv_layers=2, ConvCNP.ipynb
    model_2d_extrap) through port_gridconvcnp_pretrained — the port behind
    the image ported bar (results/ported_bars.jsonl zsmms row)."""
    import os

    ckpt = "/root/reference/results/pretrained/zsmms/ConvCNP/run_0/params.pt"
    if not os.path.exists(ckpt):
        pytest.skip("reference checkpoint not mounted")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from experiments.eval_pretrained_img import build_torch_gridconvcnp
    from experiments.reproduce_img import build_model
    from npf_gwwaveform_tpu.utils.port import port_gridconvcnp_pretrained

    sd = torch.load(ckpt, map_location="cpu")
    tm = build_torch_gridconvcnp(circular=True)
    tm.load_state_dict(sd)
    tm.eval()
    params, extra_vars = port_gridconvcnp_pretrained(tm)
    model = build_model("GridConvCNP", padding="CIRCULAR", norm_eps=1e-2)

    rng = np.random.default_rng(3)
    H = W = 20
    mask = (rng.uniform(size=(2, H, W, 1)) > 0.7).astype(np.float32)
    img = rng.uniform(size=(2, H, W, 1)).astype(np.float32)
    with torch.no_grad():
        p, *_ = tm(
            torch.from_numpy(mask), torch.from_numpy(img),
            torch.from_numpy(np.ones_like(mask)),
        )
    out = model.apply(
        {"params": params, **extra_vars},
        jnp.asarray(mask), jnp.asarray(img), jnp.asarray(np.ones_like(mask)),
        train=False, rngs={"latent": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(out.p_yCc.loc), p.base_dist.loc.numpy(), atol=ATOL, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.p_yCc.scale), p.base_dist.scale.numpy(), atol=ATOL, rtol=1e-3
    )

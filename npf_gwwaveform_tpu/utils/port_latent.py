"""Torch→JAX weight porting for the latent model families (extends
utils/port.py to LNP / AttnLNP / ConvLNP / GridConv*), enabling golden-parity
tests of the latent paths and loading of the reference's pretrained latent
checkpoints.
"""

from __future__ import annotations

from typing import Dict

from .port import (
    _t2j,
    port_cnn,
    port_cnp,
    port_linear,
    port_merge_flat,
    port_mlp,
    port_setconv,
)

__all__ = [
    "port_lnp",
    "port_attnlnp",
    "port_convlnp",
    "port_convlnp_pretrained",
]


def _port_latent_bits(torch_model) -> Dict:
    out = {"latent_encoder": port_mlp(torch_model.latent_encoder)}
    if hasattr(torch_model, "r_z_merger"):
        out["r_z_merger"] = port_linear(torch_model.r_z_merger)
    if hasattr(torch_model, "reshaper_z"):
        out["reshaper_z"] = port_linear(torch_model.reshaper_z)
    return out


def port_lnp(torch_model) -> Dict:
    d = port_cnp(torch_model)
    d.update(_port_latent_bits(torch_model))
    return d


def _port_multihead(mh) -> Dict:
    """Reference MultiheadAttender (attention.py:375-527)."""
    return {
        "key_transform": port_linear(mh.key_transform),
        "query_transform": port_linear(mh.query_transform),
        "value_transform": port_linear(mh.value_transform),
        **(
            {"post_processor": port_linear(mh.post_processor)}
            if mh.post_processor is not None
            else {}
        ),
    }


def _port_transformer_attender(ta) -> Dict:
    """Reference TransformerAttender (attention.py:530-588). Note: the
    reference class IS a MultiheadAttender (inheritance), so the projection
    layers live directly on it; our flax version nests them under
    'multihead'."""

    def port_ln(ln):
        return {"scale": _t2j(ln.weight), "bias": _t2j(ln.bias)}

    return {
        "multihead": _port_multihead(ta),
        "layer_norm1": port_ln(ta.layer_norm1),
        "layer_norm2": port_ln(ta.layer_norm2),
        "mlp": port_mlp(ta.mlp),
    }


def port_attncnp_transformer(torch_model) -> Dict:
    """AttnCNP with attention='transformer' (the notebook config)."""
    return {
        "x_encoder": port_mlp(torch_model.x_encoder),
        "xy_encoder": port_merge_flat(torch_model.xy_encoder),
        "decoder": port_merge_flat(torch_model.decoder),
        "attender": _port_transformer_attender(torch_model.attender),
    }


def port_attnlnp(torch_model) -> Dict:
    d = port_attncnp_transformer(torch_model)
    d.update(_port_latent_bits(torch_model))
    return d


def port_attnlnp_selfattn(torch_model) -> Dict:
    """Image AttnLNP (AttnLNP.ipynb model_2d: is_self_attn=True), e.g.
    results/pretrained/celeba32/AttnLNP."""
    from .port import port_attncnp_selfattn

    d = port_attncnp_selfattn(torch_model)
    d.update(_port_latent_bits(torch_model))
    return d


def port_gridconvlnp_pretrained(torch_model):
    """Reference image GridConvLNP checkpoint (gridconvnp.py:181-320; e.g.
    results/pretrained/celeba32/ConvLNP) -> (params, extra_vars). Same
    per-channel abs-conv + resizer front end as GridConvCNP, BOTH BatchNorm
    CNNs' running stats, Linear decoder, latent bits."""
    from .port import _port_res_conv_block2d_bn, _t2j, port_conv2d

    def cnn2d_bn(cnn):
        blocks, stats = {}, {}
        for i, b in enumerate(cnn.conv_blocks):
            p, s = _port_res_conv_block2d_bn(b)
            blocks[f"block_{i}"] = p
            stats[f"block_{i}"] = s
        return blocks, stats

    b1, s1 = cnn2d_bn(torch_model.induced_to_induced)
    b2, s2 = cnn2d_bn(torch_model.induced_to_induced_post_sampling)
    abs_conv = getattr(torch_model.conv, "conv", torch_model.conv)
    params = {
        "conv": {"kernel": _t2j(abs_conv.weight).transpose(2, 3, 1, 0)},
        "resizer": port_linear(torch_model.resizer),
        "induced_to_induced": b1,
        "induced_to_induced_post_sampling": b2,
        "decoder": {"Dense_0": port_linear(torch_model.decoder.destination)},
        **_port_latent_bits(torch_model),
    }
    extra = {
        "batch_stats": {
            "induced_to_induced": s1,
            "induced_to_induced_post_sampling": s2,
        }
    }
    return params, extra


def port_convlnp_pretrained(torch_model):
    """Notebook-config ConvLNP (ConvLNP.ipynb: BatchNorm CNNs, 4 blocks each,
    Linear decoder, is_global=True), e.g. the reference's
    results/pretrained/*/ConvLNP checkpoints. Returns (params, extra_vars)
    with the running batch stats of BOTH CNNs — strict-parity eval must run
    train=False."""
    from .port import port_res_conv_block_bn

    def cnn_bn(cnn):
        blocks, stats = {}, {}
        for i, b in enumerate(cnn.conv_blocks):
            p, s = port_res_conv_block_bn(b)
            blocks[f"block_{i}"] = p
            stats[f"block_{i}"] = s
        return blocks, stats

    b1, s1 = cnn_bn(torch_model.induced_to_induced)
    b2, s2 = cnn_bn(torch_model.induced_to_induced_post_sampling)
    params = {
        "cntxt_to_induced": port_setconv(torch_model.cntxt_to_induced),
        "induced_to_induced": b1,
        "induced_to_induced_post_sampling": b2,
        "induced_to_trgt": port_setconv(torch_model.induced_to_trgt),
        "decoder": {"Dense_0": port_linear(torch_model.decoder.destination)},
        **_port_latent_bits(torch_model),
    }
    extra = {
        "batch_stats": {
            "induced_to_induced": s1,
            "induced_to_induced_post_sampling": s2,
        }
    }
    return params, extra


def port_convlnp(torch_model) -> Dict:
    """ConvLNP with the notebook config (Linear decoder via discard)."""
    return {
        "cntxt_to_induced": port_setconv(torch_model.cntxt_to_induced),
        "induced_to_induced": port_cnn(torch_model.induced_to_induced),
        "induced_to_induced_post_sampling": port_cnn(
            torch_model.induced_to_induced_post_sampling
        ),
        "induced_to_trgt": port_setconv(torch_model.induced_to_trgt),
        "decoder": {"Dense_0": port_linear(torch_model.decoder.destination)},
        **_port_latent_bits(torch_model),
    }

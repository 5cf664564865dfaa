"""Torch→JAX weight porting for parity testing and for loading the
reference's pretrained checkpoints (results/**/params.pt).

Maps the reference's torch module trees (npf/neuralproc/*) onto this
package's flax param trees. Layout conventions:
  torch Linear weight [out, in]  -> flax Dense kernel [in, out] (transpose)
  torch Conv1d weight [out, in/groups, k] -> flax Conv kernel [k, in/groups, out]
  torch Conv2d weight [out, in/groups, kh, kw] -> [kh, kw, in/groups, out]

Only used on host (torch stays out of the jit path).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

__all__ = [
    "port_linear",
    "port_mlp",
    "port_merge_flat",
    "port_cnp",
    "port_attncnp",
    "port_convcnp",
]


def _t2j(t) -> jnp.ndarray:
    return jnp.asarray(t.detach().cpu().numpy())


def port_linear(lin) -> Dict:
    out = {"kernel": _t2j(lin.weight).T}
    if lin.bias is not None:
        out["bias"] = _t2j(lin.bias)
    return out


def port_mlp(mlp) -> Dict:
    d = {
        "to_hidden": port_linear(mlp.to_hidden),
        "out": port_linear(mlp.out),
    }
    for i, lin in enumerate(mlp.linears):
        d[f"linear_{i}"] = port_linear(lin)
    return d


def port_merge_flat(mfi, inner_name: str = "MLP_0") -> Dict:
    """Reference MergeFlatInputs (encoders.py:130-183), sum-merge variant."""
    return {
        "resizer": port_mlp(mfi.resizer),
        inner_name: port_mlp(mfi.flat_module),
    }


def port_conv1d(conv) -> Dict:
    out = {"kernel": _t2j(conv.weight).transpose(2, 1, 0)}
    if conv.bias is not None:
        out["bias"] = _t2j(conv.bias)
    return out


def port_setconv(sc) -> Dict:
    """Reference SetConv (setcnn.py:194-268) -> this SetConv."""
    return {
        "rbf": {"length_scale_param": _t2j(sc.radial_basis_func.length_scale_param)},
        "resizer": port_linear(sc.resizer),
    }


def port_res_conv_block(block) -> Dict:
    """Reference ResConvBlock (cnn.py:126-215), n_conv_layers=1."""
    return {
        "conv2_depthwise": port_conv1d(block.conv2_depthwise),
        "conv2_pointwise": port_conv1d(block.conv2_pointwise),
    }


def port_res_normalized_conv_block(block) -> Dict:
    """Reference ResNormalizedConvBlock (cnn.py:218-304) — requires the
    torch block built with n_conv_layers=2 (its forward uses conv1)."""
    import numpy as np

    return {
        "conv1": {
            "depthwise": port_conv1d(block.conv1.depthwise),
            "pointwise": port_conv1d(block.conv1.pointwise),
        },
        "conv2_depthwise": port_conv1d(block.conv2_depthwise),
        "conv2_pointwise": port_conv1d(block.conv2_pointwise),
        "temperature": np.asarray(block.temperature.detach().numpy()),
        "bias": np.asarray(block.bias.detach().numpy()),
    }


def port_cnn(cnn) -> Dict:
    return {
        f"block_{i}": port_res_conv_block(b) for i, b in enumerate(cnn.conv_blocks)
    }


def port_batchnorm(bn):
    """torch BatchNorm1d -> (flax affine params, flax batch_stats)."""
    params = {"scale": _t2j(bn.weight), "bias": _t2j(bn.bias)}
    stats = {"mean": _t2j(bn.running_mean), "var": _t2j(bn.running_var)}
    return params, stats


def port_res_conv_block_bn(block):
    """Reference ResConvBlock with n_conv_layers=2 + BatchNorm (the notebook
    benchmark CNN config, cnn.py:126-215). Returns (params, batch_stats)."""
    p1, s1 = port_batchnorm(block.norm1)
    p2, s2 = port_batchnorm(block.norm2)
    params = {
        "conv1": {
            "depthwise": port_conv1d(block.conv1.depthwise),
            "pointwise": port_conv1d(block.conv1.pointwise),
        },
        "conv2_depthwise": port_conv1d(block.conv2_depthwise),
        "conv2_pointwise": port_conv1d(block.conv2_pointwise),
        "norm1": p1,
        "norm2": p2,
    }
    return params, {"norm1": s1, "norm2": s2}


def port_convcnp_pretrained(torch_model):
    """Full notebook-config ConvCNP (BatchNorm + n_conv_layers=2, e.g. the
    reference's results/pretrained/*/ConvCNP checkpoints). Returns
    (params, extra_vars) where extra_vars carries the running batch stats —
    strict-parity eval must run with train=False (SURVEY §7.3)."""
    blocks, stats = {}, {}
    for i, b in enumerate(torch_model.induced_to_induced.conv_blocks):
        p, s = port_res_conv_block_bn(b)
        blocks[f"block_{i}"] = p
        stats[f"block_{i}"] = s
    params = {
        "cntxt_to_induced": port_setconv(torch_model.cntxt_to_induced),
        "induced_to_induced": blocks,
        "induced_to_trgt": port_setconv(torch_model.induced_to_trgt),
        "decoder": {"MLP_0": port_mlp(torch_model.decoder.destination)},
    }
    return params, {"batch_stats": {"induced_to_induced": stats}}


def port_conv2d(conv) -> Dict:
    out = {"kernel": _t2j(conv.weight).transpose(2, 3, 1, 0)}
    if getattr(conv, "bias", None) is not None:
        out["bias"] = _t2j(conv.bias)
    return out


def _port_res_conv_block2d_bn(block):
    """2-D ResConvBlock, n_conv_layers=2 + BatchNorm2d (the reference's
    image GridConvCNP config, ConvCNP.ipynb model_2d/model_2d_extrap).
    `make_padded_conv`-wrapped convs carry the raw Conv2d at `.conv`."""

    def conv(c):
        return port_conv2d(getattr(c, "conv", c))

    p1, s1 = port_batchnorm(block.norm1)
    p2, s2 = port_batchnorm(block.norm2)
    params = {
        "conv1": {
            "depthwise": conv(block.conv1.depthwise),
            "pointwise": conv(block.conv1.pointwise),
        },
        "conv2_depthwise": conv(block.conv2_depthwise),
        "conv2_pointwise": conv(block.conv2_pointwise),
        "norm1": p1,
        "norm2": p2,
    }
    return params, {"norm1": s1, "norm2": s2}


def port_gridconvcnp_pretrained(torch_model):
    """Reference GridConvCNP image checkpoint (gridconvnp.py:28-178; e.g.
    results/pretrained/{mnist,zsmms}/ConvCNP) -> (params, extra_vars).
    Handles both plain and CircularPad2d-wrapped (zsmms) conv stacks."""
    blocks, stats = {}, {}
    for i, b in enumerate(torch_model.induced_to_induced.conv_blocks):
        p, s = _port_res_conv_block2d_bn(b)
        blocks[f"block_{i}"] = p
        stats[f"block_{i}"] = s
    abs_conv = getattr(torch_model.conv, "conv", torch_model.conv)
    params = {
        "conv": {"kernel": _t2j(abs_conv.weight).transpose(2, 3, 1, 0)},
        "resizer": port_linear(torch_model.resizer),
        "induced_to_induced": blocks,
        "decoder": {"MLP_0": port_mlp(torch_model.decoder.destination)},
    }
    return params, {"batch_stats": {"induced_to_induced": stats}}


def port_cnp(torch_model) -> Dict:
    return {
        "x_encoder": port_mlp(torch_model.x_encoder),
        "xy_encoder": port_merge_flat(torch_model.xy_encoder),
        "decoder": port_merge_flat(torch_model.decoder),
    }


def port_attncnp(torch_model) -> Dict:
    """AttnCNP with the default scaledot attender (no attender params)."""
    return port_cnp(torch_model)


def port_layer_norm(ln) -> Dict:
    return {"scale": _t2j(ln.weight), "bias": _t2j(ln.bias)}


def port_multihead_attender(att) -> Dict:
    """Reference MultiheadAttender (attention.py:375-527): 3 projection
    linears + optional post-processor."""
    d = {
        "key_transform": port_linear(att.key_transform),
        "query_transform": port_linear(att.query_transform),
        "value_transform": port_linear(att.value_transform),
    }
    if att.post_processor is not None:
        d["post_processor"] = port_linear(att.post_processor)
    return d


def port_transformer_attender(att) -> Dict:
    """Reference TransformerAttender (attention.py:530-588): multihead (no
    post-process) + 2 LayerNorms + MLP."""
    return {
        "multihead": port_multihead_attender(att),
        "layer_norm1": port_layer_norm(att.layer_norm1),
        "layer_norm2": port_layer_norm(att.layer_norm2),
        "mlp": port_mlp(att.mlp),
    }


def port_attncnp_transformer(torch_model) -> Dict:
    """AttnCNP with the notebook benchmark config's transformer attender."""
    d = port_cnp(torch_model)
    d["attender"] = port_transformer_attender(torch_model.attender)
    return d


def port_selfattn(sa) -> Dict:
    """Reference SelfAttention (selfattn.py:10-103): n stacked
    TransformerAttenders + optional resize linear (out_dim given)."""
    d = {f"attn_{i}": port_transformer_attender(a) for i, a in enumerate(sa.attn_layers)}
    if getattr(sa, "is_resize", False):
        d["resize"] = port_linear(sa.resize)
    return d


def port_merge_selfattn(mfi) -> Dict:
    """MergeFlatInputs whose flat_module is a SelfAttention — the
    reference's IMAGE Attn* xy_encoder (neuralproc/attnnp.py:88-91,
    is_self_attn=True): sum-merge resizer MLP + 2-layer self-attention."""
    return {
        "resizer": port_mlp(mfi.resizer),
        "SelfAttention_0": port_selfattn(mfi.flat_module),
    }


def port_attncnp_selfattn(torch_model) -> Dict:
    """Image AttnCNP (AttnCNP.ipynb model_2d: is_self_attn=True,
    attention='transformer'), e.g. results/pretrained/celeba32/AttnCNP."""
    return {
        "x_encoder": port_mlp(torch_model.x_encoder),
        "xy_encoder": port_merge_selfattn(torch_model.xy_encoder),
        "decoder": port_merge_flat(torch_model.decoder),
        "attender": port_transformer_attender(torch_model.attender),
    }


def port_convcnp(torch_model) -> Dict:
    return {
        "cntxt_to_induced": port_setconv(torch_model.cntxt_to_induced),
        "induced_to_induced": port_cnn(torch_model.induced_to_induced),
        "induced_to_trgt": port_setconv(torch_model.induced_to_trgt),
        "decoder": {"MLP_0": port_mlp(torch_model.decoder.destination)},
    }

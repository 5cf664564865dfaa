"""Attention zoo with masked padded-set semantics.

Parity targets: /root/reference/npf/architectures/attention.py — factory
`get_attender` (:16-86), `DotAttender` (:172-220), `MultiplicativeAttender`
(:223-258), `AdditiveAttender` (:261-302), `CosineAttender` (:305-322),
`DistanceAttender` (:325-372), `MultiheadAttender` (:375-527),
`TransformerAttender` (:530-588).

TPU-first differences from the reference:
* every attender takes `mask_keys [B, n_keys]`; masked-out keys get zero
  attention weight (masked softmax), so fully-padded context sets yield the
  zero representation the reference special-cases (attnnp.py:121-125);
* the softmax/weighted-sum path is a single fused XLA dot-general chain
  running on the MXU (no bmm/permute round trips).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils import init as winit
from ..utils.helpers import masked_softmax
from .mlp import MLP


def _apply_attn(
    logits: jax.Array,
    values: jax.Array,
    mask_keys: Optional[jax.Array],
    is_normalize: bool = True,
) -> jax.Array:
    """logits [B,Q,K] x values [B,K,V] -> [B,Q,V] with key masking."""
    if mask_keys is None:
        mask_keys = jnp.ones(logits.shape[:1] + logits.shape[2:3], dtype=bool)
    mask = mask_keys[:, None, :].astype(bool)
    if is_normalize:
        attn = masked_softmax(logits.astype(jnp.float32), mask, axis=-1)
    else:
        attn = jnp.where(mask, logits, 0.0)
    return jnp.einsum("bqk,bkv->bqv", attn.astype(values.dtype), values)


def _maybe_resize(context, value_size, out_size, dtype=None):
    if value_size != out_size:
        context = nn.Dense(
            out_size, kernel_init=winit.switchable(winit.xavier_uniform), dtype=dtype, name="resizer"
        )(context)
    return context


class DotAttender(nn.Module):
    """(Scaled) dot-product attention (reference attention.py:172-220).

    Supports 4-D keys [B,Q,K,D] (one key set per query) used by relative
    positional encodings."""

    out_size: int
    is_scale: bool = True
    is_normalize: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, keys, queries, values, mask_keys=None):
        if keys.ndim == 4:
            logits = jnp.einsum("bqkd,bqd->bqk", keys, queries)
        else:
            logits = jnp.einsum("bkd,bqd->bqk", keys, queries)
        if self.is_scale:
            logits = logits / math.sqrt(queries.shape[-1])
        ctx = _apply_attn(logits, values, mask_keys, self.is_normalize)
        return _maybe_resize(ctx, values.shape[-1], self.out_size, self.dtype)


class MultiplicativeAttender(nn.Module):
    """Luong multiplicative attention (reference attention.py:223-258)."""

    out_size: int
    is_normalize: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, keys, queries, values, mask_keys=None):
        q = nn.Dense(
            queries.shape[-1],
            use_bias=False,
            kernel_init=winit.switchable(winit.kaiming_uniform_relu),
            dtype=self.dtype,
            name="linear",
        )(queries)
        logits = jnp.einsum("bkd,bqd->bqk", keys, q)
        ctx = _apply_attn(logits, values, mask_keys, self.is_normalize)
        return _maybe_resize(ctx, values.shape[-1], self.out_size, self.dtype)


class AdditiveAttender(nn.Module):
    """Bahdanau additive attention (reference attention.py:261-302)."""

    out_size: int
    is_normalize: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, keys, queries, values, mask_keys=None):
        B, Q, D = queries.shape
        K = keys.shape[1]
        k = jnp.broadcast_to(keys[:, None, :, :], (B, Q, K, D))
        q = jnp.broadcast_to(queries[:, :, None, :], (B, Q, K, D))
        logits = MLP(1, hidden_size=D, activation=nn.tanh, name="mlp")(
            jnp.concatenate([k, q], axis=-1)
        )[..., 0]
        ctx = _apply_attn(logits, values, mask_keys, self.is_normalize)
        return _maybe_resize(ctx, values.shape[-1], self.out_size, self.dtype)


class CosineAttender(nn.Module):
    """Cosine-similarity attention (reference attention.py:305-322)."""

    out_size: int
    is_normalize: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, keys, queries, values, mask_keys=None):
        k = keys / jnp.maximum(jnp.linalg.norm(keys, axis=-1, keepdims=True), 1e-8)
        q = queries / jnp.maximum(
            jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-8
        )
        logits = jnp.einsum("bkd,bqd->bqk", k, q)
        ctx = _apply_attn(logits, values, mask_keys, self.is_normalize)
        return _maybe_resize(ctx, values.shape[-1], self.out_size, self.dtype)


class DistanceAttender(nn.Module):
    """Negative (weighted) p-distance attention (reference attention.py:325-372)."""

    out_size: int
    p: float = 1.0
    is_weight: bool = False
    is_normalize: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, keys, queries, values, mask_keys=None):
        diff = keys[:, None, :, :] - queries[:, :, None, :]
        if self.is_weight:
            diff = nn.Dense(
                keys.shape[-1],
                kernel_init=winit.switchable(winit.kaiming_uniform_relu),
                dtype=self.dtype,
                name="weighter",
            )(diff)
        if self.p == 1:
            norm = jnp.sum(jnp.abs(diff), axis=-1)
        elif self.p == 2:
            norm = jnp.sqrt(jnp.sum(jnp.square(diff), axis=-1) + 1e-12)
        else:
            norm = jnp.sum(jnp.abs(diff) ** self.p, axis=-1) ** (1.0 / self.p)
        logits = -(norm**2)
        ctx = _apply_attn(logits, values, mask_keys, self.is_normalize)
        return _maybe_resize(ctx, values.shape[-1], self.out_size, self.dtype)


class MultiheadAttender(nn.Module):
    """Multi-head scaled-dot attention (reference attention.py:375-527).

    Head split/merge is expressed as reshapes around a 4-D einsum so XLA keeps
    the whole thing on the MXU; the reference's permute/contiguous dance
    (attention.py:507-527) is unnecessary.
    """

    kq_size: int
    value_size: int
    out_size: int
    n_heads: int = 8
    is_post_process: bool = True
    is_relative_pos: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, keys, queries, values, mask_keys=None, rel_pos_enc=None):
        assert self.kq_size % self.n_heads == 0
        assert self.value_size % self.n_heads == 0
        kq_head = self.kq_size // self.n_heads
        v_head = self.value_size // self.n_heads

        # per-head-corrected init (reference attention.py:449-455)
        kq_std = math.sqrt(2.0 / (self.kq_size + kq_head))
        v_std = math.sqrt(2.0 / (self.value_size + v_head))

        k = nn.Dense(
            self.kq_size,
            use_bias=False,
            kernel_init=winit.normal_std(kq_std),
            dtype=self.dtype,
            name="key_transform",
        )(keys)
        q = nn.Dense(
            self.kq_size,
            use_bias=not self.is_relative_pos,
            kernel_init=winit.normal_std(kq_std),
            bias_init=winit.zeros,
            dtype=self.dtype,
            name="query_transform",
        )(queries)
        v = nn.Dense(
            self.value_size,
            use_bias=False,
            kernel_init=winit.normal_std(v_std),
            dtype=self.dtype,
            name="value_transform",
        )(values)

        B, K = k.shape[0], k.shape[1]
        Q = q.shape[1]
        q = q.reshape(B, Q, self.n_heads, kq_head)
        v = v.reshape(B, K, self.n_heads, v_head)

        if self.is_relative_pos:
            # every query gets its own keys: [B, Q, K, kq_size]
            k = k[:, None, :, :] + rel_pos_enc
            k = k.reshape(B, Q, K, self.n_heads, kq_head)
            logits = jnp.einsum("bqkhd,bqhd->bhqk", k, q)
        else:
            k = k.reshape(B, K, self.n_heads, kq_head)
            logits = jnp.einsum("bkhd,bqhd->bhqk", k, q)

        logits = logits / math.sqrt(kq_head)

        if mask_keys is None:
            mask = jnp.ones((B, 1, 1, K), dtype=bool)
        else:
            mask = mask_keys[:, None, None, :].astype(bool)
        attn = masked_softmax(logits.astype(jnp.float32), mask, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v)
        ctx = ctx.reshape(B, Q, self.value_size)

        if self.is_post_process or self.value_size != self.out_size:
            ctx = nn.Dense(
                self.out_size,
                kernel_init=winit.switchable(winit.xavier_uniform),
                dtype=self.dtype,
                name="post_processor",
            )(ctx)
        return ctx


class TransformerAttender(nn.Module):
    """Image-Transformer cross-attention block: multihead + residual + 2x
    LayerNorm + MLP (reference attention.py:530-588)."""

    kq_size: int
    value_size: int
    out_size: int
    n_heads: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, keys, queries, values, mask_keys=None, rel_pos_enc=None):
        assert self.kq_size == self.out_size
        ctx = MultiheadAttender(
            kq_size=self.kq_size,
            value_size=self.value_size,
            out_size=self.out_size,
            n_heads=self.n_heads,
            is_post_process=False,
            dtype=self.dtype,
            name="multihead",
        )(keys, queries, values, mask_keys=mask_keys, rel_pos_enc=rel_pos_enc)
        ctx = nn.LayerNorm(name="layer_norm1")(ctx + queries)
        mlp_out = MLP(
            self.out_size, hidden_size=self.out_size, activation=nn.relu, name="mlp"
        )(ctx)
        return nn.LayerNorm(name="layer_norm2")(ctx + mlp_out)


def get_attender(
    attention,
    kq_size: int,
    value_size: int,
    out_size: int,
    name: Optional[str] = None,
    **kwargs,
):
    """Factory matching the reference `get_attender` (attention.py:16-86)."""
    if not isinstance(attention, str):
        return attention(kq_size, value_size, out_size, name=name, **kwargs)

    attention = attention.lower()
    if attention == "multiplicative":
        return MultiplicativeAttender(out_size=out_size, name=name, **kwargs)
    if attention == "additive":
        return AdditiveAttender(out_size=out_size, name=name, **kwargs)
    if attention in ("dot", "scaledot"):
        return DotAttender(
            out_size=out_size, is_scale=attention == "scaledot", name=name, **kwargs
        )
    if attention == "cosine":
        return CosineAttender(out_size=out_size, name=name, **kwargs)
    if attention == "manhattan":
        return DistanceAttender(out_size=out_size, p=1, name=name, **kwargs)
    if attention == "euclidean":
        return DistanceAttender(out_size=out_size, p=2, name=name, **kwargs)
    if attention == "weighted_dist":
        return DistanceAttender(
            out_size=out_size, p=1, is_weight=True, name=name, **kwargs
        )
    if attention == "multihead":
        return MultiheadAttender(
            kq_size=kq_size,
            value_size=value_size,
            out_size=out_size,
            name=name,
            **kwargs,
        )
    if attention == "transformer":
        return TransformerAttender(
            kq_size=kq_size,
            value_size=value_size,
            out_size=out_size,
            name=name,
            **kwargs,
        )
    raise ValueError(f"Unknown attention method {attention}")

"""SetConv — continuous set convolution with a density channel (ConvCNP's
functional encoder), masked for padded sets.

Parity targets: /root/reference/npf/architectures/setcnn.py —
`ExpRBF` (:86-142, softmax-normalized weights + *unnormalized* exp density —
match the code, not the paper), `UnsharedExpRBF` (:14-83, separate sigma for
signal vs density), `MlpRBF` (:145-191, learned kernel with window mask),
`SetConv` (:194-268, pairwise diff -> RBF -> weighted sum -> density concat ->
linear resize).

TPU notes: the O(B·Q·K) pairwise block is evaluated as one fused XLA
elementwise+reduce chain feeding an MXU matmul; `use_pallas=True` routes the
whole RBF+normalize+gather through a Pallas kernel that tiles over the query
axis (ops/pallas/setconv_kernel.py). Masked-out keys contribute nothing to
weights or density, so an empty context yields zero signal and zero density —
the reference's empty-context convention (convnp.py:146-151) for free.
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


def _inverse_softplus(y: float) -> float:
    return math.log(math.expm1(y))


def _init_length_scale(max_dist: float, max_dist_weight: float, p: int) -> float:
    """sigma s.t. exp(-(max_dist/sigma)^p) = max_dist_weight, then softplus^-1
    (reference setcnn.py:114-124)."""
    sigma = max_dist / ((-math.log(max_dist_weight)) ** (1.0 / p))
    return _inverse_softplus(sigma)


def _pairwise_dist(keys_x, queries_x, p):
    """[B,K,xd],[B,Q,xd] -> [B,Q,K] p-norm of differences."""
    diff = keys_x[:, None, :, :] - queries_x[:, :, None, :]
    if p == 2:
        return jnp.sqrt(jnp.sum(jnp.square(diff), axis=-1) + 1e-12)
    if p == 1:
        return jnp.sum(jnp.abs(diff), axis=-1)
    return jnp.sum(jnp.abs(diff) ** p, axis=-1) ** (1.0 / p)


class ExpRBF(nn.Module):
    """Exponential RBF: softmax weights over keys + raw-exp density channel
    (reference setcnn.py:86-142)."""

    max_dist: float = 1.0 / 256
    max_dist_weight: float = 0.9
    p: int = 2

    def setup(self):
        self.length_scale_param = self.param(
            "length_scale_param",
            lambda key, shape: jnp.full(
                shape,
                _init_length_scale(self.max_dist, self.max_dist_weight, self.p),
                dtype=jnp.float32,
            ),
            (1,),
        )

    def sigma(self) -> jax.Array:
        return 1e-5 + jax.nn.softplus(self.length_scale_param)[0]

    def __call__(self, keys_x, queries_x, mask_keys):
        sigma = self.sigma()
        dist = _pairwise_dist(keys_x, queries_x, self.p)  # [B,Q,K]
        inp = -((dist / sigma) ** self.p)

        mask = mask_keys[:, None, :].astype(bool)  # [B,1,K]
        # density: RAW exp sum (underflows to 0 far from context — that is
        # the semantic: no density there), reference setcnn.py:140-141
        density = jnp.sum(
            jnp.exp(inp) * mask.astype(inp.dtype), axis=-1, keepdims=True
        )
        # weights: max-subtracted softmax over keys, so even a far query
        # puts ~unit weight on its NEAREST context point (the reference's
        # "numerically stable normalization", setcnn.py:135-137)
        weight = masked_softmax(inp, mask, axis=-1)
        return weight, density


class UnsharedExpRBF(nn.Module):
    """ExpRBF with independent length-scales for the signal weight and the
    density channel (reference setcnn.py:14-83)."""

    max_dist: float = 1.0 / 256
    max_dist_weight: float = 0.99
    p: int = 2

    def setup(self):
        self.length_scale_param = self.param(
            "length_scale_param",
            lambda key, shape: jnp.full(
                shape,
                _init_length_scale(self.max_dist, self.max_dist_weight, self.p),
                dtype=jnp.float32,
            ),
            (2,),
        )

    def __call__(self, keys_x, queries_x, mask_keys):
        sigma = 1e-5 + jax.nn.softplus(self.length_scale_param)  # [2]
        dist = _pairwise_dist(keys_x, queries_x, self.p)[..., None]  # [B,Q,K,1]
        inp = -((dist / sigma) ** self.p)  # [B,Q,K,2]

        mask = mask_keys[:, None, :, None].astype(inp.dtype)
        exp = jnp.exp(inp) * mask
        density = jnp.sum(exp[..., 1:], axis=-2)  # [B,Q,1]
        weight = exp[..., 0] / (density + 1e-8)  # [B,Q,K]
        return weight, density


class MlpRBF(nn.Module):
    """Learned kernel shape |MLP(diff)| with a hard distance window
    (reference setcnn.py:145-191). Weights are density-normalized."""

    is_abs_dist: bool = True
    window_size: float = 0.25

    @nn.compact
    def __call__(self, keys_x, queries_x, mask_keys):
        diff = keys_x[:, None, :, :] - queries_x[:, :, None, :]  # [B,Q,K,xd]
        abs_diff = jnp.abs(diff)
        in_window = jnp.all(abs_diff < self.window_size, axis=-1)  # [B,Q,K]
        if self.is_abs_dist:
            diff = abs_diff
        weight = jnp.abs(
            MLP(1, n_hidden_layers=3, hidden_size=16, name="mlp")(diff)[..., 0]
        )
        mask = in_window & mask_keys[:, None, :].astype(bool)
        weight = weight * mask.astype(weight.dtype)
        density = jnp.sum(weight, axis=-1, keepdims=True)  # [B,Q,1]
        out = weight / (density + 1e-5)
        return out, density


class SetConv(nn.Module):
    """Set convolution {keys, values} x {queries} -> interpolated values +
    density channel -> linear resize (reference setcnn.py:194-268).

    Call: (keys_x [B,K,xd], queries_x [B,Q,xd], values [B,K,C],
    mask_keys [B,K]) -> [B,Q,out_channels].
    """

    out_channels: int
    RadialBasisFunc: Callable[..., nn.Module] = ExpRBF
    rbf_kwargs: Optional[dict] = None
    use_pallas: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, keys_x, queries_x, values, mask_keys=None):
        if mask_keys is None:
            mask_keys = jnp.ones(keys_x.shape[:2], dtype=bool)

        rbf = self.RadialBasisFunc(**(self.rbf_kwargs or {}), name="rbf")

        if self.use_pallas and self.RadialBasisFunc is ExpRBF:
            from .pallas.setconv_kernel import setconv_exprbf_pallas

            targets = setconv_exprbf_pallas(
                keys_x, queries_x, values, mask_keys, rbf.sigma(), p=rbf.p
            )  # [B, Q, C+1] incl. density channel
        else:
            weight, density = rbf(keys_x, queries_x, mask_keys)  # [B,Q,K], [B,Q,1]
            # weighted value gather rides the MXU: [B,Q,K] @ [B,K,C]
            targets = jnp.einsum(
                "bqk,bkc->bqc", weight.astype(jnp.float32), values.astype(jnp.float32)
            )
            targets = jnp.concatenate(
                [targets, density.astype(jnp.float32)], axis=-1
            )

        return nn.Dense(
            self.out_channels,
            kernel_init=winit.switchable(winit.xavier_uniform),
            dtype=self.dtype,
            name="resizer",
        )(targets)

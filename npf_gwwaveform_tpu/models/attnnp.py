"""Attentive conditional / latent neural processes.

Parity target: /root/reference/npf/neuralproc/attnnp.py — `AttnCNP` (:27-132,
per-point context reps + cross-attention target representation, optional
self-attention XY encoder :88-91) and `AttnLNP` (:134-202, encoded_path
forced to "both": deterministic cross-attn path + latent path whose input is
the mean-pooled context reps :172-181, merged via merge_r_z :183-202).

Masking replaces the reference's n_cntxt==0 special cases (:108-116,
:121-125): masked softmax gives padded keys zero weight, and a fully-masked
context produces the zero representation.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import get_attender
from ..ops.encoders import merge_flat_input
from ..ops.selfattn import SelfAttention
from ..utils.helpers import masked_mean
from .np import CNP


class AttnCNP(CNP):
    """Attentive CNP: deterministic version of Kim et al. 2019."""

    attention: str = "scaledot"
    attention_kwargs: Optional[dict] = None
    is_self_attn: bool = False
    self_attention_kwargs: Optional[dict] = None

    def _default_xy_encoder(self):
        if self.is_self_attn:
            factory = lambda n_out, **kw: SelfAttention(
                out_dim=n_out,
                dtype=self.dtype,
                **(self.self_attention_kwargs or {}),
                **kw,
            )
            return merge_flat_input(factory, is_sum_merge=True)(
                self.r_dim, name="xy_encoder"
            )
        return super()._default_xy_encoder()

    def _setup_extra(self):
        super()._setup_extra()
        self.attender = get_attender(
            self.attention,
            self._x_transf_dim,
            self.r_dim,
            self.r_dim,
            name="attender",
            dtype=self.dtype,
            **(self.attention_kwargs or {}),
        )

    def encode_globally(self, x_c, y_c, mask_cntxt, train=True, cond_emb=None):
        # one representation PER context point (no pooling), zeroed at padding
        R_cntxt = self.xy_encoder(x_c, y_c)  # [B, Nc, r_dim]
        return R_cntxt * mask_cntxt[..., None].astype(R_cntxt.dtype)

    def trgt_dependent_representation(self, x_c, z_samples, R, x_t, mask_cntxt, train=True):
        # cross-attention: keys=X_c, queries=X_t, values=R (attnnp.py:118-131)
        R_trgt = self.attender(x_c, x_t, R, mask_keys=mask_cntxt)
        return R_trgt[None]  # n_z axis = 1


class AttnLNP(AttnCNP):
    """Attentive LNP: deterministic cross-attention path + latent path,
    encoded_path forced to "both" (attnnp.py:134-202)."""

    encoded_path: str = "both"

    def rep_to_lat_input(self, R, mask):
        # per-point deterministic reps -> single pooled latent input
        # (attnnp.py:172-181); masked mean handles empty contexts
        return masked_mean(R, mask, axis=-2)[:, None, :]

    def trgt_dependent_representation(self, x_c, z_samples, R, x_t, mask_cntxt, train=True):
        B, n_trgt = x_t.shape[0], x_t.shape[1]
        n_z = z_samples.shape[0]

        # latent path: broadcast z over targets
        z = jnp.broadcast_to(z_samples, (n_z, B, n_trgt, self._z_dim))

        # deterministic path: cross-attention (reused from AttnCNP)
        R_trgt_det = self.attender(x_c, x_t, R, mask_keys=mask_cntxt)  # [B,Nt,r]

        # merge (attnnp.py:198-201)
        return self.merge_r_z(R_trgt_det, z)

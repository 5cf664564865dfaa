"""Vanilla conditional / latent neural processes.

Parity target: /root/reference/npf/neuralproc/np.py — `CNP` (:19-111,
per-point xy_encoder then masked mean-pool to one global R with the
zero-R-for-empty-context convention :95-99) and `LNP` (:113-163, latent path
with z (or merge(R,z)) broadcast to all targets).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.encoders import merge_flat_input
from ..ops.mlp import MLP
from ..utils.helpers import masked_mean
from .base import NeuralProcessFamily


class CNP(NeuralProcessFamily):
    """Conditional Neural Process (Garnelo et al. 2018).

    The masked mean-pool reproduces np.py:95-99 exactly: padding contributes
    nothing and an all-padding context yields the zero representation.
    """

    XYEncoder: Optional[Callable[[int], nn.Module]] = None

    def _default_xy_encoder(self):
        # 2-hidden-layer MLP, sum-merged X and Y, hidden clamped to be <=
        # max(in, out) (reference np.py:76-82)
        factory = lambda n_out, **kw: MLP(
            n_out,
            n_hidden_layers=2,
            is_force_hid_smaller=True,
            hidden_size=self.r_dim,
            dtype=self.dtype,
            **kw,
        )
        return merge_flat_input(factory, is_sum_merge=True)(
            self.r_dim, name="xy_encoder"
        )

    def _setup_extra(self):
        self.xy_encoder = (
            self.XYEncoder(self.r_dim)
            if self.XYEncoder is not None
            else self._default_xy_encoder()
        )

    def encode_globally(self, x_c, y_c, mask_cntxt, train=True, cond_emb=None):
        # per-point reps [B, Nc, r_dim]
        R_cntxt = self.xy_encoder(x_c, y_c)
        # masked mean-pool -> [B, 1, r_dim]
        R = masked_mean(R_cntxt, mask_cntxt, axis=-2)[:, None, :]
        return R

    def trgt_dependent_representation(self, x_c, z_samples, R, x_t, mask_cntxt, train=True):
        B, n_trgt = x_t.shape[0], x_t.shape[1]
        # broadcast the single global rep to all targets; n_z axis = 1
        return jnp.broadcast_to(R[None], (1, B, n_trgt, self.r_dim))


class LNP(CNP):
    """(Latent) Neural Process: CNP encoder + latent path (np.py:113-163)."""

    encoded_path: str = "latent"

    def trgt_dependent_representation(self, x_c, z_samples, R, x_t, mask_cntxt, train=True):
        B, n_trgt = x_t.shape[0], x_t.shape[1]
        n_z = z_samples.shape[0]

        if self.encoded_path == "both":
            R_trgt = self.merge_r_z(R, z_samples)  # [n_z, B, 1, r_dim]
        else:  # latent
            R_trgt = z_samples
            if self._z_dim != self.r_dim:
                R_trgt = self.reshaper_z(R_trgt)

        return jnp.broadcast_to(R_trgt, (n_z, B, n_trgt, self.r_dim))

"""Convolutional conditional / latent neural processes (off-the-grid).

Parity target: /root/reference/npf/neuralproc/convnp.py — `ConvCNP` (:26-181):
induced grid `linspace(-1.5, 1.5, 3*density)` (:104), SetConv context->grid
with density channel (:107,:144), translation-equivariant CNN grid->grid
(:108,:154), SetConv grid->targets (:109,:165), identity x-encoder (:97),
x-independent decoder (:124), `set_extrapolation` (:170-181) realized here as
the static `induced_range` config (rebuild the model with a wider range at the
same `density_induced` for extrapolation — jit needs static grid sizes).
`ConvLNP` (:184-335): latent field on the induced grid, post-sampling CNN for
coherent samples (:237,:289), optional global latent (:322-335), z-samples
folded into the batch dim for the CNN (:273-281).

This is the GW-relevant hot path: SetConv is O(B·Nc·Ngrid) pairwise work
(the #1 Pallas target) and the grid CNN is depthwise-separable conv1d.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.cnn import CNN, ResConvBlock
from ..ops.encoders import SinusoidalEncodings, discard_ith_arg
from ..ops.mlp import MLP
from ..ops.setconv import ExpRBF, SetConv
from ..utils.helpers import (
    collapse_z_samples_batch,
    masked_mean,
    pool_and_replicate_middle,
    replicate_z_samples,
)
from .base import NeuralProcessFamily


class _IdentityXEncoder(nn.Module):
    def __call__(self, x):
        return x


class ConvCNP(NeuralProcessFamily):
    """Convolutional CNP (Gordon et al. 2019), translation equivariant."""

    density_induced: int = 64
    induced_range: Tuple[float, float] = (-1.5, 1.5)
    Interpolator: Optional[Callable[..., nn.Module]] = None  # SetConv-like
    CNNFactory: Optional[Callable[..., nn.Module]] = None  # r_dim -> module
    cnn_n_blocks: int = 3
    cnn_kernel_size: int = 11
    cnn_norm: Optional[str] = None
    cnn_remat: bool = False  # jax.checkpoint per grid-CNN block (HBM lever)
    # MXU banded-matmul lowering of the grid CNN's depthwise convs (same
    # params/math as the grouped convs — ops/cnn.py _BandedDepthwise);
    # throughput lever for moderate induced grids
    cnn_banded: bool = False
    use_pallas_setconv: bool = False
    x_transf_dim: Optional[int] = None  # identity x-encoder keeps x_dim

    @property
    def n_induced(self) -> int:
        lo, hi = self.induced_range
        return int(self.density_induced * (hi - lo))

    def _default_x_encoder(self):
        return _IdentityXEncoder(name="x_encoder")

    def _default_decoder(self):
        # translation equivariance: decoder must not see x (convnp.py:124)
        return discard_ith_arg(self._sub_decoder_factory(), i=0)(
            self.y_dim * 2, name="decoder"
        )

    def _make_cnn(self, name):
        if self.CNNFactory is not None:
            return self.CNNFactory(self.r_dim, name=name)
        return CNN(
            n_channels=self.r_dim,
            n_blocks=self.cnn_n_blocks,
            kernel_size=self.cnn_kernel_size,
            norm=self.cnn_norm,
            ConvBlockModule=ResConvBlock,
            remat=self.cnn_remat,
            banded=self.cnn_banded,
            dtype=self.dtype,
            name=name,
        )

    def _make_interpolator(self, out_channels, name):
        if self.Interpolator is not None:
            return self.Interpolator(out_channels, name=name)
        return SetConv(
            out_channels,
            RadialBasisFunc=ExpRBF,
            use_pallas=self.use_pallas_setconv,
            dtype=self.dtype,
            name=name,
        )

    _supports_film: bool = True
    cond_pos_feats: int = 64  # sinusoidal feature width for the FiLM field

    def _setup_extra(self):
        self.cntxt_to_induced = self._make_interpolator(self.r_dim, "cntxt_to_induced")
        self.induced_to_induced = self._make_cnn("induced_to_induced")
        self.induced_to_trgt = self._make_interpolator(self.r_dim, "induced_to_trgt")
        if self.cond_dim > 0 and self.cond_mode == "film":
            # per-position conditioning on the induced grid (base.py docs):
            # channelwise gamma from the embedding + an additive field that
            # sees (sinusoidal grid position, embedding) per grid point, both
            # applied BEFORE induced_to_induced so the CNN can propagate
            # position-dependent structure (e.g. the chirp phase evolution)
            self.cond_gamma = nn.Dense(self.r_dim, dtype=self.dtype, name="cond_gamma")
            self.cond_pos_enc = SinusoidalEncodings(
                self.cond_pos_feats, name="cond_pos_enc"
            )
            self.cond_field = MLP(
                self.r_dim,
                n_hidden_layers=2,
                hidden_size=self.r_dim,
                dtype=self.dtype,
                name="cond_field",
            )

    def _film(self, R_induced, cond_emb):
        """R_induced [B, n_ind, r_dim], cond_emb [B, r_dim]."""
        B = R_induced.shape[0]
        x_induced = self._get_x_induced(B)  # [B, n_ind, x_dim] in grid units
        # rescale to [-1, 1] for the sinusoidal features
        lo, hi = self.induced_range
        pos = (x_induced - lo) * (2.0 / (hi - lo)) - 1.0
        feats = self.cond_pos_enc(pos)  # [B, n_ind, cond_pos_feats]
        emb = jnp.broadcast_to(
            cond_emb[:, None, :], (B, self.n_induced, cond_emb.shape[-1])
        )
        field = self.cond_field(jnp.concatenate([feats, emb], axis=-1))
        gamma = self.cond_gamma(cond_emb)[:, None, :]
        return R_induced * (1.0 + gamma) + field

    def _get_x_induced(self, batch_size: int) -> jax.Array:
        lo, hi = self.induced_range
        grid = jnp.linspace(lo, hi, self.n_induced, dtype=jnp.float32)
        return jnp.broadcast_to(
            grid[None, :, None], (batch_size, self.n_induced, self.x_dim)
        )

    def encode_globally(self, x_c, y_c, mask_cntxt, train=True, cond_emb=None):
        B = x_c.shape[0]
        x_induced = self._get_x_induced(B)
        # empty context -> zero signal + zero density, naturally via the mask
        R_induced = self.cntxt_to_induced(x_c, x_induced, y_c, mask_keys=mask_cntxt)
        if cond_emb is not None and self.cond_mode == "film":
            R_induced = self._film(R_induced, cond_emb)
        R_induced = self.induced_to_induced(R_induced, train=train)
        return R_induced

    def trgt_dependent_representation(self, x_c, z_samples, R_induced, x_t, mask_cntxt, train=True):
        B = x_t.shape[0]
        x_induced = self._get_x_induced(B)
        R_trgt = self.induced_to_trgt(x_induced, x_t, R_induced)
        return R_trgt[None]


class ConvLNP(ConvCNP):
    """Convolutional LNP (Foong et al. 2020): q(z) per induced-grid point,
    post-sampling CNN mixes samples for coherence."""

    encoded_path: str = "latent"
    is_global: bool = False
    CNNPostZFactory: Optional[Callable[..., nn.Module]] = None

    def _default_decoder(self):
        # smaller decoder than ConvCNP (convnp.py:249): linear on R only
        factory = lambda n_out, **kw: nn.Dense(n_out, dtype=self.dtype, **kw)
        return discard_ith_arg(factory, i=0)(self.y_dim * 2, name="decoder")

    def _setup_extra(self):
        super()._setup_extra()
        if self.CNNPostZFactory is not None:
            self.induced_to_induced_post_sampling = self.CNNPostZFactory(
                self.r_dim, name="induced_to_induced_post_sampling"
            )
        else:
            self.induced_to_induced_post_sampling = self._make_cnn(
                "induced_to_induced_post_sampling"
            )

    def rep_to_lat_input(self, R, mask):
        if self.encoded_path == "latent":
            # one latent per induced point (convnp.py:253-258)
            return R
        # "both": single global latent from pooled grid (convnp.py:260-262)
        return jnp.mean(R, axis=-2, keepdims=True)

    def add_global_latent(self, z):
        """Split channels local/global, pool global half over the grid
        (convnp.py:322-335)."""
        half = z.shape[-1] // 2
        local, global_ = z[..., :half], z[..., half:]
        global_ = pool_and_replicate_middle(global_)
        return jnp.concatenate([local, global_], axis=-1)

    def trgt_dependent_representation(self, x_c, z_samples, R_induced, x_t, mask_cntxt, train=True):
        B, n_trgt = x_t.shape[0], x_t.shape[1]
        n_z = z_samples.shape[0]

        x_induced = self._get_x_induced(B)
        # fold n_z into batch for CNN/SetConv (convnp.py:273-281)
        x_induced_rep = collapse_z_samples_batch(
            replicate_z_samples(x_induced, n_z)
        )
        x_t_rep = collapse_z_samples_batch(replicate_z_samples(x_t, n_z))

        if self.encoded_path == "latent":
            z = collapse_z_samples_batch(z_samples)  # [n_z*B, n_ind, z_dim]
            if self._z_dim != self.r_dim:
                z = self.reshaper_z(z)
            # "mixing" after sampling for coherent samples (convnp.py:289)
            z = self.induced_to_induced_post_sampling(z, train=train)
            if self.is_global:
                z = self.add_global_latent(z)
            R_trgt = self.induced_to_trgt(x_induced_rep, x_t_rep, z)

        else:  # both
            z = jnp.broadcast_to(
                z_samples, (n_z, B, self.n_induced, self._z_dim)
            )
            R_ind = self.merge_r_z(R_induced, z)
            R_ind = collapse_z_samples_batch(R_ind)
            R_ind = self.induced_to_induced_post_sampling(R_ind, train=train)
            R_trgt = self.induced_to_trgt(x_induced_rep, x_t_rep, R_ind)

        return R_trgt.reshape(n_z, B, n_trgt, self.r_dim)

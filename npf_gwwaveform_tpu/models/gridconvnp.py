"""On-the-grid convolutional conditional / latent neural processes.

Parity target: /root/reference/npf/neuralproc/gridconvnp.py — `GridConvCNP`
(:28-178): context/targets/induced points share one grid; `X` inputs are
boolean masks over the grid and `Y` the grid values (:35-44); the context
embedding is an abs-weight depthwise conv of masked signal + mask, normalized,
then concat + linear resize (:136-162). `GridConvLNP` (:181-289) reuses
ConvLNP's latent machinery on the grid.

Call convention (as in the reference): `x_cntxt` is the context mask with
shape [B, *grid, x_dim] (x_dim == 1 or y_dim), `y_cntxt` the full grid values
[B, *grid, y_dim]; the separate `mask_cntxt`/`mask_trgt` arguments of the NPF
API are ignored by grid models (the grid is always fully valid).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn

from ..utils import init as winit
import jax
import jax.numpy as jnp

from ..ops.cnn import AbsConv
from ..utils.helpers import collapse_z_samples_batch, pool_and_replicate_middle
from .convnp import ConvCNP, ConvLNP


class GridConvCNP(ConvCNP):
    """ConvCNP special case on a fixed grid (gridconvnp.py:28-178).

    conv_padding="CIRCULAR" gives FULL translation equivariance via periodic
    boundaries (the reference's CircularPad2d `model_2d_extrap` config,
    ConvCNP.ipynb + npf/utils/helpers.py:334-406) — the zero-shot
    extrapolation setting for zsmms."""

    conv_kernel_size: int = 11
    conv_padding: str = "SAME"

    def _make_cnn(self, name):
        if self.CNNFactory is not None:
            return self.CNNFactory(self.r_dim, name=name)
        from ..ops.cnn import CNN, ResConvBlock

        return CNN(
            n_channels=self.r_dim,
            n_blocks=self.cnn_n_blocks,
            kernel_size=self.cnn_kernel_size,
            norm=self.cnn_norm,
            padding=self.conv_padding,
            ConvBlockModule=ResConvBlock,
            remat=self.cnn_remat,
            dtype=self.dtype,
            name=name,
        )

    def _setup_extra(self):
        # no SetConvs on the grid; depthwise abs-conv + resizer instead
        self.conv = AbsConv(
            kernel_size=self.conv_kernel_size,
            use_bias=False,
            padding=self.conv_padding,
            dtype=self.dtype,
            name="conv",
        )
        self.resizer = nn.Dense(
            self.r_dim, dtype=self.dtype, name="resizer",
            kernel_init=winit.switchable(nn.initializers.lecun_normal()),
        )
        self.induced_to_induced = self._make_cnn("induced_to_induced")

    def cntxt_to_induced(self, mask_cntxt_grid, y_grid):
        """Infer missing values and a density channel (gridconvnp.py:136-162).
        Channel-last throughout (no transposes needed on TPU)."""
        mask = mask_cntxt_grid.astype(y_grid.dtype)
        # broadcast mask over y channels
        x_cntxt = y_grid * mask
        signal = self.conv(x_cntxt)
        density = self.conv(jnp.broadcast_to(mask, y_grid.shape))
        out = signal / jnp.maximum(density, 1e-5)
        out = jnp.concatenate([out, density], axis=-1)  # [B, *grid, 2*y_dim]
        return self.resizer(out)  # [B, *grid, r_dim]

    def encode_globally(self, x_c, y_c, mask_cntxt, train=True, cond_emb=None):
        R_induced = self.cntxt_to_induced(x_c, y_c)
        return self.induced_to_induced(R_induced, train=train)

    def trgt_dependent_representation(self, x_c, z_samples, R_induced, x_t, mask_cntxt, train=True):
        return R_induced[None]


class GridConvLNP(GridConvCNP):
    """Grid ConvLNP: ConvLNP's latent path on the grid (gridconvnp.py:181-289).
    Method reuse mirrors the reference's direct assignment (:240-242)."""

    encoded_path: str = "latent"
    is_global: bool = False
    CNNPostZFactory: Optional[Callable[..., nn.Module]] = None

    # reuse ConvLNP's decoder/latent-input/global-latent logic
    _default_decoder = ConvLNP._default_decoder
    rep_to_lat_input = ConvLNP.rep_to_lat_input
    add_global_latent = ConvLNP.add_global_latent

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

    def trgt_dependent_representation(self, x_c, z_samples, R_induced, x_t, mask_cntxt, train=True):
        grid_shape = x_t.shape[1:-1]
        B = x_t.shape[0]
        n_z = z_samples.shape[0]

        if self.encoded_path == "latent":
            z = collapse_z_samples_batch(z_samples)  # [n_z*B, *grid, z_dim]
            if self.is_global:
                z = self.add_global_latent(z)
            if self._z_dim != self.r_dim:
                z = self.reshaper_z(z)
            R_trgt = self.induced_to_induced_post_sampling(z, train=train)

        else:  # both: z_samples is [n_z, B, 1, z_dim]
            z = z_samples.reshape(
                (n_z, B) + (1,) * len(grid_shape) + (self._z_dim,)
            )
            z = jnp.broadcast_to(z, (n_z, B) + grid_shape + (self._z_dim,))
            R_ind = self.merge_r_z(R_induced, z)
            R_ind = collapse_z_samples_batch(R_ind)
            R_trgt = self.induced_to_induced_post_sampling(R_ind, train=train)

        return R_trgt.reshape((n_z, B) + grid_shape + (self.r_dim,))

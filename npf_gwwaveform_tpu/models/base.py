"""NeuralProcessFamily base — the forward skeleton shared by every NPF member.

Parity target: /root/reference/npf/neuralproc/base.py:23-575. The skeleton is
x-encode -> `encode_globally` -> optional `latent_path` ->
`trgt_dependent_representation` -> `decode` into a diagonal-Gaussian
predictive (base.py:177-239), with:
* predictive scale transform `0.01 + 0.99*softplus` (base.py:116),
* latent scale transform `0.1 + 0.9*sigmoid` (base.py:432),
* `encoded_path in {deterministic, latent, both}` semantics (base.py:102),
* `is_heteroskedastic=False` pooling of predictive scales (base.py:356-362),
* q(z|C∪T) support for NPVI (`is_q_zCct`, base.py:501-509),
* r/z merging for the "both" path (base.py:554-575).

TPU-first deltas: all point sets are padded with boolean masks (static shapes
under jit); the latent z-sample count is a static Python int chosen by the
`train` flag; sampling randomness comes from the flax `latent` RNG collection;
matmuls run in `dtype` (bfloat16 by default on TPU via the trainer) while
distribution parameters and log-probs stay float32.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn

from ..utils import init as winit
import jax
import jax.numpy as jnp

from ..distributions import NormalDiag
from ..losses import NPFOutput
from ..ops.encoders import merge_flat_input
from ..ops.mlp import MLP
from ..utils.helpers import masked_mean, replicate_z_samples


class NeuralProcessFamily(nn.Module):
    """Abstract base; subclasses implement `encode_globally` and
    `trgt_dependent_representation` plus `_setup_extra` for their modules."""

    y_dim: int = 1
    x_dim: int = 1
    r_dim: int = 128
    encoded_path: str = "deterministic"
    x_transf_dim: Optional[int] = -1  # -1 -> r_dim, None -> x_dim
    is_heteroskedastic: bool = True
    min_sigma_pred: float = 0.01
    XEncoder: Optional[Callable[[int], nn.Module]] = None  # n_out -> module
    Decoder: Optional[Callable[[int], nn.Module]] = None  # n_out -> module
    # ---- latent-path configuration (used when encoded_path != deterministic)
    is_q_zCct: bool = False
    n_z_samples_train: int = 32
    n_z_samples_test: int = 32
    z_dim: Optional[int] = None  # None -> r_dim
    LatentEncoder: Optional[Callable[[int], nn.Module]] = None
    min_lat_sigma: float = 0.1
    max_lat_sigma_ratio: float = 0.9
    # q_z scale transform: "sigmoid" = min + ratio*sigmoid (reference default,
    # base.py:432 — the bounded 'LatLB' form); "softplus" = min +
    # (1-min)*softplus (the Losses.ipynb LatLBFalse variant with min=1e-4)
    lat_scale_transform: str = "sigmoid"
    # ---- optional conditioning on global physical parameters (e.g. GW
    # mass/spin, BASELINE.json config 5). 0 disables. When set, __call__
    # accepts `condition [B, cond_dim]`. Two modes:
    #   "add":  embed and add one global vector to every representation entry
    #           (a pure bias after the encoder).
    #   "film": per-position modulation of the induced-grid representation
    #           BEFORE the translation CNN — channelwise gamma plus an
    #           additive field MLP(sinusoidal(grid position), embedding) —
    #           so the conditioning can carry position-dependent structure
    #           (e.g. a chirp's phase evolution). Supported by the ConvCNP
    #           family; other models raise.
    cond_dim: int = 0
    cond_mode: str = "add"
    dtype: Optional[jnp.dtype] = None
    # fuse the default decoder's MLP chain into one Pallas kernel
    # (ops/pallas/mlp_chain_kernel.py): no inter-layer HBM round trips.
    # Param tree unchanged — checkpoints interchange with the XLA path.
    fused_mlp: bool = False

    # ------------------------------------------------------------- plumbing

    @property
    def _x_transf_dim(self) -> int:
        if self.x_transf_dim is None:
            return self.x_dim
        if self.x_transf_dim == -1:
            return self.r_dim
        return self.x_transf_dim

    @property
    def _z_dim(self) -> int:
        return self.r_dim if self.z_dim is None else self.z_dim

    @property
    def has_latent(self) -> bool:
        return self.encoded_path in ("latent", "both")

    # default sub-modules (reference base.py:157-175)
    def _default_x_encoder(self):
        return MLP(
            self._x_transf_dim,
            n_hidden_layers=1,
            hidden_size=self.r_dim,
            dtype=self.dtype,
            name="x_encoder",
        )

    def _sub_decoder_factory(self):
        return lambda n_out, **kw: MLP(
            n_out, n_hidden_layers=4, hidden_size=self.r_dim, dtype=self.dtype,
            fused=self.fused_mlp, **kw
        )

    def _default_decoder(self):
        return merge_flat_input(self._sub_decoder_factory(), is_sum_merge=True)(
            self.y_dim * 2, name="decoder"
        )

    def _default_latent_encoder(self):
        return MLP(
            self._z_dim * 2,
            n_hidden_layers=1,
            hidden_size=self.r_dim,
            dtype=self.dtype,
            name="latent_encoder",
        )

    def setup(self):
        if self.encoded_path not in ("deterministic", "latent", "both"):
            raise ValueError(f"Unknown encoded_path={self.encoded_path}")

        self.x_encoder = (
            self.XEncoder(self._x_transf_dim)
            if self.XEncoder is not None
            else self._default_x_encoder()
        )
        self.decoder = (
            self.Decoder(self.y_dim * 2)
            if self.Decoder is not None
            else self._default_decoder()
        )

        if self.has_latent:
            self.latent_encoder = (
                self.LatentEncoder(self._z_dim * 2)
                if self.LatentEncoder is not None
                else self._default_latent_encoder()
            )
            if self.encoded_path == "both":
                self.r_z_merger = nn.Dense(
                    self.r_dim, dtype=self.dtype, name="r_z_merger",
                    kernel_init=winit.switchable(nn.initializers.lecun_normal()),
                )
            if self._z_dim != self.r_dim and self.encoded_path == "latent":
                self.reshaper_z = nn.Dense(
                    self.r_dim, dtype=self.dtype, name="reshaper_z",
                    kernel_init=winit.switchable(nn.initializers.lecun_normal()),
                )

        if self.cond_dim > 0:
            if self.cond_mode not in ("add", "film"):
                raise ValueError(f"Unknown cond_mode={self.cond_mode}")
            if self.cond_mode == "film" and not self._supports_film:
                raise ValueError(
                    f"{type(self).__name__} does not support cond_mode='film' "
                    "(only the ConvCNP family has an induced grid to modulate)"
                )
            self.cond_encoder = MLP(
                self.r_dim,
                n_hidden_layers=1,
                hidden_size=self.r_dim,
                dtype=self.dtype,
                name="cond_encoder",
            )

        self._setup_extra()

    def _setup_extra(self):
        """Subclass hook for model-specific modules."""

    # ---------------------------------------------------------- the skeleton

    def __call__(
        self,
        x_cntxt: jax.Array,  # [B, Nc, x_dim]
        y_cntxt: jax.Array,  # [B, Nc, y_dim]
        x_trgt: jax.Array,  # [B, Nt, x_dim]
        y_trgt: Optional[jax.Array] = None,  # [B, Nt, y_dim]
        mask_cntxt: Optional[jax.Array] = None,  # [B, Nc] bool
        mask_trgt: Optional[jax.Array] = None,  # [B, Nt] bool
        condition: Optional[jax.Array] = None,  # [B, cond_dim]
        train: bool = True,
    ) -> NPFOutput:
        if mask_cntxt is None:
            mask_cntxt = jnp.ones(x_cntxt.shape[:2], dtype=bool)
        if mask_trgt is None:
            mask_trgt = jnp.ones(x_trgt.shape[:2], dtype=bool)

        # size = [B, N*, x_transf_dim]  (reference base.py:215-217)
        x_c = self.x_encoder(x_cntxt)
        x_t = self.x_encoder(x_trgt)

        cond_emb = None
        if self.cond_dim > 0:
            if condition is None:
                raise ValueError("cond_dim > 0 requires a `condition` input")
            cond_emb = self.cond_encoder(condition)  # [B, r_dim]

        # size = [B, *n_rep, r_dim]
        R = self.encode_globally(
            x_c, y_cntxt, mask_cntxt, train=train, cond_emb=cond_emb
        )

        if cond_emb is not None and self.cond_mode == "add":
            R = R + cond_emb.reshape(
                cond_emb.shape[0], *([1] * (R.ndim - 2)), cond_emb.shape[-1]
            )

        if self.has_latent:
            z_samples, q_zCc, q_zCct = self.latent_path(
                x_c, R, x_t, y_trgt, mask_cntxt, mask_trgt, train, cond_emb=cond_emb
            )
        else:
            z_samples, q_zCc, q_zCct = None, None, None

        if self.encoded_path == "latent":
            R = None

        # size = [n_z, B, Nt, r_dim]
        R_trgt = self.trgt_dependent_representation(
            x_c, z_samples, R, x_t, mask_cntxt, train=train
        )

        p_yCc = self.decode(x_t, R_trgt, mask_trgt)
        return NPFOutput(p_yCc, z_samples, q_zCc, q_zCct)

    # ------------------------------------------------------------ latents

    def _n_z_samples(self, train: bool) -> int:
        return self.n_z_samples_train if train else self.n_z_samples_test

    def latent_path(
        self, x_c, R, x_t, y_trgt, mask_cntxt, mask_trgt, train, cond_emb=None
    ):
        """(reference base.py:495-514)"""
        q_zCc = self.infer_latent_dist(R, mask_cntxt)

        if self.is_q_zCct and y_trgt is not None:
            R_from_trgt = self.encode_globally(
                x_t, y_trgt, mask_trgt, train=train, cond_emb=cond_emb
            )
            q_zCct = self.infer_latent_dist(R_from_trgt, mask_trgt)
            sampling_dist = q_zCct
        else:
            q_zCct = None
            sampling_dist = q_zCc

        n_z = self._n_z_samples(train)
        key = self.make_rng("latent")
        # size = [n_z, B, *n_lat, z_dim]
        z_samples = sampling_dist.sample(key, (n_z,))
        return z_samples, q_zCc, q_zCct

    def infer_latent_dist(self, R, mask) -> NormalDiag:
        """(reference base.py:516-547)"""
        r_lat = self.rep_to_lat_input(R, mask)
        suffstat = self.latent_encoder(r_lat)
        loc, raw_scale = jnp.split(suffstat, 2, axis=-1)
        if self.lat_scale_transform == "softplus":
            scale = self.min_lat_sigma + (
                1.0 - self.min_lat_sigma
            ) * jax.nn.softplus(raw_scale)
        else:
            scale = self.min_lat_sigma + self.max_lat_sigma_ratio * jax.nn.sigmoid(
                raw_scale
            )
        return NormalDiag(loc.astype(jnp.float32), scale.astype(jnp.float32))

    def rep_to_lat_input(self, R, mask):
        """n_rep representations -> n_lat latent inputs (base.py:549-552)."""
        return R

    def merge_r_z(self, R, z_samples):
        """relu(Linear([R; z])) with broadcast over the z-sample axis
        (reference base.py:554-575)."""
        if R.ndim != z_samples.ndim:
            R = jnp.broadcast_to(R[None], z_samples.shape[:-1] + (R.shape[-1],))
        else:
            shape = jnp.broadcast_shapes(R.shape[:-1], z_samples.shape[:-1])
            R = jnp.broadcast_to(R, shape + (R.shape[-1],))
            z_samples = jnp.broadcast_to(z_samples, shape + (z_samples.shape[-1],))
        return nn.relu(self.r_z_merger(jnp.concatenate([R, z_samples], axis=-1)))

    # ------------------------------------------------------------- decoding

    def decode(self, x_t, R_trgt, mask_trgt) -> NormalDiag:
        """(reference base.py:327-367)"""
        suffstat = self.decoder(x_t, R_trgt)  # [n_z, B, *n_trgt, 2*y_dim]
        loc, raw_scale = jnp.split(suffstat, 2, axis=-1)
        scale = self.min_sigma_pred + (1.0 - self.min_sigma_pred) * jax.nn.softplus(
            raw_scale
        )

        if not self.is_heteroskedastic:
            # pool scales over real target points then broadcast back
            # (reference base.py:356-362)
            pooled = masked_mean(scale, mask_trgt[None, ...], axis=-2)
            scale = jnp.broadcast_to(pooled[..., None, :], scale.shape)

        return NormalDiag(loc.astype(jnp.float32), scale.astype(jnp.float32))

    # ------------------------------------------------------------- abstract

    # whether the subclass consumes cond_emb inside encode_globally for
    # cond_mode="film" (ConvCNP family only)
    _supports_film: bool = False

    def encode_globally(self, x_c, y_c, mask_cntxt, train=True, cond_emb=None):
        raise NotImplementedError

    def trgt_dependent_representation(self, x_c, z_samples, R, x_t, mask_cntxt, train=True):
        raise NotImplementedError

"""Notebook-parity model configurations.

The reference's benchmark numbers come from the reproducibility notebooks'
explicit configs, NOT the class defaults (e.g. CNP's XYEncoder is a
2-hidden-layer MLP of width 2*R_DIM "to have similar number of parameters
than other NPFs" — CNP.ipynb; ConvCNP's CNN is 5 ResConvBlocks with TWO conv
layers per block, k=19, BatchNorm — ConvCNP.ipynb; ConvLNP uses 4 blocks,
is_global=True, NPML with n_z_train=16 — ConvLNP.ipynb; LNP/AttnLNP train
NPVI with n_z_train=1 — LNP.ipynb/AttnLNP.ipynb).

`gp_model_1d(name)` reproduces the exact 1-D GP-benchmark architectures;
`gp_criterion(name)` the matching training objective.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .losses import CNPFLoss, ELBOLossLNPF, NLLLossLNPF
from .models import CNP, LNP, AttnCNP, AttnLNP, ConvCNP, ConvLNP
from .ops.cnn import CNN
from .ops.encoders import merge_flat_input
from .ops.mlp import MLP

R_DIM = 128

__all__ = ["gp_model_1d", "gp_criterion", "gw_model_from_summary", "R_DIM"]


def _xy_encoder(hidden_size, dtype=None):
    return merge_flat_input(
        lambda n_out, **kw: MLP(
            n_out, n_hidden_layers=2, hidden_size=hidden_size, dtype=dtype, **kw
        ),
        is_sum_merge=True,
    )


def _cnn_factory(
    n_blocks, dtype=None, kernel_size=19, norm_eps=1e-3, dilations=None, remat=False,
    banded=False,
):
    # ConvCNP.ipynb CNN_KWARGS: ResConvBlock, n_conv_layers=2, k=19, BatchNorm
    # (the Matern_Kernel pretrained ConvCNP checkpoint was trained with k=15).
    # norm_eps=1e-3 is our training-stability default; the reference's
    # pretrained checkpoints use torch's 1e-5 — pass that for ported-weight
    # parity evals. `dilations` (per-block) is a multi-scale extension over
    # the reference for dense induced grids (None = reference behavior).
    def make(r_dim, name=None):
        return CNN(
            n_channels=r_dim,
            n_blocks=n_blocks,
            kernel_size=kernel_size,
            norm="batch",
            dilations=dilations,
            block_kwargs={"n_conv_layers": 2, "norm_eps": norm_eps},
            remat=remat,
            banded=banded,
            dtype=dtype,
            name=name,
        )

    return make


def _unet_factory(n_blocks, dtype=None, kernel_size=19, norm_eps=1e-3, remat=False):
    # Multi-scale induced-grid CNN: UnetCNN (reference cnn.py:383-516) in
    # place of the flat CNN stack. An extension over the reference's 1-D
    # notebook configs (which use the flat CNN) targeting the GW low-Mc
    # resolution/receptive-field tradeoff: pooling gives the deep blocks a
    # large physical RF while full-resolution skips keep local phase detail.
    from .ops.cnn import UnetCNN

    def make(r_dim, name=None):
        return UnetCNN(
            n_channels=r_dim,
            n_blocks=n_blocks if n_blocks % 2 == 1 else n_blocks + 1,
            kernel_size=kernel_size,
            norm="batch",
            max_nchannels=2 * r_dim,
            block_kwargs={"n_conv_layers": 2, "norm_eps": norm_eps},
            remat=remat,
            dtype=dtype,
            name=name,
        )

    return make


def gp_model_1d(
    name: str,
    r_dim: int = R_DIM,
    dtype: Optional[jnp.dtype] = None,
    cnn_kernel_size: int = 19,
    cnn_norm_eps: float = 1e-3,
    cnn_dilations: Optional[tuple] = None,
    cnn_arch: str = "cnn",
    cnn_remat: bool = False,
    cnn_banded: bool = False,
):
    """The exact 1-D model the reference's notebook benchmarks use.

    cnn_remat rematerializes each grid-CNN block on the backward pass
    (jax.checkpoint) — the HBM lever for long-waveform / dense-grid
    configs; numerics unchanged (ops/cnn.py CNN.remat)."""
    common = dict(y_dim=1, x_dim=1, r_dim=r_dim, dtype=dtype)
    if name == "CNP":
        return CNP(
            **common,
            XYEncoder=lambda n_out: _xy_encoder(2 * r_dim, dtype)(n_out, name="xy_encoder"),
        )
    if name == "LNP":
        return LNP(
            **common,
            XYEncoder=lambda n_out: _xy_encoder(2 * r_dim, dtype)(n_out, name="xy_encoder"),
            is_q_zCct=True,  # NPVI
            n_z_samples_train=1,
            n_z_samples_test=32,
        )
    if name == "AttnCNP":
        return AttnCNP(
            **common,
            XYEncoder=lambda n_out: _xy_encoder(r_dim, dtype)(n_out, name="xy_encoder"),
            attention="transformer",
        )
    if name == "AttnLNP":
        return AttnLNP(
            **common,
            XYEncoder=lambda n_out: _xy_encoder(r_dim, dtype)(n_out, name="xy_encoder"),
            attention="transformer",
            is_q_zCct=True,
            n_z_samples_train=1,
            n_z_samples_test=8,
        )
    if cnn_arch == "unet":
        if cnn_dilations or cnn_banded:
            # _unet_factory supports neither knob; dropping them silently
            # would let run artifacts (tag + summary.json) claim an
            # architecture that was never built.
            raise ValueError(
                "cnn_dilations/cnn_banded are not supported with cnn_arch='unet'"
            )

        def cnn_factory(n_blocks):
            return _unet_factory(
                n_blocks, dtype, cnn_kernel_size, cnn_norm_eps, remat=cnn_remat
            )
    else:
        def cnn_factory(n_blocks):
            return _cnn_factory(
                n_blocks, dtype, cnn_kernel_size, cnn_norm_eps, cnn_dilations,
                remat=cnn_remat, banded=cnn_banded,
            )
    if name == "ConvCNP":
        return ConvCNP(
            **common,
            density_induced=64,
            CNNFactory=cnn_factory(5),
        )
    if name == "ConvLNP":
        return ConvLNP(
            **common,
            density_induced=64,
            CNNFactory=cnn_factory(4),
            is_q_zCct=False,  # NPML
            n_z_samples_train=16,
            n_z_samples_test=32,
            is_global=True,
        )
    raise ValueError(name)


def gw_model_1d(
    name: str,
    r_dim: int = R_DIM,
    dtype: Optional[jnp.dtype] = None,
    density_induced: int = 128,
    cnn_kernel_size: int = 19,
    use_pallas_setconv: bool = False,
):
    """The measured best GW-waveform configuration per model family — the
    north-star task's counterpart of `gp_model_1d` (the reference has no GW
    code; these settings are this repo's own measured results, RESULTS.md
    'GW waveform configs'):

    * parameter conditioning on (m1, m2, chi1, chi2): FiLM per-grid-point
      modulation for the conv family (7x better median mismatch than a
      global additive embedding at matched budget), additive for set/attn
      models (no grid to modulate);
    * `density_induced=128`: the flagship grid — resolves the late-inspiral
      chirp the default-64 grid aliases (train with context budgets scaled
      to match, see reproduce_gw --n-context 192);
    * latent models get the UNBOUNDED q(z) scale (`1e-4 + softplus`): the
      reference's default `0.1 + 0.9*sigmoid` floor (its base.py:432)
      injects irreducible grid-representation noise that caps phase
      precision — the diagnosed cause of latent-NP collapse on waveforms
      (mismatch 0.947 -> 0.337 at matched 50k steps from this one change).
    """
    base = gp_model_1d(
        name, r_dim=r_dim, dtype=dtype, cnn_kernel_size=cnn_kernel_size
    )
    kwargs = dict(
        cond_dim=4,
        cond_mode="film" if getattr(base, "_supports_film", False) else "add",
    )
    if hasattr(base, "density_induced"):
        kwargs.update(
            density_induced=density_induced,
            use_pallas_setconv=use_pallas_setconv,
        )
    if name in ("LNP", "AttnLNP", "ConvLNP"):
        kwargs.update(lat_scale_transform="softplus", min_lat_sigma=1e-4)
    return base.clone(**kwargs)


def gw_model_from_summary(summary: dict):
    """Rebuild the EXACT architecture of a finished reproduce_gw run from its
    summary.json, restoring every recorded knob — cnn kernel/dilations/arch/
    banded, induced density, parameter conditioning, the latent-scale
    transform (`no_lat_lb`), NPVI's q(z|C∪T) (`train_loss_objective=elbo`)
    and the Pallas SetConv switch.

    This is the single rebuild path for every frozen-run consumer
    (gw_eval_ctx / gw_viz); rebuilding by hand has twice produced silently
    wrong models (a cloned cnn_kernel_size no-op, and a dropped no_lat_lb
    that re-applied the 0.1 sigmoid floor this repo diagnosed as the
    latent-collapse cause)."""
    dilations = summary.get("cnn_dilations")
    model = gp_model_1d(
        summary["model"],
        cnn_kernel_size=summary.get("cnn_kernel_size") or 19,
        cnn_dilations=tuple(dilations) if dilations else None,
        cnn_arch=summary.get("cnn_arch", "cnn"),
        cnn_banded=bool(summary.get("cnn_banded", False)),
    )
    conditioned = bool(summary.get("conditioned"))
    model = model.clone(
        y_dim=1 if summary.get("mode", "time") == "time" else 2,
        cond_dim=4 if conditioned else 0,
        cond_mode=summary.get("cond_mode") or "film",
        **(
            {"use_pallas_setconv": True}
            if summary.get("use_pallas_setconv")
            else {}
        ),
        **(
            {"density_induced": summary["density_induced"]}
            if summary.get("density_induced")
            else {}
        ),
        **(
            {"lat_scale_transform": "softplus", "min_lat_sigma": 1e-4}
            if summary.get("no_lat_lb")
            else {}
        ),
    )
    if summary.get("train_loss_objective") == "elbo":
        model = model.clone(is_q_zCct=True, n_z_samples_train=1)
    return model


def gp_criterion(name: str):
    """The matching training objective (eval always forces NPML)."""
    if name in ("CNP", "AttnCNP", "ConvCNP"):
        return CNPFLoss()
    if name in ("LNP", "AttnLNP"):
        return ELBOLossLNPF()  # NPVI (requires is_q_zCct=True)
    if name == "ConvLNP":
        return NLLLossLNPF()  # NPML
    raise ValueError(name)


def gp_model_variant(
    name: str,
    is_elbo: bool,
    is_lat_lb: bool,
    is_sig_lb: bool,
    r_dim: int = R_DIM,
    dtype: Optional[jnp.dtype] = None,
    cnn_norm_eps: float = 1e-3,
    headline_arch: bool = False,
):
    """The Losses.ipynb objective-ablation variants (reference cell 6
    `lnpf_getters` + the ELBO x LatLB x SigLB grid whose eval.csvs populate
    results/models/RBF_Kernel/{LNP,AttnLNP,ConvLNP}_ELBO*_LatLB*_SigLB*):

    * ELBO (NPVI): is_q_zCct=True, n_z_train=1; NPML: is_q_zCct=False,
      n_z_train = 32 (LNP) / 8 (AttnLNP) / 16 (ConvLNP);
    * SigLB: min_sigma_pred = 0.01 (True) vs 1e-4 (False);
    * LatLB: q_z scale = the default 0.1+0.9*sigmoid (True) vs
      1e-4+(1-1e-4)*softplus (False);
    * ConvLNP ablation config differs from the pretrained headline config:
      z_dim=16, is_global=False, LINEAR x-discarding decoder, n_z_test=16
      (get_convlnp in Losses.ipynb). NOTE the reference's checked-in
      ablation *checkpoints* predate that notebook cell: their state dicts
      are z_dim=128 headline-architecture (latent_encoder.out is [256,128],
      no reshaper_z) — `headline_arch=True` builds that configuration
      (z_dim=r_dim, is_global=True) with the variant's scale transforms,
      for apples-to-apples runs against the recorded ablation artifacts."""
    from flax import linen as nn

    from .ops.encoders import discard_ith_arg

    mle = not is_elbo
    base = gp_model_1d(name, r_dim=r_dim, dtype=dtype, cnn_norm_eps=cnn_norm_eps)
    kwargs = dict(
        is_q_zCct=not mle,
        min_sigma_pred=0.01 if is_sig_lb else 1e-4,
    )
    if not is_lat_lb:
        kwargs.update(lat_scale_transform="softplus", min_lat_sigma=1e-4)
    if name == "LNP":
        kwargs.update(n_z_samples_train=32 if mle else 1, n_z_samples_test=32)
    elif name == "AttnLNP":
        kwargs.update(n_z_samples_train=8 if mle else 1, n_z_samples_test=8)
    elif name == "ConvLNP":
        kwargs.update(n_z_samples_train=16 if mle else 1, n_z_samples_test=16)
        if not headline_arch:
            kwargs.update(
                z_dim=16,
                is_global=False,
                Decoder=discard_ith_arg(
                    lambda n_out, name=None: nn.Dense(n_out, name=name), i=0
                ),
            )
    else:
        raise ValueError(f"{name} has no objective-ablation variant")
    return base.clone(**kwargs)


def variant_name(name: str, is_elbo: bool, is_lat_lb: bool, is_sig_lb: bool) -> str:
    """Reference run-dir naming (Losses.ipynb get_name)."""
    return f"{name}_ELBO{is_elbo}_LatLB{is_lat_lb}_SigLB{is_sig_lb}"

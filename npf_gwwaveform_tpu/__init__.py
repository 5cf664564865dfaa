"""npf_gwwaveform_tpu — a TPU-native JAX/Flax framework for the Neural Process Family
applied to gravitational-wave waveforms.

A ground-up rebuild of the capabilities of `MarinerQ/npf_GWwaveform` (the Neural
Process Family library: CNP / LNP / AttnCNP / AttnLNP / ConvCNP / ConvLNP /
GridConvCNP / GridConvLNP, their CNPF / ELBO / NPML / SUMO objectives, synthetic
GP-function + image datasets, and a training/eval harness) designed TPU-first:

* padded + masked point sets everywhere (static shapes for XLA),
* bfloat16 matmuls on the MXU with float32 log-prob reductions,
* `jax.sharding.Mesh` + data-parallel `jit` train steps with psum all-reduce,
* Pallas kernels for the SetConv hot path,
* a jit-compiled batched gravitational-waveform generator (IMRPhenomD-style)
  replacing the reference's CPU sklearn GP sampler.

Reference layer map: /root/reference SURVEY.md §1-2.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: GW long-waveform configs pay 250-830 s
# compile+chunk0 per process, and the experiment queue re-pays it on every
# warm-start leg / eval-only rescore of the same geometry. Opt out or
# redirect with JAX_COMPILATION_CACHE_DIR (an empty value disables).
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    try:
        # separate cache per platform env: CPU processes (tests) and
        # axon-tunnel TPU processes detect different machine features, and
        # cross-loading AOT results triggers feature-mismatch warnings
        _suffix = "_cpu" if _os.environ.get("JAX_PLATFORMS") == "cpu" else ""
        _jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache{_suffix}")
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # older jaxlib without the knob: cache is an optimization only
        pass

from . import configs, distributions, losses, notebooks
from .models import (
    CNP,
    LNP,
    AttnCNP,
    AttnLNP,
    ConvCNP,
    ConvLNP,
    GridConvCNP,
    GridConvLNP,
)
from .losses import CNPFLoss, ELBOLossLNPF, NLLLossLNPF, SUMOLossLNPF

__all__ = [
    "CNP",
    "LNP",
    "AttnCNP",
    "AttnLNP",
    "ConvCNP",
    "ConvLNP",
    "GridConvCNP",
    "GridConvLNP",
    "CNPFLoss",
    "ELBOLossLNPF",
    "NLLLossLNPF",
    "SUMOLossLNPF",
    "distributions",
    "losses",
    "configs",
    "notebooks",
]

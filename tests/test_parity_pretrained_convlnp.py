"""Golden parity for the PRETRAINED ConvLNP port (port_convlnp_pretrained):
the reference's checked-in ConvLNP checkpoint (BatchNorm CNNs, Linear
decoder, is_global — ConvLNP.ipynb config) loaded into this framework must
reproduce the torch model's deterministic surfaces: q(z|C) per grid point
and the post-sampling CNN (reference convnp.py:184-335).

Skips when the reference checkpoint or torch is unavailable."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")
npf_torch = pytest.importorskip("npf")

import jax
import jax.numpy as jnp

CKPT = "/root/reference/results/pretrained/RBF_Kernel/ConvLNP/run_0/params.pt"
pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference pretrained checkpoint absent"
)


@pytest.fixture(scope="module")
def ported():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from experiments.eval_pretrained import build_torch_model
    from npf_gwwaveform_tpu.utils.port_latent import port_convlnp_pretrained

    tm = build_torch_model("ConvLNP")
    tm.load_state_dict(torch.load(CKPT, map_location="cpu"))
    tm.eval()
    params, extra = port_convlnp_pretrained(tm)
    return tm, params, extra


def _inputs(seed=0, B=2, NC=9, NT=16):
    rng = np.random.default_rng(seed)
    x_c = np.sort(rng.uniform(-1, 1, (B, NC, 1)), axis=1).astype(np.float32)
    y_c = rng.normal(size=(B, NC, 1)).astype(np.float32)
    x_t = np.sort(rng.uniform(-1, 1, (B, NT, 1)), axis=1).astype(np.float32)
    return x_c, y_c, x_t


def test_pretrained_convlnp_q_zCc_parity(ported):
    """SetConv -> BN CNN -> latent encoder must reproduce torch's q(z|C)
    (loc and scale, per induced grid point)."""
    tm, params, extra = ported
    from npf_gwwaveform_tpu.configs import gp_model_1d

    model = gp_model_1d("ConvLNP", cnn_norm_eps=1e-5)
    x_c, y_c, x_t = _inputs(1)

    with torch.no_grad():
        _, _, q_zCc, _ = tm(
            torch.from_numpy(x_c), torch.from_numpy(y_c), torch.from_numpy(x_t)
        )
    t_loc = q_zCc.base_dist.loc.numpy()
    t_scale = q_zCc.base_dist.scale.numpy()

    out = model.apply(
        {"params": params, **extra},
        jnp.array(x_c),
        jnp.array(y_c),
        jnp.array(x_t),
        mask_cntxt=jnp.ones(x_c.shape[:2]),
        mask_trgt=jnp.ones(x_t.shape[:2]),
        train=False,
        rngs={"latent": jax.random.PRNGKey(0)},
    )
    j_loc = np.asarray(out.q_zCc.loc)
    j_scale = np.asarray(out.q_zCc.scale)
    np.testing.assert_allclose(
        j_loc.reshape(t_loc.shape), t_loc, atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        j_scale.reshape(t_scale.shape), t_scale, atol=5e-4, rtol=1e-3
    )


def test_pretrained_convlnp_post_sampling_cnn_parity(ported):
    """The post-sampling BN CNN (mixes z samples for coherence,
    ref convnp.py:237,289) with ported running stats must match torch
    eval-mode on identical inputs."""
    tm, params, extra = ported
    from npf_gwwaveform_tpu.ops.cnn import CNN

    rng = np.random.default_rng(2)
    h = rng.normal(size=(3, 192, 128)).astype(np.float32)

    with torch.no_grad():
        # reference CNN built is_chan_last=True: takes channel-last directly
        t_out = tm.induced_to_induced_post_sampling(torch.from_numpy(h))
        if isinstance(t_out, tuple):
            t_out = t_out[0]
        t_out = t_out.numpy()

    cnn = CNN(
        n_channels=128,
        n_blocks=4,
        kernel_size=19,
        norm="batch",
        block_kwargs={"n_conv_layers": 2, "norm_eps": 1e-5},
    )
    j_out = cnn.apply(
        {
            "params": params["induced_to_induced_post_sampling"],
            "batch_stats": extra["batch_stats"]["induced_to_induced_post_sampling"],
        },
        jnp.array(h),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-3, rtol=1e-3)

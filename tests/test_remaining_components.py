"""Coverage for the remaining SURVEY §2 components: all attention
mechanisms, all RBFs, Unet CNN + duplicate-batch bottleneck sharing,
super-resolution splitter, chunk cache, profiling utilities."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npf_gwwaveform_tpu import AttnCNP, ConvCNP, GridConvCNP
from npf_gwwaveform_tpu.data import (
    CntxtTrgtSplitter,
    GetRandomIndcs,
    ResolutionMasker,
    SuperresolutionCntxtTrgtSplitter,
    get_all_indcs,
)
from npf_gwwaveform_tpu.data.cache import NotLoadedError, load_chunk, save_chunk, train_dev_split
from npf_gwwaveform_tpu.data.images import DigitsDataset
from npf_gwwaveform_tpu.ops import CNN, MlpRBF, SetConv, UnetCNN, UnsharedExpRBF
from npf_gwwaveform_tpu.ops.attention import get_attender
from npf_gwwaveform_tpu.ops.selfattn import SelfAttention
from npf_gwwaveform_tpu.utils.profiling import StepTimer, compiled_stats

ATTENTIONS = [
    "dot",
    "scaledot",
    "multiplicative",
    "additive",
    "cosine",
    "manhattan",
    "euclidean",
    "weighted_dist",
    "multihead",
    "transformer",
]


@pytest.mark.parametrize("attention", ATTENTIONS)
def test_all_attenders_run_masked(key, attention):
    B, K, Q, D = 2, 7, 5, 16
    keys = jax.random.normal(key, (B, K, D))
    queries = jax.random.normal(key, (B, Q, D))
    values = jax.random.normal(key, (B, K, D))
    mask = jnp.array([[True] * 4 + [False] * 3] * B)

    att = get_attender(attention, D, D, D)
    params = att.init(jax.random.PRNGKey(0), keys, queries, values, mask_keys=mask)
    out = att.apply(params, keys, queries, values, mask_keys=mask)
    assert out.shape == (B, Q, D)
    assert np.isfinite(np.asarray(out)).all()
    # masked keys must not influence the output
    keys2 = keys.at[:, 4:].set(99.0)
    values2 = values.at[:, 4:].set(-55.0)
    out2 = att.apply(params, keys2, queries, values2, mask_keys=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)


@pytest.mark.parametrize("RBF", [UnsharedExpRBF, MlpRBF])
def test_setconv_other_rbfs(key, RBF):
    B, K, Q = 2, 8, 12
    keys = jax.random.uniform(key, (B, K, 1), minval=-1, maxval=1)
    queries = jax.random.uniform(key, (B, Q, 1), minval=-1, maxval=1)
    values = jax.random.normal(key, (B, K, 3))
    mask = jnp.array([[True] * 6 + [False] * 2] * B)
    sc = SetConv(out_channels=8, RadialBasisFunc=RBF)
    params = sc.init(jax.random.PRNGKey(0), keys, queries, values, mask)
    out = sc.apply(params, keys, queries, values, mask)
    assert out.shape == (B, Q, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_self_attention_stack(key):
    x = jax.random.normal(key, (2, 6, 16))
    mask = jnp.array([[True] * 4 + [False] * 2] * 2)
    sa = SelfAttention(out_dim=8, n_attn_layers=2)
    params = sa.init(jax.random.PRNGKey(0), x, mask=mask)
    out = sa.apply(params, x, mask=mask)
    assert out.shape == (2, 6, 8)


def test_attncnp_self_attn_encoder(key):
    model = AttnCNP(y_dim=1, x_dim=1, r_dim=16, is_self_attn=True)
    x = jax.random.uniform(key, (2, 8, 1), minval=-1, maxval=1)
    y = jax.random.normal(key, (2, 8, 1))
    v = model.init({"params": key, "latent": key}, x, y, x)
    out = model.apply(v, x, y, x, rngs={"latent": key})
    assert out.p_yCc.loc.shape == (1, 2, 8, 1)


def test_unet_cnn_and_shared_bottleneck(key):
    x = jax.random.normal(key, (4, 16, 8))
    unet = UnetCNN(n_channels=8, n_blocks=3, kernel_size=3, is_force_same_bottleneck=True)
    params = unet.init(jax.random.PRNGKey(0), x)
    out = unet.apply(params, x, train=True)
    assert out.shape == (4, 16, 8)
    # with forced bottleneck, halves see averaged bottlenecks: outputs for
    # duplicated inputs must be identical across the two halves
    x2 = jnp.concatenate([x[:2], x[:2]], axis=0)
    out2 = unet.apply(params, x2, train=True)
    np.testing.assert_allclose(
        np.asarray(out2[:2]), np.asarray(out2[2:]), atol=1e-5
    )


def test_duplicate_batch_splitter(key):
    sp = CntxtTrgtSplitter(
        contexts_getter=GetRandomIndcs(a=2, b=4),
        targets_getter=get_all_indcs,
        is_duplicate_batch=True,
    )
    x = jax.random.uniform(key, (3, 10, 1))
    y = jax.random.normal(key, (3, 10, 1))
    batch = sp(key, x, y)
    assert batch["X_cntxt"].shape[0] == 6
    # same functions in both halves, independent masks
    np.testing.assert_allclose(
        np.asarray(batch["Y_trgt"][:3]), np.asarray(batch["Y_trgt"][3:])
    )


def test_superresolution_splitter(key):
    ds = DigitsDataset(train=True, upscale=2)
    x, y = next(ds.epoch_batches(4))
    sp = SuperresolutionCntxtTrgtSplitter(resolution_factor=2)
    batch = sp(key, x, y)
    m = np.asarray(batch["mask_cntxt"])
    assert m.shape == (4, 16, 16)
    assert m[:, ::2, ::2].all() and not m[:, 1::2, :].any()
    # grid model consumes it directly
    model = GridConvCNP(
        y_dim=1, x_dim=1, r_dim=16, cnn_n_blocks=2, cnn_kernel_size=5,
        conv_kernel_size=5,
    )
    v = model.init(
        {"params": key, "latent": key},
        batch["X_cntxt"].astype(jnp.float32), batch["Y_cntxt"], batch["X_trgt"].astype(jnp.float32),
    )
    out = model.apply(
        v, batch["X_cntxt"].astype(jnp.float32), batch["Y_cntxt"],
        batch["X_trgt"].astype(jnp.float32), rngs={"latent": key},
    )
    assert out.p_yCc.loc.shape == (1, 4, 16, 16, 1)


def test_chunk_cache_roundtrip(tmp_path):
    f = str(tmp_path / "cache.h5")
    with pytest.raises(NotLoadedError):
        load_chunk({"a"}, f, 0)
    save_chunk({"a": np.arange(6).reshape(2, 3)}, f, 0)
    out = load_chunk({"a"}, f, 0)
    np.testing.assert_array_equal(out["a"], np.arange(6).reshape(2, 3))


def test_train_dev_split():
    ds = DigitsDataset(train=True, upscale=1)
    tr, dev = train_dev_split(ds, dev_size=0.25)
    assert len(tr) + len(dev) == len(ds)
    assert abs(len(dev) - 0.25 * len(ds)) <= 1


def test_profiling_utils():
    timer = StepTimer(items_per_step=32)
    timer.start()
    for _ in range(3):
        timer.tick()
    s = timer.summary()
    assert s["steps"] == 3 and s["items_per_s"] > 0

    stats = compiled_stats(lambda a, b: a @ b, jnp.ones((64, 64)), jnp.ones((64, 64)))
    assert stats["flops"] is None or stats["flops"] > 0


def test_probability_converter_golden_vs_torch():
    """ProbabilityConverter vs reference helpers.py:167-305: same outputs for
    sigmoid and hard-sigmoid on identical inputs (incl. min_p band rescale
    and initial_probability->bias), trainable flags expose params."""
    import pytest

    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/reference")
    from npf.utils.helpers import ProbabilityConverter as TorchPC

    import jax
    import jax.numpy as jnp
    import numpy as np

    from npf_gwwaveform_tpu.ops import ProbabilityConverter

    x = np.linspace(-4, 4, 33).astype(np.float32)
    for activation in ("sigmoid", "hard-sigmoid"):
        for min_p, p0, temp in ((0.0, 0.5, 1.0), (0.1, 0.3, 2.0)):
            tpc = TorchPC(
                min_p=min_p, activation=activation,
                initial_probability=p0, initial_temperature=temp,
            )
            with torch.no_grad():
                t_out = tpc(torch.from_numpy(x)).numpy()
            jpc = ProbabilityConverter(
                min_p=min_p, activation=activation,
                initial_probability=p0, initial_temperature=temp,
            )
            j_out, _ = jpc.init_with_output(jax.random.PRNGKey(0), jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-6)

    # trainable flags create params
    jpc = ProbabilityConverter(is_train_temperature=True, is_train_bias=True)
    v = jpc.init(jax.random.PRNGKey(0), jnp.zeros((3,)))
    assert set(v["params"]) == {"temperature", "bias"}

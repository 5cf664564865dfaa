"""Fixture tests for the file-gated image loaders (data/images.py
LocalNpzDataset + the mnist/svhn/celeba32 registry entries, mirroring
/root/reference/utils/data/imgs.py:83,148,509-617).

The environment has no egress, so these write tiny synthetic npz files and
prove the gated paths actually load real data when a file is provided.
"""

import os

import numpy as np
import pytest

from npf_gwwaveform_tpu.data.images import (
    DATASETS_DICT,
    LocalNpzDataset,
    get_train_test_img_dataset,
)


def _write_npz(path, shape, dtype=np.uint8, key="images"):
    rng = np.random.default_rng(0)
    if dtype == np.uint8:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    else:
        arr = rng.uniform(size=shape).astype(dtype)
    np.savez(path, **{key: arr})
    return arr


def test_local_npz_uint8_grayscale(tmp_path):
    # MNIST-style dump: uint8 [N, H, W] -> float32 [N, H, W, 1] in [0,1]
    arr = _write_npz(tmp_path / "mnist_train.npz", (16, 28, 28))
    ds = LocalNpzDataset("mnist", train=True, root=str(tmp_path))
    assert ds.shape == (28, 28, 1)
    imgs = np.asarray(ds.images)
    assert imgs.dtype == np.float32
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    np.testing.assert_allclose(imgs[..., 0], arr.astype(np.float32) / 255.0,
                               atol=1e-6)


def test_local_npz_float_rgb(tmp_path):
    # CelebA/SVHN-style dump: float [N, H, W, 3] already in [0,1] -> untouched
    arr = _write_npz(tmp_path / "celeba32_test.npz", (8, 32, 32, 3),
                     dtype=np.float32)
    ds = LocalNpzDataset("celeba32", train=False, root=str(tmp_path))
    assert ds.shape == (32, 32, 3)
    np.testing.assert_allclose(np.asarray(ds.images), arr, atol=1e-6)


def test_local_npz_missing_file_message(tmp_path):
    with pytest.raises(FileNotFoundError, match="mnist"):
        LocalNpzDataset("mnist", train=True, root=str(tmp_path / "nope"))


@pytest.mark.parametrize("name,chans", [("mnist", 1), ("svhn", 3),
                                        ("celeba32", 3)])
def test_registry_roundtrip(tmp_path, monkeypatch, name, chans):
    # the registry lambdas read data/{name}_{split}.npz relative to cwd:
    # build both splits and run the real get_train_test_img_dataset path
    monkeypatch.chdir(tmp_path)
    os.makedirs("data", exist_ok=True)
    shape = (12, 16, 16) if chans == 1 else (12, 16, 16, chans)
    _write_npz(os.path.join("data", f"{name}_train.npz"), shape)
    _write_npz(os.path.join("data", f"{name}_test.npz"), shape)
    tr, te = get_train_test_img_dataset(name)
    assert tr.shape == (16, 16, chans) and te.shape == (16, 16, chans)
    x, y = next(tr.epoch_batches(4))
    assert y.shape == (4, 16, 16, chans)
    assert name in DATASETS_DICT


def test_loaded_npz_trains_one_step(tmp_path):
    # prove a file-gated dataset flows through the training stack end to end
    import jax

    from npf_gwwaveform_tpu import GridConvCNP
    from npf_gwwaveform_tpu.data.datasplit import (
        GridCntxtTrgtSplitter,
        RandomMasker,
        no_masker,
    )
    from npf_gwwaveform_tpu.losses import CNPFLoss
    from npf_gwwaveform_tpu.training import (
        Trainer,
        create_train_state,
        make_optimizer,
    )

    _write_npz(tmp_path / "mnist_train.npz", (8, 12, 12))
    ds = LocalNpzDataset("mnist", train=True, root=str(tmp_path))
    model = GridConvCNP(y_dim=1, x_dim=1, r_dim=8, cnn_n_blocks=1,
                        cnn_kernel_size=3, conv_kernel_size=3)
    splitter = GridCntxtTrgtSplitter(context_masker=RandomMasker(a=0.0, b=0.3),
                                     target_masker=no_masker)
    tx = make_optimizer(lr=1e-3, decay_lr=None)
    trainer = Trainer(model, CNPFLoss(), tx, splitter=splitter)
    _, y = next(ds.epoch_batches(4))
    state = create_train_state(
        model, tx, splitter(jax.random.PRNGKey(0), y, y), seed=0
    )
    state, metrics = trainer._train_step(state, y, y)
    assert np.isfinite(float(metrics["loss"]))

"""Image datasets for the Grid* model families.

Parity target: /root/reference/utils/data/imgs.py — the dataset registry
(`DATASETS_DICT` :26-39, `get_train_test_img_dataset` :45-55), MNIST/SVHN
wrappers (:83-190), the generated `ZeroShotMultiMNIST` zero-shot-extrapolation
sets (train = padded single digits, test = two translated digits, :191-394),
`SingleImage` (:485) and CelebA (:509-617).

This environment has no network egress and no torchvision, so:
* `digits*` datasets are built from sklearn's bundled 8x8 digits
  (`sklearn.datasets.load_digits` — ships offline) upscaled to the requested
  resolution; they play the role MNIST plays in the reference;
* `zs_multi_digits` reproduces the ZeroShotMultiMNIST construction (train:
  one centred digit on a padded canvas; test: TWO independently translated
  digits on a wider canvas) from the same sklearn digits;
* `mnist` / `celeba32` load from local npz/folder paths when present and
  raise a clear error otherwise (registry entries kept for API parity).

All datasets yield float32 grids in [0, 1], channel-last [B, H, W, C], as
device arrays, with `epoch_batches` mirroring the GPDataset API.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "GridImageDataset",
    "DigitsDataset",
    "RGBDigitsDataset",
    "ZeroShotMultiDigits",
    "SingleImage",
    "DATASETS_DICT",
    "get_train_test_img_dataset",
]


class GridImageDataset:
    """Base: a fixed array of images [N, H, W, C] in [0,1]."""

    def __init__(self, images: np.ndarray, seed: int = 0):
        assert images.ndim == 4
        self.images = jnp.asarray(images, jnp.float32)
        self.n_samples = images.shape[0]
        self._key = jax.random.PRNGKey(seed)

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.images.shape[1:])

    def __len__(self):
        return self.n_samples

    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def epoch_batches(self, batch_size: int, shuffle: bool = True, key=None):
        n = self.n_samples
        k = self.next_key() if key is None else key
        order = (
            jax.random.permutation(k, n) if shuffle else jnp.arange(n)
        )
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i : i + batch_size]
            img = self.images[idx]
            # (x, y) tuple for trainer-API uniformity: the grid splitter
            # derives context masks from y and ignores x
            yield img, img

    def get_samples(self, n_samples=None, key=None):
        n = n_samples or self.n_samples
        k = self.next_key() if key is None else key
        idx = jax.random.permutation(k, self.n_samples)[:n]
        return self.images[idx]


def _load_sklearn_digits(upscale: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """8x8 sklearn digits -> [N, 8*u, 8*u, 1] in [0,1] with nearest upscale."""
    from sklearn.datasets import load_digits

    d = load_digits()
    imgs = d.images.astype(np.float32) / 16.0  # [N, 8, 8]
    if upscale > 1:
        imgs = imgs.repeat(upscale, axis=1).repeat(upscale, axis=2)
    return imgs[..., None], d.target


class DigitsDataset(GridImageDataset):
    """Offline MNIST stand-in from sklearn digits (default 32x32)."""

    def __init__(self, train: bool = True, upscale: int = 4, seed: int = 0):
        imgs, labels = _load_sklearn_digits(upscale)
        n = imgs.shape[0]
        split = int(0.9 * n)
        rng = np.random.default_rng(0)
        order = rng.permutation(n)
        sel = order[:split] if train else order[split:]
        self.labels = labels[sel]
        super().__init__(imgs[sel], seed=seed)


class ZeroShotMultiDigits(GridImageDataset):
    """Faithful reproduction of the reference's `zsmms`
    (ZeroShotMultiMNISTscale, imgs.py:376-394 + 191-373) on the offline
    digits corpus:

    train=True  -> ONE digit randomly translated on a canvas slightly larger
                   than the digit (the reference random-crops 28px MNIST to
                   32px with padding 5; here 16px digits on a 20px canvas,
                   same +25% headroom);
    train=False -> TWO digits on a canvas of side 2x the digit (56px there,
                   32px here), built with the reference's strip scheme
                   (make_multi_mnist_test, imgs.py:310-355): each digit is
                   shifted uniformly along one "varying" axis inside a
                   digit-height strip, the two strips are concatenated along
                   the other axis; half the test set varies axis 0, half
                   axis 1.

    The test canvas is LARGER than the train canvas — the zero-shot
    extrapolation that only translation-equivariant models survive
    (BASELINE.md zsmms row: ConvCNP 1253 vs CNP -58552).
    """

    def __init__(
        self,
        train: bool = True,
        upscale: int = 2,
        n_test: int = 1024,
        seed: int = 123,
    ):
        imgs, _ = _load_sklearn_digits(upscale)
        n, h, w, _ = imgs.shape
        rng = np.random.default_rng(seed)
        if train:
            H = W = h + h // 4  # 20 for 16px digits (≈ 32/28 of MNIST)
            canvas = np.zeros((n, H, W, 1), np.float32)
            tops = rng.integers(0, H - h + 1, n)
            lefts = rng.integers(0, W - w + 1, n)
            for i in range(n):
                canvas[i, tops[i] : tops[i] + h, lefts[i] : lefts[i] + w] = imgs[i]
        else:
            F = 2 * h  # final canvas side
            canvas = np.zeros((n_test, F, F, 1), np.float32)
            axes = rng.permutation(np.arange(n_test) % 2)
            for i in range(n_test):
                ax = axes[i]
                strips = []
                for _ in range(2):
                    strip_shape = (F, w) if ax == 0 else (h, F)
                    strip = np.zeros(strip_shape, np.float32)
                    shift = rng.integers(0, F - (h if ax == 0 else w) + 1)
                    j = rng.integers(n)
                    if ax == 0:
                        strip[shift : shift + h, :] = imgs[j, ..., 0]
                    else:
                        strip[:, shift : shift + w] = imgs[j, ..., 0]
                    strips.append(strip)
                canvas[i, ..., 0] = np.concatenate(strips, axis=1 - ax)
        super().__init__(canvas, seed=seed)

    @property
    def test_upscale_factor(self) -> float:
        """Coordinate-range ratio test/train canvas (ref
        get_test_upscale_factor: 56/32 = 1.75 for zsmms; 32/20 = 1.6 here)."""
        return 32.0 / 20.0


class RGBDigitsDataset(GridImageDataset):
    """Offline CelebA32 stand-in: sklearn digits colorized to 32x32x3.

    The reference's CelebA32 row (BASELINE.md; config ConvCNP.ipynb
    `model_2d` with y_dim=3) is its only multi-channel benchmark; CelebA
    itself needs network egress, so this corpus plays its role the way
    `digits` plays MNIST's: each digit gets a per-image random foreground
    color in [0.3, 1]^3 and background tint in [0, 0.25]^3, making every
    channel carry the digit's structure at a DIFFERENT amplitude. That
    exercises the multi-channel model path for real: per-channel abs-conv
    density normalization (ref npf/neuralproc/gridconvnp.py:83-90,
    `groups=y_dim`), channel-concat resize ([signal_3, density_3] -> r_dim),
    and heteroskedastic per-channel output scales. Colors are seeded, so the
    corpus is reproducible without checked-in binaries."""

    def __init__(self, train: bool = True, upscale: int = 4, seed: int = 0):
        imgs, labels = _load_sklearn_digits(upscale)  # [N, H, W, 1]
        n = imgs.shape[0]
        rng = np.random.default_rng(7)
        fg = rng.uniform(0.3, 1.0, (n, 1, 1, 3)).astype(np.float32)
        bg = rng.uniform(0.0, 0.25, (n, 1, 1, 3)).astype(np.float32)
        rgb = bg + imgs * (fg - bg)  # digit intensity interpolates bg -> fg
        split = int(0.9 * n)
        order = np.random.default_rng(0).permutation(n)  # same folds as DigitsDataset
        sel = order[:split] if train else order[split:]
        self.labels = labels[sel]
        super().__init__(rgb[sel], seed=seed)


class RGBDigitsMosaicDataset(GridImageDataset):
    """Offline CelebA128 stand-in: 128x128x3 mosaics of colorized digits.

    The reference's large-image scale axis is ConvCNPXL on 128x128 CelebA
    (ConvCNP.ipynb `model_2d_XL`, 12 blocks k=9; checkpoints at
    results/pretrained/celeba128/ConvCNPXL). CelebA needs egress, so this
    corpus plays celeba128's role the way `rgb_digits` plays CelebA32's:
    each image is a 2x2 grid of four DIFFERENT digits (8x8 -> 64x64
    nearest-upscaled), each tile independently colorized (foreground in
    [0.3,1]^3, background tint in [0,0.25]^3). The mosaic gives the deep
    12-block CNN multi-object structure at two scales — per-tile digit
    strokes and cross-tile color boundaries — instead of one flat upscaled
    glyph. Tiles are drawn from the same train/test digit folds as
    DigitsDataset, so no digit leaks across the split; all draws are
    seeded (reproducible without checked-in binaries)."""

    def __init__(self, train: bool = True, n_images: int = None, seed: int = 0):
        imgs, _ = _load_sklearn_digits(upscale=8)  # [N, 64, 64, 1]
        n = imgs.shape[0]
        split = int(0.9 * n)
        order = np.random.default_rng(0).permutation(n)  # DigitsDataset folds
        pool = imgs[order[:split] if train else order[split:]]
        if n_images is None:
            n_images = 1024 if train else 256
        rng = np.random.default_rng(11 if train else 12)
        idx = rng.integers(0, len(pool), (n_images, 4))
        fg = rng.uniform(0.3, 1.0, (n_images, 4, 1, 1, 3)).astype(np.float32)
        bg = rng.uniform(0.0, 0.25, (n_images, 4, 1, 1, 3)).astype(np.float32)
        tiles = bg + pool[idx] * (fg - bg)  # [M, 4, 64, 64, 3]
        top = np.concatenate([tiles[:, 0], tiles[:, 1]], axis=2)
        bot = np.concatenate([tiles[:, 2], tiles[:, 3]], axis=2)
        super().__init__(np.concatenate([top, bot], axis=1), seed=seed)


class SingleImage(GridImageDataset):
    """Dataset of random crops-as-batches of ONE large image
    (ref imgs.py:485-506). Used for structured-image in-painting demos."""

    def __init__(self, image: np.ndarray, n_samples: int = 128, seed: int = 0):
        if image.ndim == 2:
            image = image[..., None]
        imgs = np.repeat(image[None].astype(np.float32), n_samples, axis=0)
        super().__init__(imgs, seed=seed)


def _load_local_npz(path: str, key_img: str = "images") -> np.ndarray:
    data = np.load(path)
    imgs = data[key_img].astype(np.float32)
    if imgs.max() > 1.5:
        imgs = imgs / 255.0
    if imgs.ndim == 3:
        imgs = imgs[..., None]
    return imgs


class LocalNpzDataset(GridImageDataset):
    """File-gated loader for real datasets (MNIST/CelebA dumps) placed at
    `data/{name}_{train|test}.npz` with an `images` array. Keeps registry
    parity in a zero-egress environment."""

    def __init__(self, name: str, train: bool = True, root: str = "data", seed: int = 0):
        split = "train" if train else "test"
        path = os.path.join(root, f"{name}_{split}.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{name}: place an npz with an 'images' array at {path} "
                f"(no network egress to download it here)"
            )
        super().__init__(_load_local_npz(path), seed=seed)


DATASETS_DICT = {
    "digits": DigitsDataset,
    "rgb_digits": RGBDigitsDataset,
    "rgb_digits128": RGBDigitsMosaicDataset,
    "digits16": lambda train=True, seed=0: DigitsDataset(train, upscale=2, seed=seed),
    "zs_multi_digits": ZeroShotMultiDigits,
    "zsmms": ZeroShotMultiDigits,  # reference alias
    "mnist": lambda train=True, seed=0: LocalNpzDataset("mnist", train, seed=seed),
    "celeba32": lambda train=True, seed=0: LocalNpzDataset("celeba32", train, seed=seed),
    "svhn": lambda train=True, seed=0: LocalNpzDataset("svhn", train, seed=seed),
}


def get_train_test_img_dataset(name: str, seed: int = 0):
    """(train, test) pair by registry name (ref imgs.py:45-55)."""
    try:
        ctor = DATASETS_DICT[name]
    except KeyError:
        raise KeyError(f"Unknown image dataset {name}; have {list(DATASETS_DICT)}")
    return ctor(train=True, seed=seed), ctor(train=False, seed=seed + 1)

"""h5py chunk cache + dataset split helpers.

Parity target: /root/reference/utils/data/helpers.py — `load_chunk` /
`save_chunk` / `NotLoadedError` (:174-231) used to pin fixed test/valid
chunks to disk, and `train_dev_split` (:42-113).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple, Union

import numpy as np

__all__ = ["NotLoadedError", "save_chunk", "load_chunk", "train_dev_split"]


class NotLoadedError(Exception):
    pass


def _resolve(save_file):
    if save_file is None:
        raise NotLoadedError("no save_file given")
    if isinstance(save_file, tuple):
        return save_file
    return save_file, None


def save_chunk(to_save: Dict[str, np.ndarray], save_file, idx_chunk=None):
    """Save named arrays into an hdf5 file (optionally under group/chunk)."""
    if save_file is None:
        return
    import h5py

    path, group = _resolve(save_file)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    prefix = "" if group is None else f"{group}/"
    if idx_chunk is not None:
        prefix += f"chunk_{idx_chunk}/"
    with h5py.File(path, "a") as f:
        for name, arr in to_save.items():
            key = prefix + name
            if key in f:
                del f[key]
            f.create_dataset(key, data=np.asarray(arr))


def load_chunk(keys: Sequence[str], save_file, idx_chunk=None) -> Dict[str, np.ndarray]:
    """Load named arrays; raises NotLoadedError when absent (the caller then
    regenerates — the reference's cache-or-compute pattern)."""
    import h5py

    path, group = _resolve(save_file)
    if not os.path.exists(path):
        raise NotLoadedError(path)
    prefix = "" if group is None else f"{group}/"
    if idx_chunk is not None:
        prefix += f"chunk_{idx_chunk}/"
    out = {}
    with h5py.File(path, "r") as f:
        for name in keys:
            key = prefix + name
            if key not in f:
                raise NotLoadedError(key)
            out[name] = f[key][()]
    return out


def train_dev_split(dataset, dev_size: Union[int, float] = 0.1, seed: int = 0):
    """Split a GridImageDataset-like object into (train, dev) subsets
    (ref utils/data/helpers.py:42-113)."""
    import jax.numpy as jnp

    n = len(dataset)
    n_dev = int(dev_size * n) if isinstance(dev_size, float) else dev_size
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    from .images import GridImageDataset

    imgs = np.asarray(dataset.images)
    dev = GridImageDataset(imgs[order[:n_dev]], seed=seed)
    train = GridImageDataset(imgs[order[n_dev:]], seed=seed + 1)
    return train, dev

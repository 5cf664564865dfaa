"""Device mesh + sharding layout for data-parallel NPF training.

The reference is single-process single-device (utils/train.py:163-164 is its
entire device management; SURVEY.md §2.7). The TPU-native equivalent required
by the north star: a `jax.sharding.Mesh` with a `data` axis, waveform batches
sharded along it, parameters replicated, and the gradient all-reduce emitted
by XLA as a psum over ICI when the loss is averaged under `jit`.

NPF models are small (R_DIM=128 => < 1M params), so data parallelism is the
only profitable axis; the mesh is built 1-D by default but `make_mesh` takes
an arbitrary axis dict so tensor/sequence axes can be added later without
touching call sites.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axes: Optional[Dict[str, int]] = None,
) -> Mesh:
    """Build a mesh. axes maps axis name -> size; a single -1 axis takes all
    remaining devices. Default: 1-D ('data',) over every device."""
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {DATA_AXIS: -1}
    names = list(axes.keys())
    sizes = list(axes.values())
    n = len(devices)
    fixed = int(np.prod([s for s in sizes if s != -1])) if sizes else 1
    sizes = [n // fixed if s == -1 else s for s in sizes]
    assert int(np.prod(sizes)) == n, f"mesh {sizes} != {n} devices"
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names=names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in a (possibly nested) batch with its leading dim
    sharded across the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

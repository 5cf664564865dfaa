"""Device mesh + sharding layout for data-parallel NPF training.

The reference is single-process single-device (utils/train.py:163-164 is its
entire device management; SURVEY.md §2.7). The TPU-native equivalent required
by the north star: a `jax.sharding.Mesh` with a `data` axis, waveform batches
sharded along it, parameters replicated, and the gradient all-reduce emitted
by XLA as a psum over ICI when the loss is averaged under `jit`.

NPF models are small (R_DIM=128 => < 1M params), so data parallelism is the
default axis. For LONG waveforms the time axis is additionally shardable
(SURVEY.md §5.7: "the time axis should be a shardable dimension in the mesh
layout for long waveforms"): build the mesh with a `seq` axis
(`make_mesh(axes={"data": d, "seq": s})`) and the Trainer constrains the
target-side arrays to P("data", "seq"). The grid->target SetConv decode and
the decoder MLP are pointwise over targets, so GSPMD partitions them with
zero communication and per-device target activations shrink by the seq
factor; the only collective added is the psum over `seq` in the loss
reduction. Context arrays and the induced grid stay replicated over `seq`
(the grid is small; the context->grid encode is the Pallas kernel's job).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"

# target-side batch keys whose 2nd dim is the (padded) target/time axis
_TARGET_KEYS = ("X_trgt", "Y_trgt", "mask_trgt")


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


def has_seq_axis(mesh: Optional[Mesh]) -> bool:
    return mesh is not None and SEQ_AXIS in mesh.axis_names


def constrain_targets_seq(batch: dict, mesh: Mesh) -> dict:
    """Inside a jitted step: pin the split batch's target-side arrays to
    P('data', 'seq') so XLA partitions the decode + loss over the mesh's
    sequence axis (long-waveform regime). Context-side arrays keep their
    propagated P('data') sharding. No-op for meshes without a `seq` axis."""
    if not has_seq_axis(mesh):
        return batch
    out = dict(batch)
    for k in _TARGET_KEYS:
        v = out.get(k)
        if v is not None:
            spec = P(DATA_AXIS, SEQ_AXIS, *([None] * (v.ndim - 2)))
            out[k] = jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, spec)
            )
    return out

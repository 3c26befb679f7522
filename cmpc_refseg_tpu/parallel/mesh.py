"""Mesh + sharding helpers.

The reference is single-process single-GPU (SURVEY.md section 5.8); the
TPU-native scaling story is a `jax.sharding.Mesh` with a 'data' axis (and an
optional 'model' axis reserved for sharding the big fusion matmuls at higher
resolutions).  Training steps are written as GLOBAL-batch functions under
`jit`; with batch inputs sharded over 'data' and params replicated, GSPMD
inserts the gradient all-reduce over ICI automatically — no hand-written
collectives in the train path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """1-D data mesh by default; pass shape=(d, m) + axis_names=('data',
    'model') for a 2-D mesh."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis mesh")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, *, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, *, axis: str = "data") -> dict:
    """device_put every array with its leading dim sharded over `axis`.
    Host arrays must have batch divisible by the axis size."""
    sh = data_sharding(mesh, axis=axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def tp_shardings(tree, mesh: Mesh, *, axis: str = "model",
                 min_dim: int = 512):
    """Tensor-parallel sharding pytree: every array leaf whose LAST dim is
    divisible by the 'model' axis size and >= min_dim is sharded over that
    axis (output-channel parallelism — the natural TP layout for this
    model's 1x1-conv/matmul-dominated head: XLA partitions the matmuls and
    inserts the all-gathers/psums over ICI); everything else replicates.

    Apply to params/optimizer state with ``jax.device_put(tree,
    tp_shardings(tree, mesh))``; jit then infers shardings from inputs.
    """
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no {axis!r} axis: {mesh.axis_names}")
    size = mesh.shape[axis]

    def leaf_sharding(x):
        shape = getattr(x, "shape", ())
        if (len(shape) >= 1 and shape[-1] >= min_dim
                and shape[-1] % size == 0):
            spec = [None] * (len(shape) - 1) + [axis]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf_sharding, tree)

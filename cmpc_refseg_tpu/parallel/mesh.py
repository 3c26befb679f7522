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

import contextlib
import contextvars
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Active data-parallel mesh context: set by multi-chip drivers so that
# batch-row-local fused Pallas kernels can wrap themselves in
# jax.shard_map over the data axis (the custom calls carry no GSPMD
# partitioning rule; shard_map gives them one for free because every
# kernel is per-sample).  See ops/fused_dispatch.py.
_DATA_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "cmpc_data_mesh", default=None)


@contextlib.contextmanager
def data_parallel_dispatch(mesh: Optional[Mesh], axis: str = "data"):
    """Declare `mesh` as the active data-parallel mesh for fused-kernel
    dispatch.  Enter this around jit TRACING of multi-chip inference flows
    (evaluate_sharded, dryrun_multichip); single-chip flows need nothing.
    mesh=None is a no-op passthrough (callers can pass their maybe-None
    mesh unconditionally)."""
    if mesh is None:
        yield
        return
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no {axis!r} axis: {mesh.axis_names}")
    token = _DATA_MESH.set((mesh, axis))
    try:
        yield
    finally:
        _DATA_MESH.reset(token)


def active_data_mesh():
    """(mesh, axis) of the active data-parallel dispatch context, or None."""
    return _DATA_MESH.get()


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host entry (SURVEY.md section 5.8: gradient all-reduce over ICI
    within a host's chips, DCN across hosts).  Call ONCE before any other
    jax API; arguments default to the cluster environment (TPU pods
    auto-discover; GPU/CPU clusters use JAX_COORDINATOR_ADDRESS etc.).

    After this, `jax.devices()` is global, `jax.local_devices()` is this
    process's slice, and `make_mesh()` spans all hosts — train steps written
    as global-batch jit functions need no further changes."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_primary_process() -> bool:
    """True on the process that should checkpoint/log (process 0)."""
    return jax.process_index() == 0


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
    """Shard every array's leading (batch) dim over `axis`.

    Single process: a plain device_put with the sharding.  Multi-host
    (jax.process_count() > 1): each process passes its PROCESS-LOCAL batch
    slice (global_batch / process_count rows, in process-index order) and
    `jax.make_array_from_process_local_data` assembles the global array —
    no host-global array ever materializes.  Batch must divide evenly."""
    sh = data_sharding(mesh, axis=axis)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def global_batch_from_local(batch: dict, mesh: Mesh, *,
                            axis: str = "data") -> dict:
    """Always-global assembly via make_array_from_process_local_data (the
    multi-host input path, callable in single-process too — there the local
    slice IS the global batch).  shard_batch dispatches to this
    automatically when process_count > 1."""
    sh = data_sharding(mesh, axis=axis)
    return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in batch.items()}


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
    return jax.tree.map(tp_leaf_rule(mesh, axis=axis, min_dim=min_dim),
                        tree)


def tp_leaf_rule(mesh: Mesh, *, axis: str = "model", min_dim: int = 512):
    """Leaf -> NamedSharding rule behind tp_shardings, reusable as a
    trace-time constraint: `make_train_step(cfg, tp_rule=tp_leaf_rule(mesh))`
    applies it to every unraveled weight inside the step
    (jax.lax.with_sharding_constraint), which is how the flat-trainable
    layout expresses tensor parallelism — the master vector stays
    ZeRO-sharded while the compute-time weight views partition their output
    channels over 'model'."""
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

    return leaf_sharding

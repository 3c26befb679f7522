"""Dispatch policy for the fused Pallas kernels (ops/pallas_kernels.py).

Decides per call site (a) whether the fused kernel runs at all and (b) how it
partitions over a multi-chip mesh.  All four fused surfaces — mutan, ConvLSTM
step, graph conv, SE-sum (reference math CMPC_model.py:245-328,
util/cell.py:36-79) — are batch-row-local, so on a data-parallel mesh they
shard exactly by wrapping the kernel in ``jax.shard_map`` over the data axis:
each device runs the identical kernel on its local batch rows and no
collective is needed inside.  The active mesh comes from
``parallel.mesh.data_parallel_dispatch`` (multi-chip drivers enter it around
trace time); without one on a single chip the kernel runs unwrapped.

Mode control (``CMPC_FUSED`` env var):

- ``auto`` (default): fused on TPU, subject to the caller's batch gate; on a
  multi-chip TPU process the fused path additionally requires an active
  data-parallel dispatch context (otherwise GSPMD would replicate the
  un-partitionable custom call — the XLA path is faster than that).
- ``on``: fused on TPU regardless of batch size (latency experiments).
- ``off``: plain XLA everywhere.  ``CMPC_DISABLE_FUSED=1`` is the legacy
  debug alias.
- ``interpret``: force the fused path in Pallas interpret mode on ANY
  platform — the CPU-mesh test hook that exercises the exact shard_map
  dispatch the TPU multi-chip path uses.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import PartitionSpec as P

from cmpc_refseg_tpu.parallel.mesh import active_data_mesh


def fused_mode(batch: Optional[int] = None, min_batch: int = 1,
               kernel: Optional[str] = None) -> Optional[bool]:
    """None = use the XLA path; False = fused (compiled); True = fused in
    interpret mode.  `batch`/`min_batch`: the caller's profitability gate
    (measured: ConvLSTM/graph/SE-sum kernels win at batch >= 4, degenerate
    below — see cmpc._use_fused_kernels history).  `kernel`: name for a
    per-kernel override env var CMPC_FUSED_<KERNEL> (same values as
    CMPC_FUSED; used for A/B attribution of per-surface wins)."""
    env = os.environ.get("CMPC_FUSED", "auto").lower()
    if kernel:
        env = os.environ.get(f"CMPC_FUSED_{kernel.upper()}", env).lower()
    if env in ("off", "0") or os.environ.get("CMPC_DISABLE_FUSED"):
        return None
    if env == "interpret":
        return True
    if jax.devices()[0].platform != "tpu":
        return None
    if env != "on" and batch is not None and batch < min_batch:
        return None
    if len(jax.devices()) > 1 and active_data_mesh() is None:
        # Multi-chip GSPMD without a declared data mesh: no partitioning
        # rule exists for the custom calls, so the XLA path is the fast one.
        return None
    return False


def shard_rows(fn, in_batched, out_batched):
    """Wrap `fn` in jax.shard_map over the active data mesh (no-op without
    one).  `in_batched`: bool per positional arg — True shards that arg's
    LEADING dim over the data axis (trailing dims replicated), False
    replicates the whole (pytree) arg.  `out_batched`: same for outputs
    (single bool, or tuple for multi-output fns).  Only valid for fns whose
    computation is batch-row-local."""
    ctx = active_data_mesh()
    if ctx is None:
        return fn
    mesh, axis = ctx

    def spec(b):
        return P(axis) if b else P()

    in_specs = tuple(spec(b) for b in in_batched)
    if isinstance(out_batched, (tuple, list)):
        out_specs = tuple(spec(b) for b in out_batched)
    else:
        out_specs = spec(out_batched)
    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation; the kernels are row-local (no collectives inside), so the
    # replication check adds nothing here.
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)

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

import contextlib
import os
from typing import Optional

import jax
from jax.sharding import PartitionSpec as P

from cmpc_refseg_tpu.parallel.mesh import active_data_mesh

# Measured per-variant small-batch dispatch winners (LATENCY.json bs=1 A/B,
# v5e-1, bf16, 320x320): for these variants CMPC_FUSED=on — all fused
# kernels engaged even below the generic bs>=4 profitability gate — beat
# `auto` by >3% at bs=1 (e.g. v2 3.98->3.06 ms, BiLSTM_T 3.42->2.59,
# v5_BiLSTM 5.90->3.68).  `auto` now applies those winners by default; the
# CMPC_FUSED[_<KERNEL>] env vars remain as overrides.  Variants measurably
# better with the gated default (v4 3.01 vs 3.70 on, v5, BiLSTM_T2) and the
# video model (fused trio costs ~11 clips/s at its internal b=1 spa-graph,
# BASELINE.md reconciliation) are deliberately absent.
SMALL_BATCH_FUSED_VARIANTS = frozenset({
    "CMPC_model",
    "CMPCv2_model",
    "CMPCv3_model",
    "CMPCv4_BiLSTM_T_model",
    "CMPCv4_BERT_model",
    "CMPCv5_BiLSTM_model",
    # r5 A/B (LATENCY_r5_addendum.json): on 2.37 vs auto 3.42 ms.  The
    # last two "no A/B yet" rows measured auto-wins and stay out
    # (v5_BiLSTM_HSV 3.84 vs 4.02, v6_plus 4.34 vs 4.37).
    "CMPCv5_HSV_model",
})

_active_variant: Optional[str] = None
_force_xla_only = False


@contextlib.contextmanager
def xla_only_dispatch():
    """Force the plain-XLA path for EVERY fused surface, overriding the
    CMPC_FUSED[_<KERNEL>] env vars too.  Serving export traces under this
    (serving/export.py): a Pallas `tpu_custom_call` baked into a
    StableHLO/SavedModel artifact has undefined portability off the
    exporting host, so exported artifacts must stay custom-call-free."""
    global _force_xla_only
    prev = _force_xla_only
    _force_xla_only = True
    try:
        yield
    finally:
        _force_xla_only = prev


@contextlib.contextmanager
def variant_dispatch(name: str):
    """Declare the model variant being traced so fused_mode can consult the
    measured per-variant dispatch table (apply_model enters this around the
    forward body; custom_vjp call sites cannot carry the config)."""
    global _active_variant
    prev = _active_variant
    _active_variant = name or None
    try:
        yield
    finally:
        _active_variant = prev


def _policy(env: str, platform: str, n_devices: int,
            batch: Optional[int], min_batch: int,
            variant: Optional[str],
            data_axis_size: Optional[int]) -> Optional[bool]:
    """Pure dispatch decision (unit-testable off-TPU).  Args mirror
    fused_mode's runtime lookups; `data_axis_size` is the active
    data-parallel mesh axis extent (None = no dispatch context)."""
    if env == "interpret":
        return True
    if platform != "tpu":
        return None
    if env != "on" and batch is not None:
        if data_axis_size is not None:
            # The gate protects PER-DEVICE kernel profitability: under
            # shard_map each device runs batch/axis rows (round-3 advisor:
            # comparing the global batch silently ran the kernels in the
            # measured-slower small-batch regime on large data meshes).
            batch = max(1, batch // data_axis_size)
        if (batch < min_batch
                and variant not in SMALL_BATCH_FUSED_VARIANTS):
            return None
    if n_devices > 1 and data_axis_size is None:
        # Multi-chip GSPMD without a declared data mesh: no partitioning
        # rule exists for the custom calls, so the XLA path is the fast one.
        return None
    return False


def fused_mode(batch: Optional[int] = None, min_batch: int = 1,
               kernel: Optional[str] = None) -> Optional[bool]:
    """None = use the XLA path; False = fused (compiled); True = fused in
    interpret mode.  `batch`/`min_batch`: the caller's profitability gate
    (measured: ConvLSTM/graph/SE-sum kernels win at batch >= 4, degenerate
    below — see cmpc._use_fused_kernels history).  `batch` is the GLOBAL
    batch at the call site; under an active data-parallel dispatch context
    the gate compares the PER-DEVICE rows (batch / mesh data-axis size) —
    that is what each device's kernel instance actually runs on.  Below the
    gate, variants in SMALL_BATCH_FUSED_VARIANTS still run fused (measured
    bs=1 winners — no env var needed).  `kernel`: name for a per-kernel
    override env var CMPC_FUSED_<KERNEL> (same values as CMPC_FUSED; used
    for A/B attribution of per-surface wins)."""
    if _force_xla_only:
        return None
    env = os.environ.get("CMPC_FUSED", "auto").lower()
    if kernel:
        env = os.environ.get(f"CMPC_FUSED_{kernel.upper()}", env).lower()
    if env in ("off", "0") or os.environ.get("CMPC_DISABLE_FUSED"):
        return None
    ctx = active_data_mesh()
    axis_size = None
    if ctx is not None:
        mesh, axis = ctx
        axis_size = mesh.shape[axis]
    return _policy(env, jax.devices()[0].platform, len(jax.devices()),
                   batch, min_batch, _active_variant, axis_size)


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

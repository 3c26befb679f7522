"""Checkpointing via Orbax (reference: tf.train.Saver snapshots per epoch /
every `snapshot` iters with max_to_keep=4, trainval_model.py:56,136-142).

Also hosts the TF-checkpoint -> JAX converter entry point (tools/convert_tf_checkpoint.py
does the heavy name mapping)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _manager(directory: str, max_to_keep: int = 4):
    import orbax.checkpoint as ocp
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                           create=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_checkpoint(directory: str, state: Any, step: int,
                    max_to_keep: int = 4) -> None:
    import orbax.checkpoint as ocp
    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def latest_step(directory: str) -> Optional[int]:
    mgr = _manager(directory)
    return mgr.latest_step()


def restore_checkpoint(directory: str, target: Any,
                       step: Optional[int] = None) -> Any:
    """Restore into the structure of `target` (a TrainState or pytree)."""
    import orbax.checkpoint as ocp
    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not isinstance(x, jax.ShapeDtypeStruct) else x, target)
    return mgr.restore(step, args=ocp.args.StandardRestore(abstract))

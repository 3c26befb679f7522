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
    """Restore into the structure of `target` (a TrainState or pytree).

    Checkpoints written before the flat-trainable TrainState layout
    (trainable as a param PYTREE — round <= 3 — and, older still, per-leaf
    Adam moments) are migrated on the fly: the trainable tree is flattened
    in tree order into the target's flat vector, flat Adam moments carry
    over, and per-leaf moments are re-initialized (documented loss: a warm
    start forgets optimizer momentum)."""
    import orbax.checkpoint as ocp
    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not isinstance(x, jax.ShapeDtypeStruct) else x, target)
    try:
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    except Exception as e:
        # Only attempt legacy migration when the SAVED layout actually
        # differs from the target's (pre-flat trainable, per-leaf moments);
        # a transient I/O error on a new-format checkpoint must surface as
        # itself, not as a confusing migration failure, and the second full
        # restore below doubles peak host memory (advisor r4).
        if not _layout_mismatch(mgr, step, target):
            raise
        print(f"[restore] structured restore failed "
              f"({type(e).__name__}: {e}); saved layout differs from "
              "target — attempting legacy-checkpoint migration", flush=True)
        try:
            raw = mgr.restore(step)     # structure as saved (nested dicts)
            return _migrate_legacy_state(raw, target)
        except Exception as e2:
            raise RuntimeError(
                f"legacy-checkpoint migration also failed: {e2}") from e


def _layout_mismatch(mgr, step, target) -> bool:
    """True when the saved checkpoint's trainable layout differs from the
    target's (the only case legacy migration can fix).  Probes saved item
    metadata (cheap — no tensor reads); if the probe itself fails, returns
    True so the migration path still gets its chance."""
    try:
        meta = mgr.item_metadata(step)
        tree = getattr(meta, "tree", meta)
        if hasattr(tree, "get"):            # saved as a dict-like pytree
            saved_tr = tree.get("trainable")
        else:
            saved_tr = getattr(tree, "trainable", None)
        if saved_tr is None:
            return True
        want = np.shape(getattr(target, "trainable", None))
        saved_shape = tuple(getattr(saved_tr, "shape", ()) or ())
        # new format: trainable saved as ONE rank-1 array of matching size
        return not (saved_shape == tuple(want))
    except Exception:
        return True


def _migrate_legacy_state(raw: Any, target: Any) -> Any:
    """Map a pre-flat-layout TrainState checkpoint onto `target`'s
    structure.  Raises if `raw` is not a recognizable TrainState dict or
    the parameter count mismatches (a genuinely incompatible checkpoint)."""
    import dataclasses

    import jax.numpy as jnp

    if not (isinstance(raw, dict) and "trainable" in raw
            and hasattr(target, "trainable")):
        raise ValueError("unrecognized checkpoint layout (expected a "
                         "TrainState with a 'trainable' entry)")
    tr = raw["trainable"]
    if isinstance(tr, dict):     # legacy: trainable saved as a pytree
        leaves = jax.tree_util.tree_leaves(tr)
        flat = jnp.concatenate([jnp.ravel(jnp.asarray(l)) for l in leaves])
    else:
        flat = jnp.asarray(tr)
    want = int(np.prod(np.shape(target.trainable)))
    if flat.size != want:
        raise ValueError(f"checkpoint has {flat.size} trainable params, "
                         f"model needs {want}")
    # Pin the migrated vector to the target's dtype — a legacy checkpoint
    # with a non-f32 leaf must not silently change the optimizer's
    # parameter dtype through concatenate promotion (advisor r4).
    tgt_dtype = getattr(target.trainable, "dtype", None)
    if tgt_dtype is not None:
        flat = flat.astype(tgt_dtype)
    # Adam moments: carry over iff already flat with matching size;
    # otherwise (per-leaf legacy layout) keep target's fresh init.
    opt_state = target.opt_state
    try:
        def pick(t_leaf, r_leaf):
            r = jnp.asarray(r_leaf)
            return r if r.shape == np.shape(t_leaf) else t_leaf
        opt_state = jax.tree.map(pick, target.opt_state, raw["opt_state"])
    except Exception:
        print("[restore] legacy per-leaf optimizer state: re-initializing "
              "Adam moments (params warm-started)", flush=True)
    return dataclasses.replace(
        target, trainable=flat,
        frozen=jax.tree.map(lambda t, r: jnp.asarray(r), target.frozen,
                            raw["frozen"]),
        model_state=jax.tree.map(lambda t, r: jnp.asarray(r),
                                 target.model_state, raw["model_state"]),
        opt_state=opt_state,
        step=jnp.asarray(raw.get("step", target.step)))

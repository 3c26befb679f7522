"""Optimizer: polynomial-decay Adam with the reference's gradient multipliers
and selective trainable sets (CMPC_model.py:426-478).

- poly LR: start 2.5e-4 -> 1e-5, power 0.9 over lr_decay_step
  (CMPC_model.py:450-452); step clamps at the decay horizon.
- bias gradients x2 BEFORE Adam (the reference multiplies the gradient, not
  the lr — CMPC_model.py:462-475; nearly a no-op under Adam's scale
  invariance, but reproduced exactly).
- trainable set: everything but the backbone; + res3/4/5 conv kernels iff
  conv5 (CMPC_model.py:427-432).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def polynomial_lr(cfg):
    """`tf.train.polynomial_decay` parity."""
    def schedule(step):
        frac = jnp.minimum(step.astype(jnp.float32), cfg.lr_decay_step
                           ) / cfg.lr_decay_step
        return ((cfg.start_lr - cfg.end_lr) * (1.0 - frac) ** cfg.lr_power
                + cfg.end_lr)
    return schedule


def _scale_bias_grads(mult: float = 2.0):
    """Multiply gradients of conv 'biases' leaves (reference lr-mult 2,
    CMPC_model.py:464-465; LSTM 'bias' and LN params are NOT matched, same
    as the reference's name filter)."""
    def update_fn(updates, opt_state, params=None):
        def scale(path, g):
            is_bias = any(getattr(k, "key", None) == "biases" for k in path)
            return g * mult if is_bias else g
        return jax.tree_util.tree_map_with_path(scale, updates), opt_state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def scale_bias_grads_tree(grads, mult: float = 2.0):
    """The reference bias-gradient x2 applied directly on a gradient pytree
    (used by the flat optimizer path; each multiply fuses into the kernel
    that produced the gradient leaf)."""
    def scale(path, g):
        is_bias = any(getattr(k, "key", None) == "biases" for k in path)
        return g * mult if is_bias else g
    return jax.tree_util.tree_map_with_path(scale, grads)


def make_optimizer(cfg, flat: bool = False):
    """optax chain reproducing reference train_op semantics.  With
    cfg.grad_accum > 1, gradients average over that many micro-batches
    before each Adam update (effective batch = batch_size * grad_accum).

    flat=True returns the optimizer WITHOUT the bias-scaling stage, for use
    on ONE raveled parameter vector (jax.flatten_util.ravel_pytree): Adam
    over a few big arrays instead of ~300 leaves.  Measured on v5e-1: the
    per-leaf Adam update alone cost 12.3 ms/step (thousands of tiny kernel
    launches); the flat path runs it in a handful of fused kernels.  The
    caller applies scale_bias_grads_tree on the gradient pytree BEFORE
    raveling (path information does not survive the ravel)."""
    if cfg.optimizer != "adam":
        raise ValueError(f"Unknown optimizer type {cfg.optimizer!r}")
    adam = optax.adam(learning_rate=polynomial_lr(cfg),
                      b1=0.9, b2=0.999, eps=1e-8)
    opt = adam if flat else optax.chain(_scale_bias_grads(2.0), adam)
    if getattr(cfg, "grad_accum", 1) > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.grad_accum)
    return opt


# ---------------------------------------------------------------------------
# trainable/frozen partition
# ---------------------------------------------------------------------------

def partition_params(params: dict, cfg):
    """Split the model pytree into (trainable, frozen) sub-pytrees.

    Head params always train; backbone trains only its res3/4/5 conv kernels
    and only when conv5=True (BN folded constants never train)."""
    trainable = {k: v for k, v in params.items() if k != "backbone"}
    frozen_bb = {}
    train_bb = {}
    for name, block in params["backbone"].items():
        if cfg.conv5 and name.startswith(("res3", "res4", "res5")):
            tb, fb = {}, {}
            for bname, unit in block.items():
                tb[bname] = {"w": unit["w"]}
                fb[bname] = {k: v for k, v in unit.items() if k != "w"}
            train_bb[name] = tb
            frozen_bb[name] = fb
        else:
            frozen_bb[name] = block
    if train_bb:
        trainable["backbone"] = train_bb
    frozen = {"backbone": frozen_bb}
    return trainable, frozen


def merge_params(trainable: dict, frozen: dict) -> dict:
    """Inverse of partition_params (deep-merges the backbone split)."""
    params = {k: v for k, v in trainable.items() if k != "backbone"}
    bb = {}
    frozen_bb = frozen["backbone"]
    train_bb = trainable.get("backbone", {})
    for name in frozen_bb:
        if name in train_bb:
            merged = dict(frozen_bb[name])
            for bname, unit in train_bb[name].items():
                merged[bname] = {**frozen_bb[name][bname], **unit}
            bb[name] = merged
        else:
            bb[name] = frozen_bb[name]
    params["backbone"] = bb
    return params

"""Data-parallel trainer.

Replaces the reference train loop (trainval_model.py:19-147): instead of a
Python loop assembling feed_dicts for one GPU, the step is a pure jitted
function over the GLOBAL batch; batch arrays are sharded over the mesh's
'data' axis and params are replicated, so GSPMD emits the gradient
all-reduce over ICI automatically.  The host thread overlaps input decode
with the device step (async dispatch).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cmpc_refseg_tpu.config import ModelConfig
from cmpc_refseg_tpu.data.image import IMAGE_MEAN_BGR
from cmpc_refseg_tpu.models.model import apply_model, compute_loss, init_model
from cmpc_refseg_tpu.train.optimizer import (make_optimizer, merge_params,
                                             partition_params, polynomial_lr)


class Unravel:
    """Static flatten spec for the trainable pytree: rebuilds the parameter
    tree from trace-time SLICES of one flat vector.

    Lives on TrainState as a METADATA field (not a pytree leaf), so the
    train step can keep parameters flat in the state — Adam and the update
    add run on one contiguous vector, and the per-step ravel of ~300
    gradient leaves plus unravel of the updated tree (measured ~9-10 ms of
    the 48.3 ms round-3 step, pure layout traffic) is gone.  Inside jit the
    slices are views XLA fuses into their consumers.

    Hash/eq are by spec so two states built from the same config share a
    treedef (no spurious retraces)."""

    def __init__(self, treedef, shapes, dtypes):
        self.treedef = treedef
        self.shapes = tuple(tuple(s) for s in shapes)
        self.dtypes = tuple(jnp.dtype(d) for d in dtypes)
        # The flat vector's dtype: numpy promotion over the leaves — the
        # same dtype flatten_trainable's concatenate produces, so ravel
        # stays consistent with the stored vector even if a future
        # trainable tree mixes dtypes (advisor r4).
        self.flat_dtype = jnp.result_type(*self.dtypes) if self.dtypes \
            else jnp.dtype(jnp.float32)
        sizes = [int(np.prod(s)) if s else 1 for s in self.shapes]
        self.offsets = tuple(np.cumsum([0] + sizes).tolist())
        self.size = self.offsets[-1]

    def __call__(self, flat):
        leaves = [
            flat[self.offsets[i]:self.offsets[i + 1]]
            .reshape(self.shapes[i]).astype(self.dtypes[i])
            for i in range(len(self.shapes))]
        return jax.tree_util.tree_unflatten(self.treedef, leaves)

    def segment_groups(self, n_segments: int):
        """Partition the leaf index range into <= n_segments CONTIGUOUS
        groups balanced by flat size: [(leaf_lo, leaf_hi), ...].  Used by
        grad_mode='packed' (differentiate w.r.t. per-group segment vectors
        instead of one flat vector or 167 leaves)."""
        n_leaves = len(self.shapes)
        groups, lo = [], 0
        for g in range(n_segments):
            target = self.size * (g + 1) / n_segments
            hi = lo
            while hi < n_leaves and (self.offsets[hi + 1] <= target
                                     or hi == lo):
                hi += 1
            if hi > lo:
                groups.append((lo, hi))
                lo = hi
        if lo < n_leaves:
            groups.append((lo, n_leaves))
        return groups

    def from_segments(self, segs, groups):
        """Rebuild the parameter pytree from per-group segment vectors
        (inverse leaf order of __call__; each leaf slices its OWN group's
        segment, so the gradient transpose pads only to segment size)."""
        leaves = []
        for seg, (lo, hi) in zip(segs, groups):
            base = self.offsets[lo]
            for i in range(lo, hi):
                leaves.append(
                    seg[self.offsets[i] - base:self.offsets[i + 1] - base]
                    .reshape(self.shapes[i]).astype(self.dtypes[i]))
        return jax.tree_util.tree_unflatten(self.treedef, leaves)

    def ravel(self, tree):
        """Inverse: pytree -> flat vector (same leaf order as __call__)."""
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.concatenate(
            [jnp.ravel(l).astype(self.flat_dtype) for l in leaves])

    def _spec(self):
        return (self.treedef, self.shapes, self.dtypes)

    def __eq__(self, other):
        return (isinstance(other, Unravel)
                and self._spec() == other._spec())

    def __hash__(self):
        return hash((self.shapes, self.dtypes))


def flatten_trainable(tree):
    """-> (flat f32 vector, Unravel)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    shapes = [np.shape(l) for l in leaves]
    dtypes = [np.asarray(l).dtype if not hasattr(l, "dtype") else l.dtype
              for l in leaves]
    unravel = Unravel(treedef, shapes, dtypes)
    flat = jnp.concatenate([jnp.ravel(jnp.asarray(l)) for l in leaves]
                           ).astype(unravel.flat_dtype)
    return flat, unravel


@partial(jax.tree_util.register_dataclass,
         data_fields=["trainable", "frozen", "model_state", "opt_state",
                      "step"],
         meta_fields=["unravel"])
@dataclasses.dataclass
class TrainState:
    """Full training state (a pytree; orbax-checkpointable).

    `trainable` is ONE flat f32 vector (see Unravel); `unravel` is the
    static spec rebuilding the parameter pytree from it.  Use
    `trainable_tree(state)` / `state_params(state)` for the tree views."""
    trainable: Any
    frozen: Any
    model_state: Any          # BN moving stats
    opt_state: Any
    step: jnp.ndarray
    unravel: Any = None


def trainable_tree(state: TrainState):
    """The trainable parameter PYTREE of a state (flat or legacy layout)."""
    if state.unravel is not None and getattr(state.trainable, "ndim", 0) == 1:
        return state.unravel(state.trainable)
    return state.trainable


def state_params(state: TrainState) -> dict:
    """Full merged model params of a TrainState."""
    return merge_params(trainable_tree(state), state.frozen)


def replace_trainable(state: TrainState, tree) -> TrainState:
    """New state with the trainable pytree replaced (re-flattened).  The
    tree must match the state's structure (checkpoint converters, tests)."""
    flat, unravel = flatten_trainable(tree)
    if state.unravel is not None and unravel != state.unravel:
        raise ValueError("trainable structure mismatch")
    return dataclasses.replace(state, trainable=flat, unravel=unravel)


def create_train_state(key, cfg: ModelConfig, glove=None) -> TrainState:
    params, model_state = init_model(key, cfg, glove)
    trainable, frozen = partition_params(params, cfg)
    # Params + Adam state live over ONE flat vector (Unravel docstring;
    # the per-leaf update was launch-bound at ~300 leaves, 12.3 ms/step on
    # v5e, and the round-3 ravel-per-step layout cost another ~9-10 ms)
    flat, unravel = flatten_trainable(trainable)
    opt = make_optimizer(cfg, flat=True)
    opt_state = opt.init(flat)
    return TrainState(trainable=flat, frozen=frozen,
                      model_state=model_state, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32), unravel=unravel)


def brightness_aug(key, im: jnp.ndarray, max_delta: float = 0.2) -> jnp.ndarray:
    """`tf.image.random_brightness(im, 0.2)` parity (CMPCv4_model.py:83-84):
    one uniform delta added to the whole batch tensor.  (On the reference's
    0..255-scale inputs this is nearly a no-op; reproduced for parity.)"""
    delta = jax.random.uniform(key, (), minval=-max_delta, maxval=max_delta)
    return im + delta


@jax.custom_vjp
def _grad_x2(x):
    """Identity whose cotangent is doubled: the reference's bias-gradient
    lr-mult 2 (CMPC_model.py:462-475) expressed INSIDE the differentiated
    function, so the flat-gradient path needs no post-hoc pytree scaling
    (leaf paths don't survive the ravel)."""
    return x


def _grad_x2_fwd(x):
    return x, None


def _grad_x2_bwd(_, g):
    return (g * 2.0,)


_grad_x2.defvjp(_grad_x2_fwd, _grad_x2_bwd)


def mark_bias_grads_x2(tree):
    """Wrap conv 'biases' leaves in _grad_x2 (same name filter as
    optimizer.scale_bias_grads_tree)."""
    def mark(path, x):
        is_bias = any(getattr(k, "key", None) == "biases" for k in path)
        return _grad_x2(x) if is_bias else x
    return jax.tree_util.tree_map_with_path(mark, tree)


def _fused_flat_adam(cfg, g, opt_state, p):
    """Hand-inlined flat Adam + parameter add in ONE elementwise graph
    (CMPC_ADAM=fused): optax's scale_by_adam materializes the `updates`
    vector and apply_updates re-reads p (xplane r5: 3.19 ms, ~2.1 GB moved,
    vs the 1.33 GB minimal traffic of read {g,mu,nu,p} / write {mu,nu,p}).
    Bit-for-bit the same math and the same opt_state pytree as
    `optax.adam(polynomial_lr)` — (ScaleByAdamState, ScaleByScheduleState)
    — so checkpoints and the optax path interchange freely (parity test:
    tests/test_train.py::test_fused_adam_matches_optax)."""
    import optax
    adam_st, sched_st = opt_state
    b1, b2, eps = 0.9, 0.999, 1e-8
    count = optax.safe_int32_increment(adam_st.count)
    mu = adam_st.mu * b1 + g * (1 - b1)
    nu = adam_st.nu * b2 + (g * g) * (1 - b2)
    cf = count.astype(jnp.float32)
    mu_hat = mu / (1 - b1 ** cf)
    nu_hat = nu / (1 - b2 ** cf)
    lr = polynomial_lr(cfg)(sched_st.count)
    new_p = p - lr * (mu_hat / (jnp.sqrt(nu_hat) + eps))
    new_state = (adam_st._replace(count=count, mu=mu, nu=nu),
                 sched_st._replace(
                     count=optax.safe_int32_increment(sched_st.count)))
    return new_p, new_state


def make_train_step(cfg: ModelConfig, tp_rule: Optional[Callable] = None,
                    grad_mode: Optional[str] = None) -> Callable:
    """Returns jitted (state, batch) -> (state, metrics).

    batch: {'im' [B,H,W,3] f32 BGR-mean-sub, 'target' [B,H,W,1] f32,
    text fields per encoder}.  B is the GLOBAL batch.

    tp_rule: optional leaf -> NamedSharding rule
    (parallel.mesh.tp_leaf_rule) constraining every unraveled weight view
    inside the step — tensor parallelism over the 'model' mesh axis on top
    of the ZeRO-style flat master vector (SURVEY section 5.7: shard the big
    fusion/graph matmuls when resolution rises).

    grad_mode (default env CMPC_GRAD_MODE, else 'tree' pending the TPU A/B):
      'flat' — differentiate w.r.t. the flat master vector directly; the
        cotangent of each trace-time slice view lands in the flat gradient
        buffer, so the ~167-leaf gradient-tree concatenate disappears
        (measured on v5e-1: the concat cost ~3.4 ms of the 6.1-7.1 ms
        optimizer block — PERF.md r5 notes).  Bias x2 via mark_bias_grads_x2.
      'tree' — round-4 layout: differentiate w.r.t. the parameter pytree,
        scale bias leaves, then one concat (kept for A/B).
      'packed' — middle ground (VERDICT r4 #2b): differentiate w.r.t. ~G
        contiguous SEGMENT vectors (env CMPC_GRAD_PACK_SEGMENTS, default
        12); each leaf's cotangent pads only to its segment's size and the
        final concat is G-ary instead of 167-ary.
    """
    import os
    from cmpc_refseg_tpu.train.optimizer import scale_bias_grads_tree
    opt = make_optimizer(cfg, flat=True)
    if grad_mode is None:
        grad_mode = os.environ.get("CMPC_GRAD_MODE", "tree")
    if grad_mode not in ("flat", "tree", "packed"):
        raise ValueError(f"unknown grad_mode {grad_mode!r}")
    n_segments = int(os.environ.get("CMPC_GRAD_PACK_SEGMENTS", "12"))
    # fused flat Adam only applies to the plain (non-accumulating) flat
    # optimizer; MultiSteps keeps the optax path
    adam_fused = (os.environ.get("CMPC_ADAM", "optax") == "fused"
                  and getattr(cfg, "grad_accum", 1) == 1)

    def loss_fn(trainable, frozen, model_state, batch, rng):
        params = merge_params(trainable, frozen)
        b = device_image_prologue(dict(batch))
        if cfg.is_aug:
            b["im"] = brightness_aug(rng, b["im"])
        outputs, new_model_state = apply_model(params, model_state, cfg, b,
                                               train=True)
        total, metrics = compute_loss(
            outputs, b["target"], cfg, params,
            label_bbox=b.get("label_bbox"), true_bbox=b.get("true_bbox"))
        # on-graph batch mIoU summary (CMPC_model.py:486-490)
        pred = outputs.up > 0
        labl = b["target"] > 0
        inter = jnp.sum(jnp.logical_and(pred, labl), axis=(1, 2, 3))
        union = jnp.sum(jnp.logical_or(pred, labl), axis=(1, 2, 3))
        metrics["train_mIoU"] = jnp.mean(inter / jnp.maximum(union, 1))
        return total, (metrics, new_model_state)

    def _constrain(tr_tree):
        if tp_rule is None:
            return tr_tree
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, tp_rule(x)),
            tr_tree)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict):
        rng = jax.random.fold_in(jax.random.PRNGKey(42), state.step)
        if grad_mode == "flat":
            # Differentiate w.r.t. the flat vector itself: the unravel's
            # trace-time slices transpose to disjoint segment writes into
            # ONE flat gradient buffer — no gradient-tree concat at all.
            def loss_flat(flat, frozen, model_state, batch, rng):
                tree = mark_bias_grads_x2(_constrain(state.unravel(flat)))
                return loss_fn(tree, frozen, model_state, batch, rng)

            (_, (metrics, new_model_state)), flat_g = jax.value_and_grad(
                loss_flat, has_aux=True)(
                    state.trainable, state.frozen, state.model_state,
                    batch, rng)
        elif grad_mode == "packed":
            groups = state.unravel.segment_groups(n_segments)
            offs = state.unravel.offsets

            def loss_packed(segs, frozen, model_state, batch, rng):
                tree = mark_bias_grads_x2(_constrain(
                    state.unravel.from_segments(segs, groups)))
                return loss_fn(tree, frozen, model_state, batch, rng)

            segs = [state.trainable[offs[lo]:offs[hi]] for lo, hi in groups]
            (_, (metrics, new_model_state)), seg_g = jax.value_and_grad(
                loss_packed, has_aux=True)(
                    segs, state.frozen, state.model_state, batch, rng)
            flat_g = jnp.concatenate(seg_g)
        else:
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            # Round-4 layout: unravel to trace-time slice views for the
            # forward; gradients come back as a tree with the same
            # structure, bias x2 on the pytree, and concatenate ONCE.
            tr_tree = _constrain(trainable_tree(state))
            (_, (metrics, new_model_state)), grads = grad_fn(
                tr_tree, state.frozen, state.model_state, batch, rng)
            flat_g = state.unravel.ravel(scale_bias_grads_tree(grads))
        if adam_fused:
            new_trainable, new_opt_state = _fused_flat_adam(
                cfg, flat_g, state.opt_state, state.trainable)
        else:
            updates, new_opt_state = opt.update(flat_g, state.opt_state,
                                                state.trainable)
            new_trainable = state.trainable + updates
        # Under grad accumulation the Adam schedule advances once per
        # UPDATE, not per micro-step: read MultiSteps' gradient_step (the
        # inner update count) so the logged LR is the one Adam applies.
        lr_step = getattr(state.opt_state, "gradient_step", state.step)
        metrics["learning_rate"] = polynomial_lr(cfg)(jnp.asarray(lr_step))
        new_state = TrainState(
            trainable=new_trainable, frozen=state.frozen,
            model_state=new_model_state, opt_state=new_opt_state,
            step=state.step + 1, unravel=state.unravel)
        return new_state, metrics

    return train_step


def prepare_image_batch(collated: dict, cfg: ModelConfig) -> dict:
    """Host-side final packing (trainval_model.py:83-96): uint8 RGB ->
    float32 BGR - mean; bool mask -> float target; int32 text."""
    im = collated["im_batch"].astype(np.float32)
    im = im[..., ::-1] - IMAGE_MEAN_BGR     # RGB -> BGR, mean-subtract
    out = {
        "im": im,
        "target": collated["mask_batch"].astype(np.float32)[..., None],
        "words": collated["text_batch"].astype(np.int32),
    }
    if "seq_length" in collated:
        out["seq_len"] = collated["seq_length"].astype(np.int32).reshape(-1)
    return out


def prepare_image_batch_u8(collated: dict) -> dict:
    """Compact host packing: ship uint8 RGB + uint8 mask and normalize ON
    DEVICE (device_image_prologue) — 4x fewer host->device bytes than the
    reference's host-side float32 feed (trainval_model.py:83-96), ~zero
    host ms.  The train/eval steps expand 'im_u8'/'target_u8' inside jit;
    numerics are bit-identical to prepare_image_batch (uint8->f32 is exact,
    the flip/subtract run in the same order, just on the chip)."""
    out = {
        "im_u8": np.ascontiguousarray(collated["im_batch"].astype(np.uint8)),
        "target_u8": collated["mask_batch"].astype(np.uint8)[..., None],
        "words": collated["text_batch"].astype(np.int32),
    }
    if "seq_length" in collated:
        out["seq_len"] = collated["seq_length"].astype(np.int32).reshape(-1)
    return out


def device_image_prologue(batch: dict) -> dict:
    """In-jit expansion of a compact uint8 batch: RGB uint8 -> f32 BGR -
    mean, uint8 mask -> f32 target.  No-op for already-expanded batches
    (the parity path keeps host-side prepare_image_batch)."""
    if "im_u8" not in batch:
        return batch
    b = dict(batch)
    im = b.pop("im_u8").astype(jnp.float32)
    b["im"] = im[..., ::-1] - jnp.asarray(IMAGE_MEAN_BGR, jnp.float32)
    if "target_u8" in b:
        b["target"] = b.pop("target_u8").astype(jnp.float32)
    return b


class PreemptionGuard:
    """Graceful-preemption watcher for the train loop.

    SIGTERM/SIGINT (what preemptible TPU VMs deliver on eviction) set a
    flag; the loop saves a final checkpoint at the next step boundary and
    returns cleanly instead of losing up to one snapshot interval (the
    reference's failure mode — it has no failure handling at all, SURVEY
    §5.3; resume is manual via -lastiter, trainval_model.py:342).

    No-op when not on the main thread (signal handlers can only be
    installed there — e.g. train loops driven from a test worker thread).
    """

    def __init__(self):
        self.fired = False
        self._prev = {}

    def __enter__(self):
        import signal
        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                self._prev[sig] = signal.signal(sig, self._handle)
        except ValueError:   # not the main thread
            self._prev = {}
        return self

    def _handle(self, signum, frame):
        self.fired = True
        # Restore the previous handlers immediately: if the step never
        # reaches the next boundary (e.g. a long XLA compile), a second
        # SIGINT must still be able to interrupt the process.
        import signal
        for sig, h in self._prev.items():
            signal.signal(sig, h)
        self._prev = {}

    def __exit__(self, *exc):
        import signal
        for sig, h in self._prev.items():
            signal.signal(sig, h)
        return False


def train_loop(cfg: ModelConfig, reader, *, max_iter: int, mesh=None,
               state: Optional[TrainState] = None, glove=None,
               log_every: int = 100, snapshot_every: int = 0,
               checkpoint_dir: Optional[str] = None, logger=None,
               start_iter: int = 0, seed: int = 0,
               val_fn: Optional[Callable] = None, val_every: int = 0):
    """End-to-end training (trainval_model.py train(), TPU-native).

    `reader` must provide read_collated(batch_size) -> dict of stacked
    arrays.  With a mesh, batch arrays are sharded over 'data'.

    `val_fn(state) -> dict` runs every `val_every` iters and its metrics go
    to the logger under 'val_*' (periodic in-training validation, the
    reference BERT driver's loop at trainval_model_bert.py:107-122).
    """
    from cmpc_refseg_tpu.parallel.mesh import shard_batch
    from cmpc_refseg_tpu.utils.moving_average import MovingAverage

    if state is None:
        state = create_train_state(jax.random.PRNGKey(seed), cfg, glove)
    step_fn = make_train_step(cfg)
    time_avg = MovingAverage(100)
    last = time.time()

    guard = PreemptionGuard().__enter__()
    try:
        state = _train_iters(cfg, reader, state, step_fn, time_avg, last,
                             guard, max_iter=max_iter, mesh=mesh,
                             log_every=log_every,
                             snapshot_every=snapshot_every,
                             checkpoint_dir=checkpoint_dir, logger=logger,
                             start_iter=start_iter, val_fn=val_fn,
                             val_every=val_every)
    finally:
        guard.__exit__()
    return state


def _train_iters(cfg, reader, state, step_fn, time_avg, last, guard, *,
                 max_iter, mesh, log_every, snapshot_every, checkpoint_dir,
                 logger, start_iter, val_fn, val_every):
    from cmpc_refseg_tpu.parallel.mesh import is_primary_process, shard_batch

    # Multi-host: cfg.batch_size is the GLOBAL batch; each process reads its
    # own 1/process_count slice and shard_batch assembles the global array
    # (jax.make_array_from_process_local_data).  Only process 0 checkpoints
    # and logs.
    n_proc = jax.process_count()
    if cfg.batch_size % max(n_proc, 1):
        raise ValueError(f"global batch {cfg.batch_size} not divisible by "
                         f"{n_proc} processes")
    local_bs = cfg.batch_size // max(n_proc, 1)
    primary = is_primary_process()

    for it in range(start_iter, max_iter):
        if guard.fired:
            if checkpoint_dir and primary:
                from cmpc_refseg_tpu.train.checkpoint import save_checkpoint
                save_checkpoint(checkpoint_dir, state, it)
            print(f"preempted at iter {it}: checkpoint saved, exiting "
                  "cleanly", flush=True)
            return state
        collated = reader.read_collated(local_bs)
        batch = prepare_image_batch_u8(collated)
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        state, metrics = step_fn(state, batch)

        now = time.time()
        time_avg.add(now - last)
        last = now
        if it % log_every == 0 and primary:
            metrics = {k: float(v) for k, v in metrics.items()}
            metrics["step_time_s"] = time_avg.get()
            # console progress like the reference's iter printout
            # (trainval_model.py:108-120)
            print(f"iter {it}: loss {metrics.get('loss_cls_all', 0):.2f} "
                  f"mIoU {metrics.get('train_mIoU', 0):.3f} "
                  f"lr {metrics.get('learning_rate', 0):.2e} "
                  f"({time_avg.get():.3f}s/it)", flush=True)
            if logger is not None:
                logger.log(it, metrics)
        if val_fn is not None and val_every and (it + 1) % val_every == 0:
            val_metrics = val_fn(state)
            if logger is not None:
                logger.log(it + 1, {f"val_{k}": float(v)
                                    for k, v in val_metrics.items()})
        if (checkpoint_dir and snapshot_every and primary
                and (it + 1) % snapshot_every == 0):
            from cmpc_refseg_tpu.train.checkpoint import save_checkpoint
            save_checkpoint(checkpoint_dir, state, it + 1)
    return state

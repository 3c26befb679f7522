"""A2D video train/test driver (reference: CMPC_video/trainval_video.py).

Train: clip [B,16,H,W,3] + center-frame GT mask.  Test: precision@0.5..0.95
(10 thresholds, trainval_video.py:147), skipping empty-GT samples (:250-254).
"""

from __future__ import annotations

import argparse
import os
from functools import partial

import numpy as np

from cmpc_refseg_tpu.data.image import IMAGE_MEAN_BGR


def prepare_video_batch(collated: dict, cfg) -> dict:
    """uint8 RGB frames -> float32 BGR mean-sub clip; center-frame mask."""
    frames = collated["frames"].astype(np.float32)      # [B,F,H,W,3] RGB
    clip = frames[..., ::-1] - IMAGE_MEAN_BGR
    out = {
        "clip": clip,
        "target": collated["mask_batch"].astype(np.float32)[..., None],
        "words": collated["text_batch"].astype(np.int32),
    }
    if "seq_length" in collated:
        out["seq_len"] = collated["seq_length"].astype(np.int32).reshape(-1)
    return out


def make_video_train_step(cfg):
    import jax
    from cmpc_refseg_tpu.models.model import compute_loss
    from cmpc_refseg_tpu.models.video import apply_video_model
    from cmpc_refseg_tpu.train.optimizer import (make_optimizer, merge_params,
                                                 polynomial_lr)
    from cmpc_refseg_tpu.train.trainer import TrainState, trainable_tree

    from cmpc_refseg_tpu.train.optimizer import scale_bias_grads_tree
    opt = make_optimizer(cfg, flat=True)

    def loss_fn(trainable, frozen, model_state, batch):
        params = merge_params(trainable, frozen)
        outputs, new_ms = apply_video_model(params, model_state, cfg, batch,
                                            train=True)
        total, metrics = compute_loss(outputs, batch["target"], cfg, params)
        return total, (metrics, new_ms)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        # flat-in-state layout (trainer.Unravel docstring): params are
        # slice views of one vector, gradients concat ONCE, Adam + the add
        # run on the contiguous vector
        (_, (metrics, new_ms)), grads = grad_fn(
            trainable_tree(state), state.frozen, state.model_state, batch)
        grads = scale_bias_grads_tree(grads)
        flat_g = state.unravel.ravel(grads)
        updates, new_opt = opt.update(flat_g, state.opt_state,
                                      state.trainable)
        metrics["learning_rate"] = polynomial_lr(cfg)(state.step)
        return TrainState(state.trainable + updates, state.frozen, new_ms,
                          new_opt, state.step + 1,
                          unravel=state.unravel), metrics

    return step


def create_video_train_state(seed, cfg, glove=None):
    import jax
    from cmpc_refseg_tpu.models.video import init_video_model
    from cmpc_refseg_tpu.train.optimizer import make_optimizer, partition_params
    from cmpc_refseg_tpu.train.trainer import TrainState, flatten_trainable
    import jax.numpy as jnp

    params, model_state = init_video_model(jax.random.PRNGKey(seed), cfg,
                                           glove)
    trainable, frozen = partition_params(params, cfg)
    flat, unravel = flatten_trainable(trainable)
    opt = make_optimizer(cfg, flat=True)
    return TrainState(flat, frozen, model_state, opt.init(flat),
                      jnp.zeros((), jnp.int32), unravel=unravel)


def evaluate_a2d(cfg, params, model_state, sample_iter, *,
                 max_samples=None) -> dict:
    """A2D eval: mean IoU + overall IoU + prec@[0.5:0.95:0.05]
    (trainval_video.py:147,230-280); empty-GT samples skipped."""
    import jax
    from cmpc_refseg_tpu.models.video import apply_video_model

    thresholds = [0.5 + 0.05 * i for i in range(10)]
    correct = np.zeros(10, np.int64)
    cum_i = cum_u = 0.0
    miou_sum = 0.0
    n = 0

    fwd = jax.jit(lambda p, s, b: apply_video_model(p, s, cfg, b)[0].sigm)
    for k, sample in enumerate(sample_iter):
        if max_samples is not None and k >= max_samples:
            break
        target = np.asarray(sample.pop("target"))[0, :, :, 0] > 0
        if not target.any():
            continue
        sigm = np.asarray(fwd(params, model_state, sample))[0, :, :, 0]
        pred = sigm > 0.5
        i = float(np.logical_and(pred, target).sum())
        u = float(np.logical_or(pred, target).sum())
        iou = i / u if u else 0.0
        cum_i += i
        cum_u += u
        miou_sum += iou
        for t, thr in enumerate(thresholds):
            correct[t] += iou >= thr
        n += 1
    out = {"mean_iou": miou_sum / max(n, 1),
           "overall_iou": cum_i / max(cum_u, 1e-12), "n": n}
    for t, thr in enumerate(thresholds):
        out[f"prec@{thr:.2f}"] = correct[t] / max(n, 1)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser("cmpc_refseg_tpu video (A2D)")
    ap.add_argument("-m", dest="mode", required=True,
                    choices=["train", "test"])
    ap.add_argument("-f", dest="data_folder", default="./a2d_sent_new")
    ap.add_argument("-n", dest="model_name",
                    default="CMPC_video_mm_tgraph_allvec")
    ap.add_argument("-i", dest="max_iter", type=int, default=400_000)
    ap.add_argument("-s", dest="snapshot", type=int, default=20_000)
    ap.add_argument("-bs", dest="batch_size", type=int, default=1)
    ap.add_argument("-ckpt_dir", dest="ckpt_dir", default="./checkpoints_video")
    ap.add_argument("-log_dir", dest="log_dir", default="./logs_video")
    ap.add_argument("-emb", dest="emb_name", default="Gref")
    ap.add_argument("-emb_dir", dest="emb_dir", default="data")
    # geometry/dim overrides (ablations / CI smoke)
    for flag in ("H", "W", "num_steps", "rnn_size", "v_emb_dim", "mlp_dim",
                 "glove_dim", "res4_blocks", "vocab_size", "num_frames"):
        ap.add_argument(f"-{flag}", type=int, default=None)
    ap.add_argument("-sampled_frames", default=None,
                    help="comma-separated frame indices (default 0,4,8,12,15)")
    args = ap.parse_args(argv)

    import jax
    from cmpc_refseg_tpu.cli import load_glove
    from cmpc_refseg_tpu.config import get_config
    from cmpc_refseg_tpu.data.reader import NpzReader

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    overrides = {k: getattr(args, k) for k in
                 ("H", "W", "num_steps", "rnn_size", "v_emb_dim", "mlp_dim",
                  "glove_dim", "res4_blocks", "vocab_size", "num_frames")
                 if getattr(args, k, None) is not None}
    if args.sampled_frames:
        overrides["sampled_frames"] = tuple(
            int(x) for x in args.sampled_frames.split(","))
    cfg = get_config(args.model_name, batch_size=args.batch_size,
                     compute_dtype="bfloat16" if on_tpu else "float32",
                     **overrides)
    glove = load_glove(args.emb_dir, args.emb_name)

    split = "train" if args.mode == "train" else "test"
    reader = NpzReader(os.path.join(args.data_folder, f"{split}_batch"),
                       f"a2d_{split}", shuffle=(args.mode == "train"))

    if args.mode == "train":
        from cmpc_refseg_tpu.utils.logging import MetricLogger
        from cmpc_refseg_tpu.train.checkpoint import save_checkpoint
        from cmpc_refseg_tpu.train.trainer import PreemptionGuard
        state = create_video_train_state(0, cfg, glove)
        step_fn = make_video_train_step(cfg)
        logger = MetricLogger(args.log_dir)
        with PreemptionGuard() as guard:
            for it in range(args.max_iter):
                if guard.fired:
                    save_checkpoint(args.ckpt_dir, state, it)
                    print(f"preempted at iter {it}: checkpoint saved, "
                          "exiting cleanly", flush=True)
                    break
                collated = reader.read_batch(
                    cfg.batch_size,
                    keys=["text_batch", "seq_length", "mask_batch", "frames"])
                batch = prepare_video_batch(collated, cfg)
                state, metrics = step_fn(state, batch)
                if it % 100 == 0:
                    logger.log(it, {k: float(v) for k, v in metrics.items()})
                if (it + 1) % args.snapshot == 0:
                    save_checkpoint(args.ckpt_dir, state, it + 1)
    else:
        from cmpc_refseg_tpu.train.checkpoint import restore_checkpoint
        from cmpc_refseg_tpu.train.trainer import state_params
        from cmpc_refseg_tpu.models.model import prepare_params
        state = create_video_train_state(0, cfg, glove)
        state = restore_checkpoint(args.ckpt_dir, state)
        params = jax.device_put(prepare_params(state_params(state), cfg))

        def samples():
            for _ in range(reader.num_samples):
                z = reader.read()
                collated = {k: np.asarray(v)[None] for k, v in z.items()
                            if k in ("text_batch", "seq_length",
                                     "mask_batch", "frames")}
                yield prepare_video_batch(collated, cfg)

        results = evaluate_a2d(cfg, params, state.model_state, samples())
        for k, v in sorted(results.items()):
            print(f"{k} = {v}")


if __name__ == "__main__":
    main()

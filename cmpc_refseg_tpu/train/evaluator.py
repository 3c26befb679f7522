"""Evaluation harness (reference: trainval_model.py test(), :150-303).

Protocol parity:
- forward at (H, W)=320x320, threshold upsampled logits at 1e-9
  (trainval_model.py:244),
- map prediction back to native resolution via resize_and_crop (:245),
- accumulate cumulative IoU = sum(I)/sum(U), mean IoU, precision@{.5..:.9}
  (:267-294),
- optional DenseCRF refinement on the sigmoid map (:246-259).

TPU-native: the forward runs jitted and batched; the native-resolution
mapping + accumulation run on host (shapes vary per sample).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np

from cmpc_refseg_tpu.config import ModelConfig
from cmpc_refseg_tpu.data.image import resize_and_crop
from cmpc_refseg_tpu.models.model import apply_model
from cmpc_refseg_tpu.ops.metrics import SegEvalAccumulator

SCORE_THRESHOLD = 1e-9   # trainval_model.py:160,244


def native_prediction(up: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Native-resolution boolean prediction with exact reference semantics
    (trainval_model.py:244-245 + util/eval_tools.py:31-35): threshold the
    upsampled logits at `up >= 1e-9`, bilinearly resize the resulting FLOAT
    0/1 mask to (oh, ow), then count ANY nonzero pixel as foreground —
    np.logical_and on floats treats every nonzero value as True, so the
    boundary dilates (NOT a >0.5 re-threshold, which would erode it)."""
    return resize_and_crop((up >= SCORE_THRESHOLD).astype(np.float32),
                           oh, ow) != 0


def make_eval_step(cfg: ModelConfig):
    from cmpc_refseg_tpu.train.trainer import device_image_prologue

    @partial(jax.jit, static_argnames=())
    def eval_step(params, model_state, batch):
        batch = device_image_prologue(batch)
        outputs, _ = apply_model(params, model_state, cfg, batch, train=False)
        return outputs.up, outputs.sigm
    return eval_step


_BATCH_KEYS = ("im", "words", "seq_len", "valid_idx", "words_feat",
               "sequence_mask")


def evaluate(cfg: ModelConfig, params, model_state, sample_iter, *,
             use_crf: bool = False, max_samples: Optional[int] = None,
             visualize_fn=None, batch_size: int = 8) -> dict:
    """sample_iter yields dicts with model inputs (batched [1, ...]) plus
    'orig_size' (h, w) and 'target_native' (native-resolution GT mask).

    Device forwards run in fixed-size batches of `batch_size` (tail padded
    with the last sample) — ONE compiled program, the chip stays fed — while
    the protocol-parity native-resolution mapping and (I, U) accumulation
    stay per-sample on the host (trainval_model.py:243-284)."""
    eval_step = make_eval_step(cfg)
    acc = SegEvalAccumulator()
    acc_crf = SegEvalAccumulator() if use_crf else None
    n = 0

    def flush(group):
        nonlocal n
        if not group:
            return
        pad = batch_size - len(group)
        batch = {}
        for k in _BATCH_KEYS:
            if k in group[0]:
                rows = [np.asarray(s[k]) for s in group]
                rows += [rows[-1]] * pad
                batch[k] = np.concatenate(rows, axis=0)
        up_b, sigm_b = eval_step(params, model_state, batch)
        up_b = np.asarray(up_b)
        sigm_b = np.asarray(sigm_b)
        for j, sample in enumerate(group):
            up = up_b[j, :, :, 0]
            sigm = sigm_b[j, :, :, 0]
            oh, ow = sample["orig_size"]
            target = np.asarray(sample["target_native"]) > 0
            pred = native_prediction(up, oh, ow)
            acc.update(np.sum(np.logical_and(pred, target)),
                       np.sum(np.logical_or(pred, target)))
            if use_crf:
                from cmpc_refseg_tpu.ops.densecrf import refine_mask
                sigm_native = resize_and_crop(sigm, oh, ow)
                crf_mask = refine_mask(np.asarray(sample["im_native"]),
                                       sigm_native)
                acc_crf.update(np.sum(np.logical_and(crf_mask, target)),
                               np.sum(np.logical_or(crf_mask, target)))
            if visualize_fn is not None:
                visualize_fn(n, sample, pred, sigm)
            n += 1

    group = []
    for sample in sample_iter:
        if max_samples is not None and n + len(group) >= max_samples:
            break
        group.append(sample)
        if len(group) == batch_size:
            flush(group)
            group = []
    flush(group)

    results = {"no_crf": acc.result()}
    if use_crf:
        results["crf"] = acc_crf.result()
    return results


def make_sharded_eval_step(cfg: ModelConfig):
    """Batched on-device eval step for data-parallel meshes (SURVEY.md
    section 5.8): the global batch is sharded over the mesh's 'data' axis,
    per-sample (I, U) and precision@X counts are computed on device, and
    GSPMD inserts the ICI all-reduce for the sums.  Evaluation here is at
    model resolution (H, W) against 'target' — the fixed-shape fast path;
    the native-resolution protocol above remains the parity path.

    Fast-path vs parity divergence (measured, pinned by
    tests/test_eval_protocol.py::TestShardedEvalDelta): on boundary-heavy
    synthetic masks with an untrained model the model-res numbers track the
    native dilating protocol to ~0.02 IoU (bound asserted at 0.08) — safe
    for RELATIVE model selection during training; use `evaluate` for any
    reported/parity number.
    """
    import jax.numpy as jnp

    thresholds = (0.5, 0.6, 0.7, 0.8, 0.9)

    from cmpc_refseg_tpu.train.trainer import device_image_prologue

    @jax.jit
    def eval_step(params, model_state, batch):
        batch = device_image_prologue(batch)
        outputs, _ = apply_model(params, model_state, cfg, batch, train=False)
        pred = outputs.up[..., 0] >= SCORE_THRESHOLD       # [B,H,W]
        target = batch["target"][..., 0] > 0.5
        i = jnp.sum(jnp.logical_and(pred, target), axis=(1, 2))
        u = jnp.sum(jnp.logical_or(pred, target), axis=(1, 2))
        iou = i / jnp.maximum(u, 1)
        prec = jnp.stack([jnp.sum(iou > t) for t in thresholds])
        return jnp.sum(i), jnp.sum(u), jnp.sum(iou), prec
    return eval_step


def evaluate_sharded(cfg: ModelConfig, params, model_state, batch_iter, *,
                     mesh=None, max_batches: Optional[int] = None) -> dict:
    """Run the sharded eval loop; batch_iter yields global batches with
    'target' [B,H,W,1].  With a mesh, inputs are sharded over 'data' AND the
    fused Pallas kernels stay engaged — data_parallel_dispatch makes them
    shard_map over the data axis (they are batch-row-local), so multi-chip
    inference runs at fused-kernel speed instead of falling back to XLA."""
    from cmpc_refseg_tpu.parallel.mesh import (data_parallel_dispatch,
                                               shard_batch)

    eval_step = make_sharded_eval_step(cfg)
    tot_i = tot_u = tot_iou = 0.0
    tot_prec = np.zeros(5)
    n = 0
    for bi, batch in enumerate(batch_iter):
        if max_batches is not None and bi >= max_batches:
            break
        bsz = batch["im"].shape[0]
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        with data_parallel_dispatch(mesh):
            i, u, iou, prec = eval_step(params, model_state, batch)
        tot_i += float(i)
        tot_u += float(u)
        tot_iou += float(iou)
        tot_prec += np.asarray(prec)
        n += bsz
    return {
        "overall_iou": tot_i / max(tot_u, 1),
        "mean_iou": tot_iou / max(n, 1),
        "n": n,
        **{f"prec@{t}": tot_prec[k] / max(n, 1)
           for k, t in enumerate((0.5, 0.6, 0.7, 0.8, 0.9))},
    }


def print_results(results: dict) -> None:
    """Reference-format printout (trainval_model.py:288-303)."""
    for variant, r in results.items():
        print(f"=== {variant} ===")
        for k in sorted(r):
            if k.startswith("prec@"):
                print(f"precision@{k[5:]} = {r[k]:.5f}")
        print(f"overall IoU = {r['overall_iou']:.5f}")
        print(f"mean IoU = {r['mean_iou']:.5f} ({r['n']} samples)")

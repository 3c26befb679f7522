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


def make_eval_step(cfg: ModelConfig):
    @partial(jax.jit, static_argnames=())
    def eval_step(params, model_state, batch):
        outputs, _ = apply_model(params, model_state, cfg, batch, train=False)
        return outputs.up, outputs.sigm
    return eval_step


def evaluate(cfg: ModelConfig, params, model_state, sample_iter, *,
             use_crf: bool = False, max_samples: Optional[int] = None,
             visualize_fn=None) -> dict:
    """sample_iter yields dicts with model inputs (batched [1, ...]) plus
    'orig_size' (h, w) and 'target_native' (native-resolution GT mask)."""
    eval_step = make_eval_step(cfg)
    acc = SegEvalAccumulator()
    acc_crf = SegEvalAccumulator() if use_crf else None

    for n, sample in enumerate(sample_iter):
        if max_samples is not None and n >= max_samples:
            break
        batch = {k: v for k, v in sample.items()
                 if k in ("im", "words", "seq_len", "valid_idx",
                          "words_feat", "sequence_mask")}
        up, sigm = eval_step(params, model_state, batch)
        up = np.asarray(up)[0, :, :, 0]
        sigm = np.asarray(sigm)[0, :, :, 0]

        oh, ow = sample["orig_size"]
        target = np.asarray(sample["target_native"]) > 0

        pred = resize_and_crop((up > SCORE_THRESHOLD).astype(np.float32),
                               oh, ow) > 0.5
        i = np.sum(np.logical_and(pred, target))
        u = np.sum(np.logical_or(pred, target))
        acc.update(i, u)

        if use_crf:
            from cmpc_refseg_tpu.ops.densecrf import refine_mask
            sigm_native = resize_and_crop(sigm, oh, ow)
            im_native = np.asarray(sample["im_native"])
            crf_mask = refine_mask(im_native, sigm_native)
            i2 = np.sum(np.logical_and(crf_mask, target))
            u2 = np.sum(np.logical_or(crf_mask, target))
            acc_crf.update(i2, u2)

        if visualize_fn is not None:
            visualize_fn(n, sample, pred, sigm)

    results = {"no_crf": acc.result()}
    if use_crf:
        results["crf"] = acc_crf.result()
    return results


def print_results(results: dict) -> None:
    """Reference-format printout (trainval_model.py:288-303)."""
    for variant, r in results.items():
        print(f"=== {variant} ===")
        for k in sorted(r):
            if k.startswith("prec@"):
                print(f"precision@{k[5:]} = {r[k]:.5f}")
        print(f"overall IoU = {r['overall_iou']:.5f}")
        print(f"mean IoU = {r['mean_iou']:.5f} ({r['n']} samples)")

"""Segmentation losses (reference: util/loss.py).

All losses take logits/labels shaped [B, H, W, 1] and reduce exactly like the
reference: per-sample sum over (H, W, C), then mean over batch — so the loss
magnitude scales with H*W, matching the reference's Adam dynamics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """`tf.nn.sigmoid_cross_entropy_with_logits` parity:
    max(x, 0) - x*z + log(1 + exp(-|x|)) — numerically stable."""
    return (jnp.maximum(logits, 0.0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def weighed_logistic_loss(scores, labels, pos_loss_mult=1.0, neg_loss_mult=1.0):
    """util/loss.py:6-16 parity: weighted per-pixel sigmoid CE, summed over
    HWC, averaged over batch."""
    loss_mult = labels * (pos_loss_mult - neg_loss_mult) + neg_loss_mult
    per_pix = sigmoid_cross_entropy(scores, labels) * loss_mult
    return jnp.mean(jnp.sum(per_pix, axis=(1, 2, 3)))


def l2_regularization_loss(params_list, weight_decay: float):
    """util/loss.py:28-32 parity: wd * sum(0.5*||w||^2) over the given leaves."""
    l2 = sum(0.5 * jnp.sum(jnp.square(p)) for p in params_list)
    return weight_decay * l2


def dsc_loss(scores, labels):
    """Dice loss (util/loss.py:34-40)."""
    probs = jax.nn.sigmoid(scores)
    inter = 2.0 * jnp.sum(probs * labels, axis=(1, 2, 3))
    union = jnp.sum(probs, axis=(1, 2, 3)) + jnp.sum(labels, axis=(1, 2, 3))
    return jnp.mean(1.0 - inter / union)


def iou_loss(scores, labels):
    """Soft-IoU loss (util/loss.py:42-49)."""
    probs = jax.nn.sigmoid(scores)
    inter = jnp.sum(probs * labels, axis=(1, 2, 3))
    union = (jnp.sum(probs, axis=(1, 2, 3)) + jnp.sum(labels, axis=(1, 2, 3))
             - inter)
    return jnp.mean(1.0 - inter / union)


def iou_with_threshold(scores_a, scores_b, threshold: float = 0.5):
    """Thresholded-mask IoU between two sigmoid maps (util/loss.py:51-68)."""
    mask_a = (scores_a > threshold).astype(jnp.float32)
    mask_b = (scores_b > threshold).astype(jnp.float32)
    inter = jnp.sum(mask_a * mask_b, axis=(1, 2, 3))
    union = (jnp.sum(mask_a, axis=(1, 2, 3)) + jnp.sum(mask_b, axis=(1, 2, 3))
             - inter)
    return jnp.mean(inter / union)


def smooth_l1_loss(scores, labels, ld: float = 1.0):
    """Smooth-L1 box loss (util/loss.py:72-80)."""
    diff = scores - labels
    abs_diff = jnp.abs(diff)
    sign = jax.lax.stop_gradient((abs_diff < 1.0).astype(jnp.float32))
    raw = jnp.square(diff) * 0.5 * sign + (abs_diff - 0.5) * (1.0 - sign)
    return ld * jnp.mean(jnp.sum(raw, axis=1))

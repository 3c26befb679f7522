"""Optional YOLO-style bbox detection head ("v5+" surface).

The reference ships a driver that feeds `label_bbox [B,S,S,3,5]` /
`true_bbox [B,1,4]` placeholders (trainval_model_v5+.py:74-75,92-102,123-124)
with anchors from data/anchors.txt, but the model defining the head is
ABSENT from the snapshot (SURVEY.md section 2.2).  This module supplies a
TPU-native head consistent with that driver surface and with the label
assigner (util/processing_tools.py:87-146 -> data/anchors.py):

- head: 3x3 conv on the fused feature -> [B, S, S, A, 5] raw predictions;
- decode: xy = (cell + sigmoid(t_xy)) * stride, wh = anchor * exp(t_wh)
  * stride, conf = sigmoid(t_conf) — all in input-pixel units, matching the
  label grid (label xywh is stored in input pixels);
- loss (YOLOv3-style, a design choice since the reference head is absent):
  GIoU coordinate loss scaled by (2 - area/input^2) on assigned anchors,
  BCE objectness with an ignore band where predicted boxes overlap the true
  box with IoU > 0.5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cmpc_refseg_tpu.ops.layers import conv2d, init_conv

IGNORE_IOU = 0.5


def init_bbox_head(key, cfg):
    return {"conv": init_conv(key, 3, cfg.mlp_dim, cfg.num_anchors * 5)}


def apply_bbox_head(params, fused, anchors, *, stride: int = 8):
    """fused [B,S,S,mlp] -> (raw [B,S,S,A,5], decoded [B,S,S,A,5]).
    decoded = (x, y, w, h in input pixels, objectness probability)."""
    b, s1, s2, _ = fused.shape
    a = anchors.shape[0]
    raw = conv2d(params["conv"], fused.astype(jnp.float32)
                 ).reshape(b, s1, s2, a, 5)
    gy = jax.lax.broadcasted_iota(jnp.float32, (s1, s2), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (s1, s2), 1)
    grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]  # [1,S,S,1,2]
    xy = (jax.nn.sigmoid(raw[..., 0:2]) + grid) * stride
    wh = jnp.exp(jnp.clip(raw[..., 2:4], -10.0, 8.0)) * \
        jnp.asarray(anchors, jnp.float32) * stride
    conf = jax.nn.sigmoid(raw[..., 4:5])
    return raw, jnp.concatenate([xy, wh, conf], axis=-1)


def _iou_xywh(a, b):
    """IoU of broadcastable center-format boxes (jnp)."""
    a1 = jnp.concatenate([a[..., :2] - a[..., 2:4] * 0.5,
                          a[..., :2] + a[..., 2:4] * 0.5], -1)
    b1 = jnp.concatenate([b[..., :2] - b[..., 2:4] * 0.5,
                          b[..., :2] + b[..., 2:4] * 0.5], -1)
    lu = jnp.maximum(a1[..., :2], b1[..., :2])
    rd = jnp.minimum(a1[..., 2:], b1[..., 2:])
    inter = jnp.prod(jnp.maximum(rd - lu, 0.0), -1)
    union = (a[..., 2] * a[..., 3] + b[..., 2] * b[..., 3] - inter)
    return inter / jnp.maximum(union, 1e-6)


def _giou_xywh(a, b):
    """GIoU = IoU - (enclose - union) / enclose, center-format boxes."""
    a1 = jnp.concatenate([a[..., :2] - a[..., 2:4] * 0.5,
                          a[..., :2] + a[..., 2:4] * 0.5], -1)
    b1 = jnp.concatenate([b[..., :2] - b[..., 2:4] * 0.5,
                          b[..., :2] + b[..., 2:4] * 0.5], -1)
    lu_i = jnp.maximum(a1[..., :2], b1[..., :2])
    rd_i = jnp.minimum(a1[..., 2:], b1[..., 2:])
    inter = jnp.prod(jnp.maximum(rd_i - lu_i, 0.0), -1)
    union = a[..., 2] * a[..., 3] + b[..., 2] * b[..., 3] - inter
    iou = inter / jnp.maximum(union, 1e-6)
    lu_e = jnp.minimum(a1[..., :2], b1[..., :2])
    rd_e = jnp.maximum(a1[..., 2:], b1[..., 2:])
    enclose = jnp.prod(jnp.maximum(rd_e - lu_e, 0.0), -1)
    return iou - (enclose - union) / jnp.maximum(enclose, 1e-6)


def bbox_loss(raw, decoded, label_bbox, true_bbox, *, input_size: int):
    """YOLOv3-style detection loss.

    raw/decoded [B,S,S,A,5]; label_bbox [B,S,S,A,5] (xywh px + objectness);
    true_bbox [B,M,4] xywh px.  Returns scalar (batch mean).
    """
    obj = label_bbox[..., 4:5]
    gt_xywh = label_bbox[..., 0:4]
    pred_xywh = decoded[..., 0:4]
    conf_logit = raw[..., 4:5]

    scale = 2.0 - (gt_xywh[..., 2:3] * gt_xywh[..., 3:4]
                   ) / float(input_size) ** 2
    giou = _giou_xywh(pred_xywh, gt_xywh)[..., None]
    giou_loss = obj * scale * (1.0 - giou)

    # ignore band: predicted boxes overlapping ANY true box above the
    # threshold are not penalized as background
    iou_true = _iou_xywh(pred_xywh[:, :, :, :, None, :],
                         true_bbox[:, None, None, None, :, :])
    max_iou = jnp.max(iou_true, axis=-1)[..., None]
    background = (1.0 - obj) * (max_iou < IGNORE_IOU).astype(jnp.float32)

    bce = jnp.maximum(conf_logit, 0) - conf_logit * obj + \
        jnp.log1p(jnp.exp(-jnp.abs(conf_logit)))
    conf_loss = (obj + background) * bce

    per_sample = jnp.sum(giou_loss + conf_loss, axis=(1, 2, 3, 4))
    return jnp.mean(per_sample)

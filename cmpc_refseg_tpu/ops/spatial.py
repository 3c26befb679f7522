"""Spatial coordinate features.

The CMPC fusion concatenates an 8-dim normalized coordinate grid to every
feature-map cell (reference: util/processing_tools.py:5-17, used at
CMPC_model.py:116).  The reference builds it with a Python double loop at
graph-construction time; here it is a vectorized constant computed at trace
time (XLA constant-folds it).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def spatial_coordinate_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """[h, w, 8] grid of (xmin, ymin, xmax, ymax, xctr, yctr, 1/w, 1/h).

    Matches util/processing_tools.py:5-17 exactly (coordinates in [-1, 1],
    per-cell box corners/centers plus inverse extent).
    """
    # compute in float64 (the reference uses Python floats) then cast
    ws = np.arange(w, dtype=np.float64)
    hs = np.arange(h, dtype=np.float64)
    xmin = ws / w * 2 - 1
    xmax = (ws + 1) / w * 2 - 1
    xctr = (xmin + xmax) / 2
    ymin = hs / h * 2 - 1
    ymax = (hs + 1) / h * 2 - 1
    yctr = (ymin + ymax) / 2

    grid = np.zeros((h, w, 8), dtype=np.float32)
    grid[:, :, 0] = xmin[None, :]
    grid[:, :, 1] = ymin[:, None]
    grid[:, :, 2] = xmax[None, :]
    grid[:, :, 3] = ymax[:, None]
    grid[:, :, 4] = xctr[None, :]
    grid[:, :, 5] = yctr[:, None]
    grid[:, :, 6] = 1.0 / w
    grid[:, :, 7] = 1.0 / h
    return jnp.asarray(grid, dtype=dtype)


def spatial_batch(batch: int, h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """[batch, h, w, 8] tiled grid (generate_spatial_batch parity)."""
    return jnp.broadcast_to(spatial_coordinate_grid(h, w, dtype)[None],
                            (batch, h, w, 8))


def generate_bilinear_filter(stride: int) -> np.ndarray:
    """[2*stride, 2*stride, 1, 1] bilinear upsampling kernel
    (util/processing_tools.py:19-22): the outer product of a triangular
    ramp 0..stride..1 — the classic FCN deconv initializer."""
    f = np.concatenate((np.arange(0, stride),
                        np.arange(stride, 0, -1))) / stride
    return np.outer(f, f).astype(np.float32)[:, :, np.newaxis, np.newaxis]


def spatial_feature_from_bbox(bboxes, imsize) -> np.ndarray:
    """[N, 8] normalized box features (util/processing_tools.py:44-60):
    corners/center in [-1, 1] plus width/height; imsize is (w, h)."""
    bboxes = np.asarray(bboxes).reshape((-1, 4))
    im_w, im_h = imsize
    assert np.all(bboxes[:, 0] < im_w) and np.all(bboxes[:, 2] < im_w)
    assert np.all(bboxes[:, 1] < im_h) and np.all(bboxes[:, 3] < im_h)
    feats = np.zeros((bboxes.shape[0], 8))
    feats[:, 0] = bboxes[:, 0] * 2.0 / im_w - 1   # x1
    feats[:, 1] = bboxes[:, 1] * 2.0 / im_h - 1   # y1
    feats[:, 2] = bboxes[:, 2] * 2.0 / im_w - 1   # x2
    feats[:, 3] = bboxes[:, 3] * 2.0 / im_h - 1   # y2
    feats[:, 4] = (feats[:, 0] + feats[:, 2]) / 2  # x center
    feats[:, 5] = (feats[:, 1] + feats[:, 3]) / 2  # y center
    feats[:, 6] = feats[:, 2] - feats[:, 0]        # w
    feats[:, 7] = feats[:, 3] - feats[:, 1]        # h
    return feats

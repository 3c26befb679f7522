"""Greedy non-maximum suppression.

Reference: util/nms.pyx:17-68 (Cython `cpu_nms`, Fast R-CNN lineage; imported
dormant at util/eval_tools.py:4-5).  Three implementations:

1. `nms_native` — C++ (native/nms.cpp via ctypes), the Cython equivalent.
2. `nms_numpy`  — vectorized host reference.
3. `nms_jax`    — on-device O(N^2) masked variant (static shapes, jittable)
   for batched detection heads.
All use the Fast R-CNN +1 box-area convention to match the reference.
"""

from __future__ import annotations

import ctypes
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _load_native():
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cand = os.path.join(here, "native", "libnms.so")
    if os.path.isfile(cand):
        lib = ctypes.CDLL(cand)
        lib.greedy_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # dets [N,5]
            ctypes.c_int,                    # N
            ctypes.c_float,                  # iou threshold
            ctypes.POINTER(ctypes.c_int),    # out keep indices
        ]
        lib.greedy_nms.restype = ctypes.c_int
        _NATIVE = lib
    return _NATIVE


def nms_numpy(dets: np.ndarray, thresh: float) -> list:
    """cpu_nms parity (util/nms.pyx): dets [N,5]=(x1,y1,x2,y2,score),
    returns kept indices in score order."""
    dets = np.asarray(dets, dtype=np.float64)
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    suppressed = np.zeros(len(dets), dtype=bool)
    for _i in range(len(order)):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[_i + 1:]])
        yy1 = np.maximum(y1[i], y1[order[_i + 1:]])
        xx2 = np.minimum(x2[i], x2[order[_i + 1:]])
        yy2 = np.minimum(y2[i], y2[order[_i + 1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[_i + 1:]] - inter)
        suppressed[order[_i + 1:][ovr > thresh]] = True
    return keep


def nms_native(dets: np.ndarray, thresh: float) -> list:
    """C++ NMS; falls back to numpy when the library is not built."""
    lib = _load_native()
    if lib is None:
        return nms_numpy(dets, thresh)
    dets32 = np.ascontiguousarray(dets, dtype=np.float32)
    keep = np.empty(len(dets32), dtype=np.int32)
    n = lib.greedy_nms(
        dets32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(dets32), ctypes.c_float(thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:n].tolist()


@partial(jax.jit, static_argnames=("iou_threshold",))
def nms_jax(boxes: jnp.ndarray, scores: jnp.ndarray,
            iou_threshold: float = 0.5) -> jnp.ndarray:
    """On-device greedy NMS, static shapes: returns a keep MASK [N] bool.

    O(N^2) IoU matrix + sequential suppression via lax.fori_loop — fine for
    the small N of this workload (anchors per image), fully batchable with
    vmap.
    """
    n = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = (jnp.maximum(0.0, xx2 - xx1 + 1)
             * jnp.maximum(0.0, yy2 - yy1 + 1))
    iou = inter / (areas[:, None] + areas[None, :] - inter)

    order = jnp.argsort(-scores)

    def body(k, keep):
        i = order[k]
        # i survives iff no higher-scored KEPT box overlaps it
        higher = jnp.arange(n) < k
        overlapped = (iou[i, order] > iou_threshold) & higher & keep[order]
        return keep.at[i].set(~jnp.any(overlapped))

    keep = jnp.ones((n,), bool)
    return jax.lax.fori_loop(0, n, body, keep)

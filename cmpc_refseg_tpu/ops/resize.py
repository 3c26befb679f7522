"""Bilinear resize with TF1 `tf.image.resize_bilinear` semantics.

The reference relies on TF1 legacy resize (align_corners=False, and crucially
*no* half-pixel centers): ``src = dst_index * (in_size / out_size)``
(reference uses it for score upsampling at CMPC_model.py:129-141 and target
downsampling at CMPC_model.py:439).  `jax.image.resize` uses half-pixel
centers, so it does NOT match; we build explicit 1-D interpolation matrices
instead and apply them as two matmuls.  On TPU this is also the *fast* path:
the gather-free formulation runs on the MXU and XLA fuses the pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] row-stochastic bilinear interpolation matrix with
    TF1 legacy grid mapping: src = i * in/out, clamped top edge."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == out_size:
        np.fill_diagonal(m, 1.0)
        return m
    scale = in_size / out_size
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    t = (src - lo).astype(np.float32)
    m[np.arange(out_size), lo] += 1.0 - t
    m[np.arange(out_size), hi] += t
    return m


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize NHWC (or HWC / HW) tensor to (out_h, out_w), TF1 semantics.

    Computed as ``Mh @ x @ Mw^T`` over the spatial axes — two MXU matmuls
    instead of a gather, exact to TF1 `resize_bilinear(align_corners=False)`.
    """
    squeeze_batch = False
    squeeze_chan = False
    if x.ndim == 2:
        x = x[None, :, :, None]
        squeeze_batch = squeeze_chan = True
    elif x.ndim == 3:
        x = x[None]
        squeeze_batch = True
    if x.ndim != 4:
        raise ValueError(f"resize_bilinear expects <=4D, got {x.shape}")

    in_h, in_w = x.shape[1], x.shape[2]
    mh = jnp.asarray(_interp_matrix(in_h, out_h), dtype=x.dtype)
    mw = jnp.asarray(_interp_matrix(in_w, out_w), dtype=x.dtype)
    # [B,H,W,C] -> [B,out_h,W,C] -> [B,out_h,out_w,C].  HIGHEST precision:
    # interpolation weights must not be rounded to bf16 (parity with TF1).
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,bhwc->bowc", mh, x, precision=hi)
    y = jnp.einsum("pw,bowc->bopc", mw, y, precision=hi)
    if squeeze_chan:
        y = y[..., 0]
    if squeeze_batch:
        y = y[0]
    return y

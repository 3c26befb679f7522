"""Normalization primitives matching the reference's TF1 idioms."""

from __future__ import annotations

import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis=-1, epsilon: float = 1e-12) -> jnp.ndarray:
    """`tf.nn.l2_normalize` parity: x * rsqrt(max(sum(x^2), eps)).

    Used pervasively by the reference on features and language vectors
    (e.g. CMPC_model.py:109-113,159,324,408).  Statistics accumulate in
    float32 regardless of input dtype (bf16-safe); output keeps x.dtype.
    """
    xf = x.astype(jnp.float32)
    sq = jnp.sum(jnp.square(xf), axis=axis, keepdims=True)
    inv = jnp.reciprocal(jnp.sqrt(jnp.maximum(sq, epsilon)))
    return (xf * inv).astype(x.dtype)


def tf1_layer_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                   epsilon: float = 1e-12) -> jnp.ndarray:
    """`tf.contrib.layers.layer_norm` parity.

    TF1 contrib layer_norm normalizes over ALL axes from 1 (begin_norm_axis=1)
    but parameterizes gamma/beta over the LAST axis only — not a per-channel
    layernorm.  The reference uses it inside graph conv (CMPC_model.py:364-371)
    and the ConvLSTM cell gates (util/cell.py:52-66); parity requires the
    whole-sample normalization.  Statistics accumulate in float32; output
    keeps x.dtype.
    """
    axes = tuple(range(1, x.ndim))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.var(xf, axis=axes, keepdims=True)
    inv = jnp.reciprocal(jnp.sqrt(var + epsilon))
    return ((xf - mean) * inv * gamma + beta).astype(x.dtype)

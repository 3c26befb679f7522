"""Functional layer primitives: conv / pooling / initializers.

Plain-pytree design: every layer is an ``init_*`` returning a param dict and
an ``apply``-style function.  Parameter leaf names mirror the reference TF
variable names ('DW' / 'biases', CMPC_model.py:412-417) so the checkpoint
converter is a pure name map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# NHWC activations, HWIO kernels — the native TPU conv layout.
DIMS = ("NHWC", "HWIO", "NHWC")


class InitStream:
    """Host-side deterministic key stream for parameter init.

    Init is 100%% numpy: dispatching hundreds of tiny jax ops (zeros/ones/
    random/split, one XLA compile per distinct shape) costs minutes of wall
    clock on a small host, while numpy is instant and equally deterministic.
    Accepts a JAX PRNGKey (or int) at the root for API compatibility.
    """

    def __init__(self, seed):
        if isinstance(seed, np.random.SeedSequence):
            self.ss = seed
        elif isinstance(seed, int):
            self.ss = np.random.SeedSequence(seed)
        else:  # JAX PRNGKey (old uint32 vector or new typed key)
            data = np.asarray(jax.random.key_data(seed)).ravel()
            self.ss = np.random.SeedSequence([int(x) for x in data])

    def split(self, n: int):
        return [InitStream(c) for c in self.ss.spawn(n)]

    def rng(self) -> np.random.Generator:
        return np.random.default_rng(self.ss.spawn(1)[0])


def as_stream(key) -> InitStream:
    return key if isinstance(key, InitStream) else InitStream(key)


def split_stream(key, n: int):
    return as_stream(key).split(n)


def xavier_conv_init(key, shape, dtype=np.float32):
    """`tf.contrib.layers.xavier_initializer_conv2d` parity (glorot uniform
    with receptive-field-scaled fans)."""
    kh, kw, cin, cout = shape
    fan_in = kh * kw * cin
    fan_out = kh * kw * cout
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return as_stream(key).rng().uniform(-limit, limit, shape).astype(dtype)


def glorot_uniform(key, shape, dtype=np.float32):
    """TF1 `get_variable` default initializer for >=2D variables."""
    fan_in = int(np.prod(shape[:-1]))
    fan_out = int(shape[-1])
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return as_stream(key).rng().uniform(-limit, limit, shape).astype(dtype)


def normal_init(key, shape, stddev=0.01, dtype=np.float32):
    return (stddev * as_stream(key).rng().standard_normal(shape)).astype(dtype)


def init_conv(key, ksize: int, cin: int, cout: int, *, bias: bool = True,
              initializer=xavier_conv_init):
    """Conv param dict ({'DW': [k,k,cin,cout], 'biases': [cout]})."""
    p = {"DW": initializer(key, (ksize, ksize, cin, cout))}
    if bias:
        p["biases"] = np.zeros((cout,), np.float32)
    return p


def conv2d(params, x, *, stride: int = 1, dilation: int = 1,
           compute_dtype=None):
    """SAME conv (reference _conv at CMPC_model.py:412-417 /
    _atrous_conv at :419-424).

    Mixed-precision contract: the MXU matmul runs in ``compute_dtype`` if
    given, else in ``x.dtype`` (f32 params are down-cast to match bf16
    activations, never the reverse).  In f32 we request f32 accumulation
    explicitly; in bf16 the output stays bf16 (conv_general_dilated's
    transpose rule cannot mix a f32 cotangent with bf16 operands, so a
    trainable bf16 conv must keep one dtype end-to-end — the MXU still
    accumulates partial products in f32 internally).
    """
    w = params["DW"]
    out_dtype = jnp.dtype(compute_dtype) if compute_dtype is not None \
        else x.dtype
    x = x.astype(out_dtype)
    w = w.astype(out_dtype)
    preferred = jnp.float32 if out_dtype == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=DIMS,
        preferred_element_type=preferred,
    )
    if "biases" in params:
        y = y + params["biases"].astype(out_dtype)
    return y.astype(out_dtype)


def dense(params, x, *, compute_dtype=None):
    """x @ DW + biases for the last axis (same dtype contract as conv2d;
    matmul transpose supports preferred_element_type, so f32 accumulation
    is always requested)."""
    w = params["DW"]
    out_dtype = jnp.dtype(compute_dtype) if compute_dtype is not None \
        else x.dtype
    x = x.astype(out_dtype)
    w = w.astype(out_dtype)
    y = jnp.matmul(x, w, preferred_element_type=jnp.float32)
    if "biases" in params:
        y = y + params["biases"]
    return y.astype(out_dtype)


def max_pool(x, ksize: int, stride: int):
    """SAME max pool (backbone pool1, deeplab_resnet/model.py:22)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, ksize, ksize, 1),
        window_strides=(1, stride, stride, 1),
        padding="SAME",
    )


def init_layer_norm(cout: int):
    """gamma/beta for tf1_layer_norm (last-axis params)."""
    return {"gamma": np.ones((cout,), np.float32),
            "beta": np.zeros((cout,), np.float32)}

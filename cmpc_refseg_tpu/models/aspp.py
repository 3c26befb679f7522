"""ASPP + DeepLabv3+ decoder head (v4/v5/v6/BERT variants).

Reference: CMPCv4_model.py:199-242 (ASPP, rates 6/12/18 + image-level
pooling) and :181-197 (v3+ decoder with the res2b_relu 48-channel lateral).

This is the one reference subgraph with LIVE BatchNorm (slim conv2d under
resnet_arg_scope, is_training = mode=='train'); everything else runs frozen
BN.  We carry BN moving statistics as an explicit `state` pytree —
functionally threaded through apply (no mutation under jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from cmpc_refseg_tpu.ops.layers import init_conv, conv2d, split_stream
from cmpc_refseg_tpu.ops.resize import resize_bilinear

BN_EPS = 1e-5
BN_DECAY = 0.9997


def _init_bn_unit(key, ksize, cin, cout):
    """slim conv2d with normalizer_fn=batch_norm: conv (no bias) + BN."""
    return {
        "DW": init_conv(key, ksize, cin, cout, bias=False)["DW"],
        "gamma": np.ones((cout,), np.float32),
        "beta": np.zeros((cout,), np.float32),
    }


def _init_bn_state(cout):
    return {"mean": np.zeros((cout,), np.float32),
            "var": np.ones((cout,), np.float32)}


def _apply_bn_unit(p, s, x, *, dilation=1, train=False, relu=True):
    y = conv2d({"DW": p["DW"]}, x, dilation=dilation)
    yf = y.astype(jnp.float32)           # BN statistics always f32
    if train:
        axes = (0, 1, 2)
        mean = jnp.mean(yf, axis=axes)
        var = jnp.var(yf, axis=axes)
        new_s = {
            "mean": s["mean"] * BN_DECAY + mean * (1 - BN_DECAY),
            "var": s["var"] * BN_DECAY + var * (1 - BN_DECAY),
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    yf = (yf - mean) * jax.lax.rsqrt(var + BN_EPS) * p["gamma"] + p["beta"]
    if relu:
        yf = jax.nn.relu(yf)
    return yf.astype(y.dtype), new_s


_ASPP_UNITS = ("conv_1x1", "conv_3x3_1", "conv_3x3_2", "conv_3x3_3",
               "image_level", "conv_1x1_concat")
ASPP_RATES = (6, 12, 18)   # output_stride=16 call site (CMPCv4_model.py:152)
ASPP_DEPTH = 256


def init_aspp(key, cfg, cin: int):
    ks = split_stream(key, 6)
    params, state = {}, {}
    dims = {
        "conv_1x1": (1, cin), "conv_3x3_1": (3, cin), "conv_3x3_2": (3, cin),
        "conv_3x3_3": (3, cin), "image_level": (1, cin),
        "conv_1x1_concat": (1, 5 * ASPP_DEPTH),
    }
    for k, name in zip(ks, _ASPP_UNITS):
        ksize, c_in = dims[name]
        params[name] = _init_bn_unit(k, ksize, c_in, ASPP_DEPTH)
        state[name] = _init_bn_state(ASPP_DEPTH)
    return params, state


def apply_aspp(params, state, x, *, train=False):
    """x [B,h,w,C] -> [B,h,w,256] (CMPCv4_model.py:199-242)."""
    h, w = x.shape[1], x.shape[2]
    new_state = {}
    c1, new_state["conv_1x1"] = _apply_bn_unit(
        params["conv_1x1"], state["conv_1x1"], x, train=train)
    branches = [c1]
    for i, rate in enumerate(ASPP_RATES, start=1):
        name = f"conv_3x3_{i}"
        b, new_state[name] = _apply_bn_unit(
            params[name], state[name], x, dilation=rate, train=train)
        branches.append(b)
    # image-level features: GAP -> 1x1 conv+BN -> upsample
    gap = jnp.mean(x, axis=(1, 2), keepdims=True)
    il, new_state["image_level"] = _apply_bn_unit(
        params["image_level"], state["image_level"], gap, train=train)
    il = jnp.broadcast_to(il, (x.shape[0], h, w, ASPP_DEPTH))
    branches.append(il)

    cat = jnp.concatenate(branches, axis=-1)
    out, new_state["conv_1x1_concat"] = _apply_bn_unit(
        params["conv_1x1_concat"], state["conv_1x1_concat"], cat, train=train)
    return out, new_state


def init_v3plus_decoder(key, cfg, c2_dim: int = 256):
    k1, k2, k3, k4 = split_stream(key, 4)
    params = {
        "low_level": _init_bn_unit(k1, 1, c2_dim, 48),
        "conv_3x3_1": _init_bn_unit(k2, 3, ASPP_DEPTH + 48, ASPP_DEPTH),
        "conv_3x3_2": _init_bn_unit(k3, 3, ASPP_DEPTH, ASPP_DEPTH),
        "conv_1x1": init_conv(k4, 1, ASPP_DEPTH, 1),   # bias, no BN/act
    }
    state = {
        "low_level": _init_bn_state(48),
        "conv_3x3_1": _init_bn_state(ASPP_DEPTH),
        "conv_3x3_2": _init_bn_state(ASPP_DEPTH),
    }
    return params, state


def apply_v3plus_decoder(params, state, encoder_output, c2, *, train=False):
    """DeepLabv3+ decoder (CMPCv4_model.py:181-197): 48-ch c2 lateral,
    upsample encoder to c2 resolution, 2x 3x3 conv, 1x1 logits."""
    new_state = {}
    low, new_state["low_level"] = _apply_bn_unit(
        params["low_level"], state["low_level"], c2, train=train)
    up = resize_bilinear(encoder_output, low.shape[1], low.shape[2])
    net = jnp.concatenate([up, low], axis=-1)
    net, new_state["conv_3x3_1"] = _apply_bn_unit(
        params["conv_3x3_1"], state["conv_3x3_1"], net, train=train)
    net, new_state["conv_3x3_2"] = _apply_bn_unit(
        params["conv_3x3_2"], state["conv_3x3_2"], net, train=train)
    net = conv2d(params["conv_1x1"], net.astype(jnp.float32))  # f32 logits
    return net, new_state

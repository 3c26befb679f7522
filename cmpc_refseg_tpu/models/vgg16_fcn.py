"""Atrous VGG16-FCN alternative backbone.

Parity surface for the reference's unused alternative backbone
(util/vgg16_fcn.py:7-36): VGG16 with pool4/pool5 removed (conv4/conv5 run at
pool3 resolution, i.e. output stride 8 on the conv path) and the classifier
head made fully convolutional (fc6 as a 7x7 conv, fc7/fc8 as 1x1 convs).

TPU-native: NHWC convs in the configured compute dtype with f32 MXU
accumulation; biases/ReLU fuse into the conv epilogue under XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cmpc_refseg_tpu.ops.layers import conv2d, init_conv, max_pool, split_stream

# (name, kernel, cin, cout, relu) in forward order; pools noted separately.
_SPEC = (
    ("conv1_1", 3, 3, 64), ("conv1_2", 3, 64, 64),          # -> pool1
    ("conv2_1", 3, 64, 128), ("conv2_2", 3, 128, 128),      # -> pool2
    ("conv3_1", 3, 128, 256), ("conv3_2", 3, 256, 256),
    ("conv3_3", 3, 256, 256),                               # -> pool3
    ("conv4_1", 3, 256, 512), ("conv4_2", 3, 512, 512),
    ("conv4_3", 3, 512, 512),
    ("conv5_1", 3, 512, 512), ("conv5_2", 3, 512, 512),
    ("conv5_3", 3, 512, 512),
    ("fc6", 7, 512, 4096), ("fc7", 1, 4096, 4096),
)
_POOL_AFTER = {"conv1_2", "conv2_2", "conv3_3"}


def init_vgg16_fcn(key):
    keys = split_stream(key, len(_SPEC) + 1)
    params = {name: init_conv(k, ks, cin, cout)
              for k, (name, ks, cin, cout) in zip(keys, _SPEC)}
    params["fc8"] = init_conv(keys[-1], 1, 4096, 1000)
    return params


def apply_vgg16_fcn(params, im: jnp.ndarray, *, compute_dtype=None) -> dict:
    """Forward on [B,H,W,3]; returns every named activation (the reference
    exposes each layer as an attribute — here a dict), with 'fc8' the final
    1000-channel fully-convolutional logits at stride 8."""
    outputs = {}
    x = im
    for name, *_ in _SPEC:
        x = jax.nn.relu(conv2d(params[name], x, compute_dtype=compute_dtype))
        outputs[name] = x
        if name in _POOL_AFTER:
            x = max_pool(x, 2, 2)
            outputs["pool" + name[4]] = x
    x = conv2d(params["fc8"], x, compute_dtype=compute_dtype)  # no relu
    outputs["fc8"] = x
    return outputs

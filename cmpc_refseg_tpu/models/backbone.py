"""DeepLab ResNet-101 backbone (output stride 8, atrous res4/res5).

Reference: external/tensorflow-deeplab-resnet/deeplab_resnet/model.py —
conv1 7x7/2 + pool/2 -> res2 (stride 4) -> res3 (stride 8) -> res4 with
atrous rate 2 (23 blocks, stride stays 8) -> res5 with atrous rate 4.
CMPC taps res2b_relu / res3b3_relu / res4b22_relu / res5c_relu
(CMPC_model.py:73-76, CMPCv4_model.py:85-88).

TPU-native design decisions:
- The reference always runs backbone BN with frozen statistics
  (``is_training=False`` at CMPC_model.py:73), and BN beta/gamma are never in
  the trainable set (train_op filters on 'res*' prefixes, CMPC_model.py:427-432,
  which excludes 'bn*' variables).  So BN is a per-channel affine CONSTANT:
  we fold it to scale/offset at conversion time
  (scale = gamma/sqrt(var+1e-3), offset = beta - mean*scale; slim.batch_norm
  epsilon=0.001, kaffe/tensorflow/network.py:261-270) and apply it fused with
  the conv — one multiply-add that XLA fuses into the conv epilogue.
- Convs run in the configured compute dtype (bfloat16 on TPU) with float32
  accumulation on the MXU; the folded affine + ReLU stay in the epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cmpc_refseg_tpu.ops.layers import (DIMS, max_pool, split_stream,
                                         xavier_conv_init)

def resnet_stages(res4_blocks: int = 23):
    """Stage spec: (stage, block names, mid, out, stride, dilation).
    res4_blocks=23 is ResNet-101 (the reference); smaller values give
    shallower test/ablation backbones with identical topology."""
    return (
        ("res2", ("a", "b", "c"), 64, 256, 1, 1),
        ("res3", ("a", "b1", "b2", "b3"), 128, 512, 2, 1),
        ("res4", ("a",) + tuple(f"b{i}" for i in range(1, res4_blocks)),
         256, 1024, 1, 2),
        ("res5", ("a", "b", "c"), 512, 2048, 1, 4),
    )


def taps_for(stages):
    """Feature taps exposed to the CMPC heads: c2 = res2b_relu (NOT the stage
    end, CMPCv4_model.py:88), c3/c4/c5 = last block of res3/res4/res5."""
    last = {s[0]: s[1][-1] for s in stages}
    return {
        "c2": "res2b_relu",
        "c3": f"res3{last['res3']}_relu",
        "c4": f"res4{last['res4']}_relu",
        "c5": f"res5{last['res5']}_relu",
    }


def _init_unit(key, k, cin, cout):
    """One conv+foldedBN unit: kernel + folded scale/offset."""
    return {
        "w": xavier_conv_init(key, (k, k, cin, cout)),
        "scale": np.ones((cout,), np.float32),
        "offset": np.zeros((cout,), np.float32),
    }


def init_backbone(key, res4_blocks: int = 23) -> dict:
    """Parameter pytree for the ResNet DeepLab backbone."""
    keys = iter(split_stream(key, 512))
    params = {"conv1": _init_unit(next(keys), 7, 3, 64)}
    cin = 64
    for stage, blocks, mid, cout, _, _ in resnet_stages(res4_blocks):
        for bi, b in enumerate(blocks):
            bp = {}
            if bi == 0:
                bp["branch1"] = _init_unit(next(keys), 1, cin, cout)
            bp["branch2a"] = _init_unit(next(keys), 1, cin if bi == 0 else cout, mid)
            bp["branch2b"] = _init_unit(next(keys), 3, mid, mid)
            bp["branch2c"] = _init_unit(next(keys), 1, mid, cout)
            params[f"{stage}{b}"] = bp
        cin = cout
    return params


def quantize_backbone(params_bb: dict) -> dict:
    """Symmetric per-output-channel int8 weight quantization for serving.

    Returns a new backbone pytree whose conv units carry ``w_q`` (int8
    HWIO kernel) and ``w_scale`` ([cout] dequant scale); ``_conv_bn``
    auto-detects these and runs the int8 MXU path (2x the bf16 MACs/cycle
    on v5e) with dynamic per-tensor activation quantization.  Opt-in,
    inference-only — the reference has no quantization (its serving export
    ships the f32 graph, export_model_serving.py:57-71); this is a
    TPU-native extra, off by default and excluded from the official bench.
    """
    def q(unit):
        w = np.asarray(unit["w"], np.float32)
        amax = np.abs(w.reshape(-1, w.shape[-1])).max(axis=0)
        w_scale = np.maximum(amax, 1e-12) / 127.0
        w_q = np.clip(np.rint(w / w_scale), -127, 127).astype(np.int8)
        # drop the f32 kernel: the int8 path never reads it, and keeping it
        # would grow serving HBM ~25% instead of shrinking it 4x
        rest = {k: v for k, v in unit.items() if k != "w"}
        return {**rest, "w_q": w_q, "w_scale": w_scale.astype(np.float32)}

    def walk(node):
        if isinstance(node, dict) and "w" in node:
            return q(node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params_bb)


def _conv_bn(unit, x, *, stride=1, dilation=1, relu=True, compute_dtype=None,
             record=None, name=None):
    if record is not None and name is not None:
        record[name] = jnp.max(jnp.abs(x).astype(jnp.float32))
    if "w_q" in unit:
        # int8 path: symmetric per-tensor activation scale — static
        # ("x_scale", from calibrate_backbone) or dynamic (abs-max each
        # call); the dequant (s_x * w_scale) folds into the BN affine
        # epilogue.
        x = x.astype(jnp.float32)
        if "x_scale" in unit:
            s_x = unit["x_scale"]
        else:
            s_x = (jnp.max(jnp.abs(x)) + 1e-12) / 127.0
        xq = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, unit["w_q"], window_strides=(stride, stride), padding="SAME",
            rhs_dilation=(dilation, dilation), dimension_numbers=DIMS,
            preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * (s_x * unit["w_scale"] * unit["scale"])
             + unit["offset"])
        if relu:
            y = jnp.maximum(y, 0.0)
        if compute_dtype is not None:
            y = y.astype(compute_dtype)
        return y
    w = unit["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # bf16 path keeps one dtype through the conv (its transpose rule cannot
    # mix a f32 cotangent with bf16 operands when conv5 training is on); the
    # folded-BN affine then runs in f32 and re-casts.
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        rhs_dilation=(dilation, dilation), dimension_numbers=DIMS,
        preferred_element_type=preferred)
    y = y.astype(jnp.float32) * unit["scale"] + unit["offset"]
    if relu:
        y = jnp.maximum(y, 0.0)
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
    return y


def apply_backbone(params: dict, im: jnp.ndarray, *, compute_dtype=None,
                   taps=("c2", "c3", "c4", "c5"),
                   res4_blocks: int = 23, record=None) -> dict:
    """Forward the backbone on mean-subtracted BGR images [B,H,W,3].

    Returns the requested taps as {'c2': [B,H/4,W/4,256], 'c3': [B,H/8,.,512],
    'c4': [B,H/8,.,1024], 'c5': [B,H/8,.,2048]} (fp32).

    `record` (dict) collects per-unit input abs-max (traced scalars, works
    under jit) for int8 calibration — see ``calibrate_backbone``.
    """
    x = _conv_bn(params["conv1"], im, stride=2, compute_dtype=compute_dtype,
                 record=record, name="conv1")
    x = max_pool(x, 3, 2)

    outputs = {}
    stages = resnet_stages(res4_blocks)
    want = {taps_for(stages)[t]: t for t in taps}
    for stage, blocks, _, _, stride, dilation in stages:
        for bi, b in enumerate(blocks):
            bname = f"{stage}{b}"
            bp = params[bname]
            block_stride = stride if bi == 0 else 1
            if bi == 0:
                shortcut = _conv_bn(bp["branch1"], x, stride=block_stride,
                                    relu=False, compute_dtype=compute_dtype,
                                    record=record, name=f"{bname}/branch1")
            else:
                shortcut = x
            y = _conv_bn(bp["branch2a"], x, stride=block_stride,
                         compute_dtype=compute_dtype,
                         record=record, name=f"{bname}/branch2a")
            y = _conv_bn(bp["branch2b"], y, dilation=dilation,
                         compute_dtype=compute_dtype,
                         record=record, name=f"{bname}/branch2b")
            y = _conv_bn(bp["branch2c"], y, relu=False,
                         compute_dtype=compute_dtype,
                         record=record, name=f"{bname}/branch2c")
            x = jnp.maximum(shortcut + y, 0.0)
            name = f"{bname}_relu"
            if name in want:
                outputs[want[name]] = x.astype(jnp.float32)
    return outputs


def calibrate_backbone(params_q: dict, images, *, res4_blocks: int = 23,
                       margin: float = 1.0) -> dict:
    """Bake static int8 activation scales from calibration data.

    Runs the (quantized) backbone eagerly over `images` (a list of
    [B,H,W,3] mean-subtracted BGR arrays), records each conv unit's input
    abs-max, and returns a new pytree whose units carry
    ``x_scale = margin * amax / 127`` — the int8 path then skips the
    per-call dynamic abs-max/round reduction passes (HBM-bound, the main
    overhead of dynamic quantization). Serving-only, like
    ``quantize_backbone``.

    The whole sweep is ONE jitted forward per image (params passed as an
    argument — on tunneled platforms closing over them ships the weights
    inside the HLO)."""
    @jax.jit
    def _amaxes(q, im):
        rec: dict = {}
        apply_backbone(q, im, taps=("c5",), res4_blocks=res4_blocks,
                       record=rec)
        return rec

    agg: dict = {}
    for im in images:
        rec = _amaxes(params_q, jnp.asarray(im, jnp.float32))
        for k, v in rec.items():
            agg[k] = max(agg.get(k, 0.0), float(v))

    def walk(node, prefix):
        if isinstance(node, dict) and ("w" in node or "w_q" in node):
            key = prefix.rstrip("/")
            if "w_q" in node and key in agg:
                s = np.float32(margin * (agg[key] + 1e-12) / 127.0)
                return {**node, "x_scale": s}
            return node
        if isinstance(node, dict):
            return {k: walk(v, prefix + k + "/") for k, v in node.items()}
        return node

    return walk(params_q, "")


def backbone_trainable_filter(path: tuple) -> bool:
    """True for backbone leaves trained when conv5=True: conv kernels of
    res3/4/5 only (BN constants and conv1/res2 stay frozen — matches
    CMPC_model.py:427-432 name filtering, where 'bn*' vars never match the
    'res*' prefix and slim BN params are excluded)."""
    top = path[0] if path else ""
    return (top.startswith(("res3", "res4", "res5"))
            and path[-1] == "w")

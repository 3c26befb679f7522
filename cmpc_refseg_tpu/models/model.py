"""CMPC model family: one configurable assembly replacing the reference's 14
near-duplicate model files (see config.VARIANTS for the mapping).

Forward pipeline (CMPC_model.py:89-142 and variant deltas):
backbone taps -> text encoder -> laterals (+l2norm) -> spatial grid (+HSV) ->
language parser -> per-level lang2vis (mutan + spatial graph) -> aux score
heads -> nec_lang -> 2x gated exchange + ConvLSTM fusion -> decoder
(multiscore 3x3 conv, or ASPP + DeepLabv3+).

Functional: ``init_model`` builds (params, state); ``apply_model`` is pure
(BN statistics threaded through `state`).  Losses follow train_op
(CMPC_model.py:426-492).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from cmpc_refseg_tpu.config import ModelConfig
from cmpc_refseg_tpu.models import aspp as aspp_mod
from cmpc_refseg_tpu.models import cmpc
from cmpc_refseg_tpu.models.backbone import (apply_backbone, init_backbone)
from cmpc_refseg_tpu.models.language import encode_text, init_text_encoder
from cmpc_refseg_tpu.ops import losses as loss_ops
from cmpc_refseg_tpu.ops.layers import init_conv, conv2d, split_stream
from cmpc_refseg_tpu.ops.normalization import l2_normalize
from cmpc_refseg_tpu.ops.resize import resize_bilinear
from cmpc_refseg_tpu.ops.spatial import spatial_coordinate_grid

LATERAL_IN_DIM = {"c3": 512, "c4": 1024, "c5": 2048}


class ModelOutputs(NamedTuple):
    pred: jnp.ndarray                 # low-res logits [B,h,w,1]
    up: jnp.ndarray                   # full-res logits [B,H,W,1]
    sigm: jnp.ndarray                 # sigmoid(up)
    up_levels: dict                   # {level: [B,H,W,1]} aux logits
    words_parse: jnp.ndarray          # [B,1,T,K]
    gw: dict                          # {level: (w_aff, v_aff)} graph attn
    bbox: Optional[tuple] = None      # (raw, decoded) when cfg.bbox_head


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """`tf.image.rgb_to_hsv` parity; works on any value range (H,S in [0,1],
    V = max channel raw).  Used by HSV variants (CMPCv5_HSV_model.py:118-126)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    rng = mx - mn
    safe_rng = jnp.where(rng == 0, 1.0, rng)
    h_r = jnp.mod((g - b) / safe_rng, 6.0)
    h_g = (b - r) / safe_rng + 2.0
    h_b = (r - g) / safe_rng + 4.0
    h = jnp.where(mx == r, h_r, jnp.where(mx == g, h_g, h_b)) / 6.0
    h = jnp.where(rng == 0, 0.0, h)
    s = jnp.where(mx == 0, 0.0, rng / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx], axis=-1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_model(key, cfg: ModelConfig, glove=None):
    """Returns (params, state).  `state` holds BN moving stats (ASPP/decoder
    variants only; empty dict otherwise)."""
    keys = split_stream(key, 12)
    params = {
        "backbone": init_backbone(keys[0], cfg.res4_blocks),
        "text": init_text_encoder(keys[1], cfg, glove),
        "parser": cmpc.init_lang_parser(keys[2], cfg),
        "levels": {},
        "fusion_stack": cmpc.init_fusion_stack(keys[3], cfg),
        "laterals": {},
        "scores": {},
    }
    state = {}
    lkeys = keys[4].split(len(cfg.levels) * 3)
    for i, lv in enumerate(cfg.levels):
        params["laterals"][lv] = init_conv(
            lkeys[3 * i], 1, LATERAL_IN_DIM[lv], cfg.v_emb_dim)
        params["levels"][lv] = cmpc.init_lang2vis(lkeys[3 * i + 1], cfg)
        params["scores"][f"score_{lv}"] = init_conv(
            lkeys[3 * i + 2], 3, cfg.mlp_dim, 1)

    if cfg.bbox_head:
        from cmpc_refseg_tpu.models.detection import init_bbox_head
        params["bbox"] = init_bbox_head(keys[8], cfg)

    if cfg.decoder == "multiscore":
        params["scores"]["score"] = init_conv(keys[5], 3, cfg.mlp_dim, 1)
    elif cfg.decoder == "aspp_v3plus":
        params["aspp"], state_aspp = aspp_mod.init_aspp(
            keys[6], cfg, cfg.mlp_dim)
        params["decoder"], state_dec = aspp_mod.init_v3plus_decoder(keys[7], cfg)
        state = {"aspp": state_aspp, "decoder": state_dec}
    else:
        raise ValueError(f"unknown decoder {cfg.decoder!r}")
    return params, state


def prepare_params(params, cfg: ModelConfig, *, quantize_backbone=False):
    """Augment params with precomputed inference-only views: lane-aligned
    padded mutan weights for the Pallas fast path (ops/pallas_kernels.py
    pad_mutan_params).  Call once after init/restore for eval, serving and
    benchmarking flows; training keeps raw params (gradients must flow into
    the canonical weights).

    quantize_backbone=True additionally rewrites backbone conv units with
    int8 weights for the quantized serving path
    (models/backbone.py::quantize_backbone) — opt-in, any platform."""
    import jax as _jax
    if quantize_backbone:
        from cmpc_refseg_tpu.models.backbone import (
            quantize_backbone as _qbb)
        params = dict(params)
        params["backbone"] = _qbb(params["backbone"])
    if _jax.devices()[0].platform != "tpu":
        return params
    from cmpc_refseg_tpu.ops.pallas_kernels import pad_mutan_params
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    params = dict(params)
    params["levels"] = {
        lv: dict(level) for lv, level in params["levels"].items()}
    for level in params["levels"].values():
        for key in ("mutan", "sent_mutan"):
            if key in level:
                m = dict(level[key])
                m["pad"] = pad_mutan_params(m["vis_trans"], m["lang_trans"],
                                            compute_dtype=cd)
                level[key] = m
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def apply_model(params, state, cfg: ModelConfig, batch: dict, *,
                train: bool = False):
    """Forward pass.  batch: 'im' [B,H,W,3] (BGR, mean-subtracted), plus
    tokens ('words'+'seq_len' back-padded, or 'words'+'valid_idx'
    front-padded) or BERT features ('words_feat'+'sequence_mask')."""
    from cmpc_refseg_tpu.ops.fused_dispatch import variant_dispatch
    with variant_dispatch(cfg.variant):
        return _apply_model_body(params, state, cfg, batch, train=train)


def _apply_model_body(params, state, cfg: ModelConfig, batch: dict, *,
                      train: bool = False):
    im = batch["im"]
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    taps = tuple(cfg.levels) + (("c2",) if cfg.decoder == "aspp_v3plus" else ())
    vis = apply_backbone(params["backbone"], im, compute_dtype=compute_dtype,
                         taps=taps, res4_blocks=cfg.res4_blocks)
    if compute_dtype is not None:
        # Run the whole CMPC head in the compute dtype as well: the head is
        # ~10% of the FLOPs but dominated wall-clock in f32 (bandwidth +
        # 4x-slower MXU rate).  Norm/softmax statistics stay f32 inside the
        # ops; final score convs and logits are f32 (casts below).
        vis = {k: v.astype(compute_dtype) for k, v in vis.items()}

    text = encode_text(
        params["text"], cfg,
        words=batch.get("words"), seq_len=batch.get("seq_len"),
        valid_idx=batch.get("valid_idx"),
        words_feat=batch.get("words_feat"),
        sequence_mask=batch.get("sequence_mask"))

    words_parse = cmpc.apply_lang_parser(params["parser"], text.parse_feat,
                                         text.seq_mask)

    # laterals
    laterals = {}
    for lv in cfg.levels:
        x = conv2d(params["laterals"][lv], vis[lv])
        if cfg.tanh_lateral:
            x = jnp.tanh(x)        # v5_BiLSTM (CMPCv5_BiLSTM_model.py:121-125)
        laterals[lv] = l2_normalize(x, -1)

    # spatial grid (+ HSV channels for HSV variants)
    b = im.shape[0]
    h, w = laterals[cfg.levels[0]].shape[1:3]
    spatial = jnp.broadcast_to(spatial_coordinate_grid(h, w)[None],
                               (b, h, w, 8))
    if cfg.hsv:
        # reconstruct RGB from mean-subtracted BGR, convert, downsample
        # (CMPCv5_HSV_model.py:118-126)
        from cmpc_refseg_tpu.data.image import IMAGE_MEAN_BGR
        im_bgr = im + jnp.asarray(IMAGE_MEAN_BGR)
        im_rgb = im_bgr[..., ::-1]
        im_hsv = rgb_to_hsv(im_rgb)
        im_hsv = resize_bilinear(im_hsv, h, w)
        spatial = jnp.concatenate([spatial, im_hsv], axis=-1)

    # per-level cross-modal comprehension; the spa-graph phase runs
    # level-packed (cmpc.apply_lang2vis_multi — one grouped kernel launch
    # set for all levels)
    fusions, gw, up_levels = {}, {}, {}
    fusion_list, gw_list = cmpc.apply_lang2vis_multi(
        [params["levels"][lv] for lv in cfg.levels], cfg,
        [laterals[lv] for lv in cfg.levels], text.words_feat,
        words_parse, text.seq_mask, spatial)
    for lv, fusion_lv, gw_lv in zip(cfg.levels, fusion_list, gw_list):
        fusions[lv] = fusion_lv
        gw[lv] = gw_lv
        score_lv = conv2d(params["scores"][f"score_{lv}"],
                          fusions[lv].astype(jnp.float32))
        up_levels[lv] = resize_bilinear(score_lv, cfg.H, cfg.W)

    # necessary-language vector guides the exchange (E+A+R[+Action])
    nec = cmpc.valid_lang_feat(words_parse, text.words_feat,
                               tuple(range(cfg.parse_classes - 1)))

    fused = cmpc.apply_fusion_stack(params["fusion_stack"], cfg, fusions, nec)

    new_state = state
    if cfg.decoder == "multiscore":
        pred = conv2d(params["scores"]["score"], fused.astype(jnp.float32))
    else:
        enc_out, st_a = aspp_mod.apply_aspp(params["aspp"], state["aspp"],
                                            fused, train=train)
        pred, st_d = aspp_mod.apply_v3plus_decoder(
            params["decoder"], state["decoder"], enc_out, vis["c2"],
            train=train)
        new_state = {"aspp": st_a, "decoder": st_d}

    up = resize_bilinear(pred, cfg.H, cfg.W)
    sigm = jax.nn.sigmoid(up)

    bbox = None
    if cfg.bbox_head:
        from cmpc_refseg_tpu.models.detection import apply_bbox_head
        from cmpc_refseg_tpu.data.anchors import DEFAULT_ANCHORS
        anchors = batch.get("anchors", jnp.asarray(
            DEFAULT_ANCHORS[:cfg.num_anchors], jnp.float32))
        bbox = apply_bbox_head(params["bbox"], fused, anchors,
                               stride=cfg.H // cfg.vf_h)
    return ModelOutputs(pred, up, sigm, up_levels, words_parse, gw,
                        bbox), new_state


# ---------------------------------------------------------------------------
# loss (train_op parity, CMPC_model.py:426-447)
# ---------------------------------------------------------------------------

def _collect_reg_leaves(params, cfg):
    """Regularized leaves: every 'DW' conv kernel in the head (reference
    filters trainable names for 'DW' / slim 'weights', CMPC_model.py:433),
    plus res3/4/5 conv kernels when conv5=True."""
    leaves = []

    def walk(node, in_backbone):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "DW" and not in_backbone:
                    leaves.append(v)
                elif k == "w" and in_backbone:
                    leaves.append(v)
                else:
                    walk(v, in_backbone)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v, in_backbone)

    for k, v in params.items():
        if k == "backbone":
            if cfg.conv5:
                for name, block in v.items():
                    if name.startswith(("res3", "res4", "res5")):
                        walk(block, True)
        else:
            walk(v, False)
    return leaves


def compute_loss(outputs: ModelOutputs, target_fine: jnp.ndarray,
                 cfg: ModelConfig, params=None, *, label_bbox=None,
                 true_bbox=None, bbox_loss_weight: float = 1.0):
    """4-term weighed logistic loss + L2 reg (CMPC_model.py:439-447).
    loss_weights align to (main, c5, c4, c3) / (main, c5, c4).  With
    cfg.bbox_head and bbox labels, adds the YOLO-style detection loss
    (v5+ driver surface, trainval_model_v5+.py)."""
    metrics = {}
    main = loss_ops.weighed_logistic_loss(outputs.up, target_fine, 1, 1)
    metrics["loss_main"] = main
    total = cfg.loss_weights[0] * main
    level_order = [lv for lv in ("c5", "c4", "c3") if lv in cfg.levels]
    for wgt, lv in zip(cfg.loss_weights[1:], level_order):
        lv_loss = loss_ops.weighed_logistic_loss(
            outputs.up_levels[lv], target_fine, 1, 1)
        metrics[f"loss_{lv}"] = lv_loss
        total = total + wgt * lv_loss
    metrics["loss_cls_all"] = total
    if (cfg.bbox_head and outputs.bbox is not None
            and label_bbox is not None):
        from cmpc_refseg_tpu.models.detection import bbox_loss as _bl
        raw, decoded = outputs.bbox
        det = _bl(raw, decoded, label_bbox, true_bbox, input_size=cfg.H)
        metrics["loss_bbox"] = det
        total = total + bbox_loss_weight * det
    if params is not None:
        reg = loss_ops.l2_regularization_loss(
            _collect_reg_leaves(params, cfg), cfg.weight_decay)
        metrics["loss_reg"] = reg
        total = total + reg
    metrics["loss_total"] = total
    return total, metrics

"""CMPC video model (A2D / referring video segmentation).

Reference: CMPC_video/CMPC_video_mm_tgraph_allvec.py —
- 16-frame clip subsampled to 5 frames [0,4,8,12,15], folded into the batch
  for the shared backbone (:69-78);
- 5-way word parse {Entity, Attribute, Static-Relation, Action, Unnecessary}
  (:404-412);
- per level: mutan fusion on ALL frames (:330-366), temporal graph over
  frame vectors pooled by action-language attention (:458-503), temporal
  context (center-frame pixels attend over frame vectors, :505-530),
  spatial graph on the center frame (:431-456);
- fusion concat [center_vis, spa_graph, temp_ctx, valid_lang, spatial]
  (:396-401), then the base 2x gated exchange + ConvLSTM stack and
  score heads.

TPU-first: frame folding keeps the backbone a single big batched conv
workload; all graph convs use the factorized (never-materialize-adjacency)
form where applicable (the temporal adjacency is F x F = 5x5 — materialized,
it is trivially small).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cmpc_refseg_tpu.config import ModelConfig
from cmpc_refseg_tpu.models import cmpc
from cmpc_refseg_tpu.models.backbone import apply_backbone, init_backbone
from cmpc_refseg_tpu.models.language import encode_text, init_text_encoder
from cmpc_refseg_tpu.models.model import LATERAL_IN_DIM, ModelOutputs
from cmpc_refseg_tpu.ops.layers import conv2d, init_conv, split_stream
from cmpc_refseg_tpu.ops.normalization import l2_normalize, tf1_layer_norm
from cmpc_refseg_tpu.ops.resize import resize_bilinear
from cmpc_refseg_tpu.ops.spatial import spatial_coordinate_grid


def _init_gconv(key, dim):
    return {
        "update": init_conv(key, 1, dim, dim),
        "feat_ln": {"gamma": jnp.ones((dim,)), "beta": jnp.zeros((dim,))},
        "update_ln": {"gamma": jnp.ones((dim,)), "beta": jnp.zeros((dim,))},
    }


def _gconv_dense(gp, x_nodes, adj):
    """graph_conv with an explicit (small) adjacency [B,N,N]
    (CMPC_video...py:418-429)."""
    msg = jnp.einsum("bnm,bmc->bnc", adj, x_nodes)
    msg = tf1_layer_norm(msg[:, None], gp["feat_ln"]["gamma"],
                         gp["feat_ln"]["beta"])[:, 0]
    y = jax.nn.relu(x_nodes + msg)
    y = conv2d(gp["update"], y[:, None])[:, 0]
    y = tf1_layer_norm(y[:, None], gp["update_ln"]["gamma"],
                       gp["update_ln"]["beta"])[:, 0]
    return jax.nn.relu(y)


def init_video_level(key, cfg: ModelConfig) -> dict:
    ks = split_stream(key, 12)
    c = cfg.v_emb_dim
    return {
        "mutan": cmpc.init_mutan(ks[0], cfg),
        # temporal graph (tg_*)
        "tg_vtrans": init_conv(ks[1], 1, c, c),
        "tg_ltrans": init_conv(ks[2], 1, cfg.lang_dim, cfg.lang_dim),
        "tg_query": init_conv(ks[3], 1, c, c),
        "tg_key": init_conv(ks[4], 1, c, c),
        "tg_gconv": _init_gconv(ks[5], c),
        # temporal context
        "mm_trans": init_conv(ks[6], 1, c, c),
        "ctx_trans": init_conv(ks[7], 1, c, c),
        # spatial graph on center frame
        "graph": cmpc.init_spa_graph(ks[8], cfg),
        # fusion conv: [vis, sgraph, ctx, lang, spatial]
        "fusion": init_conv(ks[9], 1, 3 * c + cfg.lang_dim + cfg.spatial_dim,
                            cfg.mlp_dim),
    }


def _temp_graph(p, cfg, mm_feat_bf, ac_lang, b, f):
    """Temporal graph (reference :458-503): action-attention pools each frame
    to a vector, frame-frame adjacency, graph conv.  Returns [B,F,C]."""
    h, w, c = mm_feat_bf.shape[1], mm_feat_bf.shape[2], mm_feat_bf.shape[3]
    vis_trans = conv2d(p["tg_vtrans"], mm_feat_bf).reshape(b * f, h * w, c)
    lang_trans = conv2d(p["tg_ltrans"], ac_lang)            # [B,1,1,C]
    lang_bf = jnp.broadcast_to(lang_trans, (b, f, 1, lang_trans.shape[-1])
                               ).reshape(b * f, 1, -1)
    attn = jnp.einsum("bqc,bnc->bqn", lang_bf, vis_trans) / (c ** 0.5)
    attn = jax.nn.softmax(attn, axis=2)                     # [BF,1,HW]
    vis_resh = mm_feat_bf.reshape(b * f, h * w, c)
    frame_vec = jnp.einsum("bqn,bnc->bqc", attn, vis_resh)  # [BF,1,C]
    frame_vec = frame_vec.reshape(b, 1, f, c)               # [B,1,F,C]

    q = conv2d(p["tg_query"], frame_vec).reshape(b, f, c)
    k = conv2d(p["tg_key"], frame_vec).reshape(b, f, c)
    adj = jnp.einsum("bfc,bgc->bfg", q, k) / (c ** 0.5)
    adj = jax.nn.softmax(adj, axis=2)                       # [B,F,F]

    out = _gconv_dense(p["tg_gconv"], frame_vec.reshape(b, f, c), adj)
    out = l2_normalize(out.reshape(b, 1, f, c), -1)
    return out.reshape(b, f, c)


def _temp_ctx(p, cfg, center_mm, frame_vecs):
    """Temporal context (reference :505-530): center pixels attend over the
    F frame vectors.  center_mm [B,H,W,C]; frame_vecs [B,F,C] -> [B,H,W,C]."""
    b, h, w, c = center_mm.shape
    mm_trans = conv2d(p["mm_trans"], center_mm).reshape(b, h * w, c)
    ctx_trans = conv2d(p["ctx_trans"],
                       frame_vecs[:, None]).reshape(b, -1, c)  # [B,F,C]
    attn = jnp.einsum("bnc,bfc->bnf", mm_trans, ctx_trans) / (c ** 0.5)
    attn = jax.nn.softmax(attn, axis=2)
    ctx = jnp.einsum("bnf,bfc->bnc", attn, frame_vecs)
    return l2_normalize(ctx.reshape(b, h, w, c), -1)


def init_video_model(key, cfg: ModelConfig, glove=None):
    keys = split_stream(key, 8)
    params = {
        "backbone": init_backbone(keys[0], cfg.res4_blocks),
        "text": init_text_encoder(keys[1], cfg, glove),
        "parser": cmpc.init_lang_parser(keys[2], cfg),
        "levels": {}, "laterals": {}, "scores": {},
        "fusion_stack": cmpc.init_fusion_stack(keys[3], cfg),
    }
    lkeys = keys[4].split(3 * len(cfg.levels))
    for i, lv in enumerate(cfg.levels):
        params["laterals"][lv] = init_conv(lkeys[3 * i], 1,
                                           LATERAL_IN_DIM[lv], cfg.v_emb_dim)
        params["levels"][lv] = init_video_level(lkeys[3 * i + 1], cfg)
        params["scores"][f"score_{lv}"] = init_conv(lkeys[3 * i + 2], 3,
                                                    cfg.mlp_dim, 1)
    params["scores"]["score"] = init_conv(keys[5], 3, cfg.mlp_dim, 1)
    return params, {}


def apply_video_model(params, state, cfg: ModelConfig, batch: dict, *,
                      train: bool = False):
    """batch: 'clip' [B,F16,H,W,3] BGR mean-sub, text fields.  The GT frame
    is the CENTER sampled frame (reference :69-78, gtf = index F//2)."""
    from cmpc_refseg_tpu.ops.fused_dispatch import variant_dispatch
    with variant_dispatch(cfg.variant):
        return _apply_video_body(params, state, cfg, batch, train=train)


def _apply_video_body(params, state, cfg: ModelConfig, batch: dict, *,
                      train: bool = False):
    clip = batch["clip"]
    b = clip.shape[0]
    idx = jnp.asarray(cfg.sampled_frames)
    f = len(cfg.sampled_frames)
    frames = jnp.take(clip, idx, axis=1)                    # [B,F,H,W,3]
    frames_bf = frames.reshape(b * f, cfg.H, cfg.W, 3)

    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    vis = apply_backbone(params["backbone"], frames_bf,
                         compute_dtype=compute_dtype, taps=tuple(cfg.levels),
                         res4_blocks=cfg.res4_blocks)
    if compute_dtype is not None:
        # run the whole video head in the compute dtype (see model.py)
        vis = {k: v.astype(compute_dtype) for k, v in vis.items()}

    text = encode_text(params["text"], cfg, words=batch.get("words"),
                       seq_len=batch.get("seq_len"),
                       valid_idx=batch.get("valid_idx"))
    # video lang_feat: l2norm(max over words) (reference :143-145) — the
    # encoder's lang_feat is recomputed here with masked max
    mask = text.seq_mask                                    # [B,1,T,1]
    neg_inf = jnp.finfo(jnp.float32).min
    raw = jnp.where(mask > 0, text.words_feat, neg_inf)
    lang_feat = l2_normalize(jnp.max(raw, axis=2, keepdims=True), -1)
    lang_feat = lang_feat.reshape(b, 1, 1, -1)

    words_parse = cmpc.apply_lang_parser(params["parser"], text.parse_feat,
                                         text.seq_mask)

    h, w = cfg.vf_h, cfg.vf_w
    spatial = jnp.broadcast_to(spatial_coordinate_grid(h, w)[None],
                               (b, h, w, 8))
    spatial_bf = jnp.broadcast_to(spatial_coordinate_grid(h, w)[None],
                                  (b * f, h, w, 8))

    ea = cmpc.valid_lang_feat(words_parse, text.words_feat, (0, 1))
    ac = cmpc.valid_lang_feat(words_parse, text.words_feat, (3,))
    valid = cmpc.valid_lang_feat(words_parse, text.words_feat, (0, 1, 2, 3))

    fusions, up_levels, gw = {}, {}, {}
    center = f // 2
    per_level = {}
    for lv in cfg.levels:
        p = params["levels"][lv]
        lat = l2_normalize(conv2d(params["laterals"][lv], vis[lv]), -1)
        # mutan over all frames: tile lang/spatial across frames
        ea_bf = jnp.broadcast_to(ea[:, None], (b, f) + ea.shape[1:]
                                 ).reshape(b * f, 1, 1, -1)
        mm_bf = cmpc.apply_mutan(p["mutan"], ea_bf, spatial_bf, lat)

        frame_vecs = _temp_graph(p, cfg, mm_bf, ac, b, f)   # [B,F,C]

        lat_frames = lat.reshape(b, f, h, w, -1)
        mm_frames = mm_bf.reshape(b, f, h, w, -1)
        center_vis = lat_frames[:, center]
        center_mm = mm_frames[:, center]

        ctx = _temp_ctx(p, cfg, center_mm, frame_vecs)
        per_level[lv] = (center_vis, center_mm, ctx)

    # spatial graph for ALL levels in one set of packed kernel launches
    # (cmpc.apply_spa_graph_grouped — the b=1 spa-graph was the measured
    # small-batch profitability hole, VERDICT r3 #6)
    sgraphs, gw_list = cmpc.apply_spa_graph_grouped(
        [params["levels"][lv]["graph"] for lv in cfg.levels], cfg,
        [per_level[lv][1] for lv in cfg.levels], text.words_feat,
        words_parse, text.seq_mask)

    for lv, sgraph, gw_lv in zip(cfg.levels, sgraphs, gw_list):
        p = params["levels"][lv]
        center_vis, center_mm, ctx = per_level[lv]
        gw[lv] = gw_lv
        dt = center_vis.dtype
        lang_tiled = jnp.broadcast_to(valid.astype(dt),
                                      (b, h, w, valid.shape[-1]))
        feat_all = jnp.concatenate(
            [center_vis, sgraph.astype(dt), ctx.astype(dt), lang_tiled,
             spatial.astype(dt)], axis=-1)
        fusions[lv] = jax.nn.relu(conv2d(p["fusion"], feat_all))

        score_lv = conv2d(params["scores"][f"score_{lv}"],
                          fusions[lv].astype(jnp.float32))
        up_levels[lv] = resize_bilinear(score_lv, cfg.H, cfg.W)

    fused = cmpc.apply_fusion_stack(params["fusion_stack"], cfg, fusions,
                                    valid)
    pred = conv2d(params["scores"]["score"], fused.astype(jnp.float32))
    up = resize_bilinear(pred, cfg.H, cfg.W)
    return ModelOutputs(pred, up, jax.nn.sigmoid(up), up_levels,
                        words_parse, gw), state

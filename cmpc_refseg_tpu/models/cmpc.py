"""CMPC core modules: language parser, mutan fusion, relation-aware spatial
graph, gated multi-level exchange, ConvLSTM fusion (TGFE).

Reference: CMPC_model.py:144-410 (+ variant deltas, see config.py).

TPU-first redesigns (all mathematically equivalent to the reference):

* The 5 mutan heads (CMPC_model.py:295-328) are ONE wide conv producing
  [B,H,W,5,C]: a single large MXU matmul instead of 10 small ones.
* The [HW,HW] adjacency matrix (CMPC_model.py:400-405) is NEVER materialized:
  ``adj @ X = (W @ V^T) @ X = W @ (V^T @ X)`` by associativity, reducing the
  graph convolution from O(HW^2 (T+C)) to O(HW T C) — ~80x fewer FLOPs at the
  reference geometry (HW=1600, T=20, C=1000) and no 1600x1600 intermediate in
  HBM.
* All 1x1 convs lower to matmuls on the MXU (XLA does this automatically for
  NHWC convs with 1x1 kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cmpc_refseg_tpu.ops.layers import (conv2d, init_conv, init_layer_norm,
                                         split_stream)
from cmpc_refseg_tpu.ops.normalization import l2_normalize, tf1_layer_norm


# ---------------------------------------------------------------------------
# Language parser
# ---------------------------------------------------------------------------

def init_lang_parser(key, cfg):
    """2x 1x1 conv -> softmax over word types (CMPC_model.py:347-357)."""
    k1, k2 = split_stream(key, 2)
    return {
        "words_parse_1": init_conv(k1, 1, cfg.lang_dim, 500),
        "words_parse_2": init_conv(k2, 1, 500, cfg.parse_classes),
    }


def apply_lang_parser(params, words_feat, seq_mask):
    """words_feat [B,1,T,C] -> words_parse [B,1,T,K], masked softmax weights
    over {Entity, Attribute, Relation, (Action,) Unnecessary}."""
    x = jax.nn.relu(conv2d(params["words_parse_1"], words_feat))
    x = conv2d(params["words_parse_2"], x)
    x = jax.nn.softmax(x, axis=-1)
    return x * seq_mask


def valid_lang_feat(words_parse, words_feat, class_idx):
    """(sum of given parse classes)-weighted word sum, l2-normalized
    (valid_lang CMPC_model.py:166-178 with classes (0,1); nec_lang
    :180-192 with classes (0,1,2) == sum - Unnecessary)."""
    w = sum(words_parse[:, 0, :, c] for c in class_idx)      # [B,T]
    feats = words_feat[:, 0]                                  # [B,T,C]
    pooled = jnp.einsum("bt,btc->bc", w, feats)
    pooled = l2_normalize(pooled, -1)
    return pooled[:, None, None, :]                           # [B,1,1,C]


# ---------------------------------------------------------------------------
# Mutan fusion
# ---------------------------------------------------------------------------

def init_mutan(key, cfg, num_heads: int = 5):
    """Fused-head mutan params (reference per-head convs
    vis_trans_/lang_trans_{level}_head{1..5}, CMPC_model.py:295-319; the
    converter stacks the 5 reference kernels along the output axis)."""
    k1, k2 = split_stream(key, 2)
    vin = cfg.v_emb_dim + cfg.spatial_dim
    return {
        "vis_trans": init_conv(k1, 1, vin, num_heads * cfg.v_emb_dim),
        "lang_trans": init_conv(k2, 1, cfg.lang_dim, num_heads * cfg.v_emb_dim),
    }


def apply_mutan(params, lang_feat, spatial_feat, visual_feat,
                num_heads: int = 5):
    """Bilinear multimodal fusion (CMPC_model.py:311-328):
    sum_h tanh(conv_h([vis, spatial])) * tanh(conv_h(lang)), tanh, l2norm.

    Runs as ONE fused Pallas kernel on TPU (ops/pallas_kernels.py): the
    [B,HW,5C] tanh intermediate never reaches HBM.  When the params carry a
    'pad' view (model.prepare_params, inference flows), the lane-aligned
    fast path is used — no in-jit padding at all."""
    from cmpc_refseg_tpu.ops.fused_dispatch import fused_mode, shard_rows
    from cmpc_refseg_tpu.ops.pallas_kernels import (_bf16_tanh_enabled,
                                                    mutan_fused,
                                                    mutan_fused_padded)
    nh = num_heads
    b, h, w, c_vis = visual_feat.shape
    pad = params.get("pad")
    mode = fused_mode(b, kernel="mutan")   # no batch gate: wins at every batch
    if pad is not None and mode is not None:
        import functools
        kp = pad["w_wide"].shape[0]
        extra = kp - c_vis - spatial_feat.shape[-1]
        dt = visual_feat.dtype
        vis_in = jnp.concatenate(
            [visual_feat, spatial_feat.astype(dt),
             jnp.zeros((b, h, w, extra), dt)], axis=-1)      # aligned [.,Kp]
        lang = jnp.tanh(conv2d({"DW": pad["lang_dw"],
                                "biases": pad["lang_b"]}, lang_feat))
        fn = shard_rows(
            functools.partial(mutan_fused_padded, num_heads=nh, c=c_vis,
                              interpret=mode,
                              bf16_tanh=_bf16_tanh_enabled(dt)),
            in_batched=(True, False, False, True), out_batched=True)
        out = fn(vis_in.reshape(b, h * w, kp), pad["w_wide"], pad["b_pad"],
                 lang.reshape(b, -1))
        return out.reshape(b, h, w, c_vis)
    vis_in = jnp.concatenate(
        [visual_feat, spatial_feat.astype(visual_feat.dtype)], axis=-1)
    lang = jnp.tanh(conv2d(params["lang_trans"], lang_feat))  # [B,1,1,5C]
    lang = lang.astype(vis_in.dtype)
    out = mutan_fused(vis_in.reshape(b, h * w, vis_in.shape[-1]),
                      params["vis_trans"]["DW"][0, 0],
                      params["vis_trans"]["biases"],
                      lang.reshape(b, -1), nh)
    return out.reshape(b, h, w, -1)


# ---------------------------------------------------------------------------
# Relation-aware spatial graph
# ---------------------------------------------------------------------------

def init_spa_graph(key, cfg):
    ks = split_stream(key, 2 + cfg.num_graph_conv)
    affin_dim = cfg.vw_emb_dim or cfg.v_emb_dim
    p = {
        "words_trans": init_conv(ks[0], 1, cfg.lang_dim, affin_dim),
        "spa_graph_trans2": init_conv(ks[1], 1, cfg.v_emb_dim, affin_dim),
        "gconv": [],
    }
    for i in range(cfg.num_graph_conv):
        kk = ks[2 + i]
        p["gconv"].append({
            "update": init_conv(kk, 1, cfg.v_emb_dim, cfg.v_emb_dim),
            "feat_ln": init_layer_norm(cfg.v_emb_dim),
            "update_ln": init_layer_norm(cfg.v_emb_dim),
        })
    return p


@jax.custom_vjp
def graph_conv_opt(gp, x_nodes, w_aff, v_aff):
    """Graph conv: fused pallas kernels on TPU at batched inference
    (message+stats / update+stats calls + one XLA finalize pass,
    ops/pallas_kernels.py::graph_conv_fused), plain XLA elsewhere; under
    differentiation the XLA path runs and autodiff reuses its
    intermediates (mutan_fused pattern).  On a declared data-parallel mesh
    the kernel runs under shard_map over the data axis (batch-row-local).
    Batch gate: bs>=4 (measured; the video path's spa-graph runs at b=1
    where the fused trio costs ~11 clips/s — LATENCY.json A/B.  bs=1 image
    serving can opt in with CMPC_FUSED=on, which wins for some variants)."""
    mode = _fused_mode(x_nodes, kernel="graph")
    if mode is not None:
        import functools
        from cmpc_refseg_tpu.ops.fused_dispatch import shard_rows
        from cmpc_refseg_tpu.ops.pallas_kernels import graph_conv_fused
        fn = shard_rows(functools.partial(graph_conv_fused, interpret=mode),
                        in_batched=(False, True, True, True),
                        out_batched=True)
        return fn(gp, x_nodes, w_aff, v_aff)
    return _graph_conv(gp, x_nodes, w_aff, v_aff)


def _graph_conv_opt_fwd(gp, x_nodes, w_aff, v_aff):
    out, vjp = jax.vjp(_graph_conv, gp, x_nodes, w_aff, v_aff)
    return out, vjp


def _graph_conv_opt_bwd(vjp, g):
    return vjp(g)


def _graph_conv(gp, x_nodes, w_aff, v_aff):
    """One graph convolution (CMPC_model.py:359-374) WITHOUT materializing
    adj = w_aff @ v_aff^T: message = w_aff @ (v_aff^T @ x).

    x_nodes [B,N,C]; w_aff, v_aff [B,N,T] (affinities arrive f32 from the
    softmax; the matmuls run in the node dtype with f32 accumulation).
    """
    w_aff = w_aff.astype(x_nodes.dtype)
    v_aff = v_aff.astype(x_nodes.dtype)
    f32 = jnp.float32
    pooled = jnp.einsum("bnt,bnc->btc", v_aff, x_nodes,
                        preferred_element_type=f32)           # [B,T,C]
    msg = jnp.einsum("bnt,btc->bnc", w_aff, pooled.astype(x_nodes.dtype),
                     preferred_element_type=f32).astype(x_nodes.dtype)
    msg = tf1_layer_norm(msg[:, None], gp["feat_ln"]["gamma"],
                         gp["feat_ln"]["beta"])[:, 0]
    y = jax.nn.relu(x_nodes + msg)
    y = conv2d(gp["update"], y[:, None])[:, 0]
    y = tf1_layer_norm(y[:, None], gp["update_ln"]["gamma"],
                       gp["update_ln"]["beta"])[:, 0]
    return jax.nn.relu(y)


graph_conv_opt.defvjp(_graph_conv_opt_fwd, _graph_conv_opt_bwd)


def _spa_affinity_xla(x_nodes, wg, bg, words_trans, rel, mask, *,
                      scale: float, l2n: bool, masked_softmax: bool):
    """XLA reference for the affinity + double-softmax epilogue
    (CMPC_model.py:380-399): graph projection, scaled word-node affinity,
    relation scaling, and the two softmax normalizations.

    x_nodes [B,N,C]; wg [C,A]; bg [A]; words_trans [B,T,A] (already
    l2-normalized when l2n); rel [B,1,T] f32 (words_parse relation row);
    mask [B,1,T] f32.  Returns (w_aff, v_aff) [B,N,T] f32."""
    dt = x_nodes.dtype
    pref = jnp.float32 if dt == jnp.float32 else None
    gt = (jnp.einsum("bnc,ca->bna", x_nodes, wg.astype(dt),
                     preferred_element_type=pref).astype(dt)
          + bg.astype(dt))
    if l2n:
        gt = l2_normalize(gt, -1)
    affi = jnp.einsum("bna,bta->bnt", gt, words_trans.astype(gt.dtype),
                      preferred_element_type=jnp.float32)  # f32 for softmax
    affi = rel * (affi / scale)                           # relation scale
    if masked_softmax:
        # base (CMPC_model.py:389-399).  'unmasked' is the origin model,
        # whose softmax runs over the SLICED valid words — statically
        # identical to the masked softmax here.
        neg = (1.0 - mask) * jnp.finfo(jnp.float32).min
        w_aff = jax.nn.softmax(mask * affi + neg, axis=2)
    else:
        # v5/v6+: plain softmax then multiplicative mask
        w_aff = mask * jax.nn.softmax(affi, axis=2)
    v_aff = mask * jax.nn.softmax(affi, axis=1)
    return w_aff, v_aff


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def spa_affinity_opt(x_nodes, wg, bg, words_trans, rel, mask,
                     scale, l2n, masked_softmax):
    """Affinity epilogue: ONE fused pallas kernel on TPU at batched
    inference (projection matmul + word-affinity matmul + relation scale +
    row softmax + flash-style column-softmax statistics, all VMEM-resident
    per tile; only the [B,N,T] affinity and the tiny finalize touch HBM —
    the [B,N,A] graph projection never does).  Plain XLA elsewhere / under
    differentiation.  Sharded over the data axis on a declared mesh like
    every other fused surface.  Batch gate bs>=4 (see graph_conv_opt)."""
    mode = _fused_mode(x_nodes, kernel="affinity")
    if mode is not None:
        from cmpc_refseg_tpu.ops.fused_dispatch import shard_rows
        from cmpc_refseg_tpu.ops.pallas_kernels import spa_affinity_fused
        fn = functools.partial(spa_affinity_fused, scale=scale, l2n=l2n,
                               masked_softmax=masked_softmax,
                               interpret=mode)
        fn = shard_rows(fn, in_batched=(True, False, False, True, True,
                                        True),
                        out_batched=(True, True))
        return fn(x_nodes, wg, bg, words_trans, rel, mask)
    return _spa_affinity_xla(x_nodes, wg, bg, words_trans, rel, mask,
                             scale=scale, l2n=l2n,
                             masked_softmax=masked_softmax)


def _spa_affinity_fwd(x_nodes, wg, bg, words_trans, rel, mask,
                      scale, l2n, masked_softmax):
    out, vjp = jax.vjp(
        functools.partial(_spa_affinity_xla, scale=scale, l2n=l2n,
                          masked_softmax=masked_softmax),
        x_nodes, wg, bg, words_trans, rel, mask)
    return out, vjp


def _spa_affinity_bwd(scale, l2n, masked_softmax, vjp, g):
    return vjp(g)


spa_affinity_opt.defvjp(_spa_affinity_fwd, _spa_affinity_bwd)


def _spa_affinity_xla_grouped(x_nodes, wgs, bgs, words_trans, rel, mask,
                              *, scale, l2n, masked_softmax):
    """Per-group XLA reference for the level-packed affinity: group g's
    rows [g*B:(g+1)*B] use weights wgs[g]/bgs[g]."""
    g_n = wgs.shape[0]
    b = x_nodes.shape[0] // g_n
    ws, vs = [], []
    for g in range(g_n):
        s = slice(g * b, (g + 1) * b)
        w, v = _spa_affinity_xla(x_nodes[s], wgs[g], bgs[g],
                                 words_trans[s], rel[s], mask[s],
                                 scale=scale, l2n=l2n,
                                 masked_softmax=masked_softmax)
        ws.append(w)
        vs.append(v)
    return jnp.concatenate(ws), jnp.concatenate(vs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def spa_affinity_grouped(x_nodes, wgs, bgs, words_trans, rel, mask,
                         scale, l2n, masked_softmax):
    """Level-packed affinity (VERDICT r3 #6): one kernel launch for all G
    levels — x_nodes [G*B,N,C], wgs [G,C,A], bgs [G,A].  The grid gains a
    factor G, which is what makes the fused path profitable at the video
    model's internal b=1 (gate: G*B rows >= 3)."""
    mode = _fused_mode(x_nodes, kernel="affinity", min_batch=3)
    if mode is not None:
        from cmpc_refseg_tpu.ops.pallas_kernels import spa_affinity_fused
        return spa_affinity_fused(x_nodes, wgs, bgs, words_trans, rel,
                                  mask, scale=scale, l2n=l2n,
                                  masked_softmax=masked_softmax,
                                  interpret=mode)
    return _spa_affinity_xla_grouped(x_nodes, wgs, bgs, words_trans, rel,
                                     mask, scale=scale, l2n=l2n,
                                     masked_softmax=masked_softmax)


def _spa_affinity_grouped_fwd(x_nodes, wgs, bgs, words_trans, rel, mask,
                              scale, l2n, masked_softmax):
    out, vjp = jax.vjp(
        functools.partial(_spa_affinity_xla_grouped, scale=scale, l2n=l2n,
                          masked_softmax=masked_softmax),
        x_nodes, wgs, bgs, words_trans, rel, mask)
    return out, vjp


def _spa_affinity_grouped_bwd(scale, l2n, masked_softmax, vjp, g):
    return vjp(g)


spa_affinity_grouped.defvjp(_spa_affinity_grouped_fwd,
                            _spa_affinity_grouped_bwd)


def _graph_conv_grouped_xla(gps, x_nodes, w_aff, v_aff):
    b = x_nodes.shape[0] // len(gps)
    return jnp.concatenate([
        _graph_conv(gp, x_nodes[g * b:(g + 1) * b],
                    w_aff[g * b:(g + 1) * b], v_aff[g * b:(g + 1) * b])
        for g, gp in enumerate(gps)])


@jax.custom_vjp
def graph_conv_grouped(gps, x_nodes, w_aff, v_aff):
    """Level-packed graph conv: `gps` is a tuple of G param dicts; batch
    row i uses params i // (B//G).  Fused kernels on TPU (grid gains the
    G factor — the small-batch profitability fix), per-group XLA
    elsewhere / under differentiation."""
    mode = _fused_mode(x_nodes, kernel="graph", min_batch=3)
    if mode is not None:
        from cmpc_refseg_tpu.ops.pallas_kernels import graph_conv_fused
        return graph_conv_fused(list(gps), x_nodes, w_aff, v_aff,
                                interpret=mode)
    return _graph_conv_grouped_xla(gps, x_nodes, w_aff, v_aff)


def _graph_conv_grouped_fwd(gps, x_nodes, w_aff, v_aff):
    out, vjp = jax.vjp(_graph_conv_grouped_xla, gps, x_nodes, w_aff, v_aff)
    return out, vjp


def _graph_conv_grouped_bwd(vjp, g):
    return vjp(g)


graph_conv_grouped.defvjp(_graph_conv_grouped_fwd, _graph_conv_grouped_bwd)


def apply_spa_graph_grouped(params_list, cfg, spa_graphs, words_feat,
                            words_parse, seq_mask):
    """Spatial graph reasoning for G levels in ONE set of kernel launches
    (level packing, VERDICT r3 #6).  `params_list`/`spa_graphs` are
    per-level; returns (list of [B,H,W,C] outputs, list of (w_aff, v_aff)).
    Semantics identical to G independent apply_spa_graph calls (pinned by
    tests/test_pallas.py grouped parity tests).  The double-softmax variant
    (T2) keeps the per-level path."""
    from cmpc_refseg_tpu.parallel.mesh import active_data_mesh
    g_n = len(params_list)
    if (cfg.graph_norm == "double_softmax" or g_n == 1
            or active_data_mesh() is not None
            or spa_graphs[0].shape[0] > 2):
        # Per-level when: multi-chip (the per-level path shards via
        # shard_rows over the data axis; the packed group-major layout
        # would split groups across devices), or per-level batch > 2 —
        # MEASURED: packing at bs=8 costs 546 -> 513 masks/s (the
        # stack/slice HBM copies outweigh the launch savings, same
        # mechanism as the level-batched-einsum anti-win), while at the
        # b=1 small-batch regime it WINS (video 102.1 -> 112.2 clips/s:
        # near-empty grids gain the xG factor).
        outs = [apply_spa_graph(p, cfg, sg, words_feat, words_parse,
                                seq_mask)
                for p, sg in zip(params_list, spa_graphs)]
        return [o[0] for o in outs], [o[1] for o in outs]
    if cfg.graph_norm not in ("masked", "unmasked", "softmax_mask"):
        raise ValueError(f"unknown graph_norm {cfg.graph_norm!r}")
    b, h, w, c = spa_graphs[0].shape

    wts = []
    for p in params_list:
        wt = conv2d(p["words_trans"], words_feat)[:, 0]          # [B,T,A]
        if cfg.l2norm_affinity:
            wt = l2_normalize(wt, -1)
        wts.append(wt)
    x = jnp.concatenate([sg.reshape(b, h * w, c) for sg in spa_graphs])
    wt_all = jnp.concatenate(wts)
    rel = jnp.concatenate([words_parse[:, :, :, 2]] * g_n)
    mask = jnp.concatenate([seq_mask[:, :, :, 0]] * g_n)
    wgs = jnp.stack([p["spa_graph_trans2"]["DW"][0, 0]
                     for p in params_list])
    bgs = jnp.stack([p["spa_graph_trans2"]["biases"] for p in params_list])

    w_aff, v_aff = spa_affinity_grouped(
        x, wgs, bgs, wt_all, rel, mask,
        float(cfg.v_emb_dim ** 0.5), bool(cfg.l2norm_affinity),
        cfg.graph_norm in ("masked", "unmasked"))

    for r in range(cfg.num_graph_conv):
        x = graph_conv_grouped(tuple(p["gconv"][r] for p in params_list),
                               x, w_aff, v_aff)

    outs, gws = [], []
    for g in range(g_n):
        s = slice(g * b, (g + 1) * b)
        outs.append(l2_normalize(x[s].reshape(b, h, w, c), -1))
        gws.append((w_aff[s], v_aff[s]))
    return outs, gws


def apply_spa_graph(params, cfg, spa_graph, words_feat, words_parse, seq_mask):
    """Spatial graph reasoning (CMPC_model.py:376-410 + variant norms).

    spa_graph [B,H,W,C]; words_feat [B,1,T,Cl]; seq_mask [B,1,T,1].
    """
    b, h, w, c = spa_graph.shape
    affin_dim = cfg.vw_emb_dim or cfg.v_emb_dim

    words_trans = conv2d(params["words_trans"], words_feat)[:, 0]   # [B,T,A]
    nodes_in = spa_graph.reshape(b, h * w, c)
    mask = seq_mask[:, :, :, 0]                                      # [B,1,T]

    if cfg.graph_norm == "double_softmax":
        # T2 (CMPCv4_BiLSTM_T2_model.py): softmax over HW, relation scale,
        # adj = A @ A^T.  One-variant path; stays XLA.
        graph_trans = conv2d(params["spa_graph_trans2"],
                             spa_graph).reshape(b, h * w, affin_dim)
        if cfg.l2norm_affinity:
            words_trans = l2_normalize(words_trans, -1)
            graph_trans = l2_normalize(graph_trans, -1)
        affi = jnp.einsum("bna,bta->bnt", graph_trans,
                          words_trans.astype(graph_trans.dtype),
                          preferred_element_type=jnp.float32)
        affi = affi / (cfg.v_emb_dim ** 0.5)
        a = jax.nn.softmax(affi, axis=1)
        a = words_parse[:, :, :, 2] * a
        w_aff = v_aff = a
    else:
        if cfg.graph_norm not in ("masked", "unmasked", "softmax_mask"):
            raise ValueError(f"unknown graph_norm {cfg.graph_norm!r}")
        if cfg.l2norm_affinity:
            words_trans = l2_normalize(words_trans, -1)
        w_aff, v_aff = spa_affinity_opt(
            nodes_in, params["spa_graph_trans2"]["DW"][0, 0],
            params["spa_graph_trans2"]["biases"], words_trans,
            words_parse[:, :, :, 2], mask,
            float(cfg.v_emb_dim ** 0.5), bool(cfg.l2norm_affinity),
            cfg.graph_norm in ("masked", "unmasked"))

    x = nodes_in
    for gp in params["gconv"]:
        x = graph_conv_opt(gp, x, w_aff, v_aff)
    out = l2_normalize(x.reshape(b, h, w, c), -1)
    return out, (w_aff, v_aff)


# ---------------------------------------------------------------------------
# lang2vis assembly
# ---------------------------------------------------------------------------

def init_lang2vis(key, cfg):
    k1, k2, k3, k4 = split_stream(key, 4)
    p = {
        "mutan": init_mutan(k1, cfg),
        "graph": init_spa_graph(k2, cfg),
    }
    if cfg.sent_fusion:
        # v6+ (CMPCv6_plus_model.py:417-433): second mutan replaces concat
        p["sent_mutan"] = init_mutan(k3, cfg)
        p["fusion"] = init_conv(k4, 1, cfg.v_emb_dim, cfg.mlp_dim)
    else:
        fin = cfg.v_emb_dim * 2 + cfg.lang_dim + cfg.spatial_dim
        p["fusion"] = init_conv(k4, 1, fin, cfg.mlp_dim)
    return p


def apply_lang2vis(params, cfg, visual_feat, words_feat, words_parse,
                   seq_mask, spatial):
    """Per-level cross-modal comprehension (CMPC_model.py:330-345)."""
    valid = valid_lang_feat(words_parse, words_feat, (0, 1))  # E+A
    vis_la_sp = apply_mutan(params["mutan"], valid, spatial, visual_feat)
    graph_feat, gw = apply_spa_graph(params["graph"], cfg, vis_la_sp,
                                     words_feat, words_parse, seq_mask)
    fusion = _lang2vis_fuse(params, cfg, vis_la_sp, graph_feat, valid,
                            spatial, words_feat, words_parse)
    return fusion, gw


def apply_lang2vis_multi(params_list, cfg, visuals, words_feat, words_parse,
                         seq_mask, spatial):
    """apply_lang2vis for ALL levels with the spa-graph phase level-packed
    (apply_spa_graph_grouped: one set of kernel launches, xG grid —
    VERDICT r3 #6).  Identical math to per-level calls (pinned by
    tests/test_pallas.py::test_lang2vis_multi_matches_per_level).
    Returns (list of fusions, list of gw)."""
    valid = valid_lang_feat(words_parse, words_feat, (0, 1))  # E+A
    vis_list = [apply_mutan(p["mutan"], valid, spatial, v)
                for p, v in zip(params_list, visuals)]
    graphs, gws = apply_spa_graph_grouped(
        [p["graph"] for p in params_list], cfg, vis_list, words_feat,
        words_parse, seq_mask)
    fusions = [
        _lang2vis_fuse(p, cfg, vls, gf, valid, spatial, words_feat,
                       words_parse)
        for p, vls, gf in zip(params_list, vis_list, graphs)]
    return fusions, gws


def _lang2vis_fuse(params, cfg, vis_la_sp, graph_feat, valid, spatial,
                   words_feat, words_parse):
    if cfg.sent_fusion:
        nec = valid_lang_feat(
            words_parse, words_feat,
            tuple(range(cfg.parse_classes - 1)))              # all but U
        feat_all = apply_mutan(params["sent_mutan"], nec, spatial, graph_feat)
        return jax.nn.relu(conv2d(params["fusion"], feat_all))

    # concat([vis_la_sp, graph, tiled lang, spatial]) -> 1x1 conv
    # (CMPC_model.py:338-345) computed WITHOUT materializing the concat:
    # the [B,40,40,2C+Cl+8] tensor costs ~77 MB of HBM round-trip per level
    # at bs=8/bf16, and the lang rows are one vector tiled HW times.
    # Splitting the conv kernel along its input rows gives the identical
    # sum: vis@Wv + graph@Wg + lang@Wl (computed once per sample, [B,1,1,d],
    # broadcast) + spatial@Ws (broadcast over its own leading dims) + bias.
    # Gradients flow through the slices into the canonical fused DW.
    # The partial products accumulate in f32 and are summed (+bias) in f32
    # with ONE down-cast at the end — matching the concat conv's numerics,
    # where the whole row reduction ran in f32 before a single cast.
    dt = vis_la_sp.dtype
    C = vis_la_sp.shape[-1]
    Cl = valid.shape[-1]
    W = params["fusion"]["DW"][0, 0]                  # [2C+Cl+S, mlp]

    def term(x, rows):
        return jnp.einsum("...c,cd->...d", x.astype(dt), rows.astype(dt),
                          preferred_element_type=jnp.float32)

    # (r4 A/B: computing the two big terms as one concat+matmul measured
    # 542 vs 545 masks/s — the 2C-wide bf16 concat copy offsets the saved
    # f32 partial; the 4-term split stands.  PERF.md r4 notes.)
    y = (term(vis_la_sp, W[:C]) + term(graph_feat, W[C:2 * C])
         + term(valid, W[2 * C:2 * C + Cl]) + term(spatial, W[2 * C + Cl:])
         + params["fusion"]["biases"].astype(jnp.float32))
    return jax.nn.relu(y).astype(dt)


# ---------------------------------------------------------------------------
# Gated exchange (TGFE) + ConvLSTM fusion
# ---------------------------------------------------------------------------

def _init_gv(key, cfg):
    """global_vec params (CMPC_model.py:212-243)."""
    k1, k2, k3 = split_stream(key, 3)
    return {
        "spa_graph_key": init_conv(k1, 1, cfg.mlp_dim, cfg.mlp_dim),
        "lang_query": init_conv(k2, 1, cfg.lang_dim, cfg.mlp_dim),
        "gv_lang": init_conv(k3, 1, cfg.mlp_dim + cfg.lang_dim, cfg.mlp_dim),
    }


def _apply_gv(p, cfg, feat, lang_feat):
    """Language-guided attention pooling to a global vector."""
    b, h, w, c = feat.shape
    key = conv2d(p["spa_graph_key"], feat).reshape(b, h * w, cfg.mlp_dim)
    query = conv2d(p["lang_query"], lang_feat).reshape(b, 1, cfg.mlp_dim)
    attn = jnp.einsum("bnc,bqc->bnq", key, query.astype(key.dtype),
                      preferred_element_type=jnp.float32) / (cfg.mlp_dim ** 0.5)
    attn = jax.nn.softmax(attn, axis=1)                       # [B,HW,1] f32
    pooled = jnp.einsum("bnq,bnc->bqc", attn.astype(feat.dtype),
                        feat.reshape(b, h * w, c),
                        preferred_element_type=jnp.float32)
    gv = jnp.concatenate([pooled.reshape(b, 1, 1, c),
                          lang_feat.astype(pooled.dtype)], axis=-1)
    gv = conv2d(p["gv_lang"], gv)
    # NOTE: reference l2-normalizes over the DEFAULT axis of TF<=1.13
    # (tf.nn.l2_normalize(x) with no axis = global over all dims,
    # CMPC_model.py:241); shape is [B,1,1,C] so this is a per-sample global
    # norm — reproduced here.
    return l2_normalize(gv, axis=(1, 2, 3))


def _init_se(key, cfg):
    """lang_se params (CMPC_model.py:194-210)."""
    k1, k2 = split_stream(key, 2)
    return {
        "lang_feat": init_conv(k1, 1, cfg.mlp_dim, cfg.mlp_dim),
        "trans_feat": init_conv(k2, 1, cfg.mlp_dim, cfg.mlp_dim),
    }


def _apply_se(p, feat, gv_lang):
    gate = jax.nn.sigmoid(conv2d(p["lang_feat"], gv_lang))    # [B,1,1,C]
    trans = jax.nn.relu(conv2d(p["trans_feat"], feat))
    return trans * gate.astype(trans.dtype)


def init_exchange(key, cfg, num_others: int):
    """One gated_exchange_module's params.  Base/v4: one gv on the target
    feat + one se per other level (CMPC_model.py:245-259).  v6: per-other gv
    + a self-gate se (CMPCv6_model.py:323-339)."""
    ks = split_stream(key, 2 + 2 * num_others)
    p = {"se": [_init_se(ks[i], cfg) for i in range(num_others)]}
    if cfg.exchange_self_gate:
        p["gv_each"] = [_init_gv(ks[num_others + i], cfg)
                        for i in range(num_others)]
        p["gv_self"] = _init_gv(ks[-2], cfg)
        p["se_self"] = _init_se(ks[-1], cfg)
    else:
        p["gv"] = _init_gv(ks[-1], cfg)
    return p


def _se_sum_xla(feat, others, gates, ws, bs):
    """XLA reference for the fused SE sum: feat [B,N,C] + sum_i
    relu(others_i @ ws_i + bs_i) * gates_i[:, None, :], l2-normalized per
    row (the exchange epilogue at CMPC_model.py:245-259 + the l2norm the
    fusion stack applies)."""
    out = feat
    for o, g, w, b in zip(others, gates, ws, bs):
        t = jax.nn.relu(
            jnp.einsum("bnc,cd->bnd", o.astype(feat.dtype),
                       w.astype(feat.dtype),
                       preferred_element_type=jnp.float32
                       ).astype(feat.dtype) + b.astype(feat.dtype))
        out = out + t * g.astype(feat.dtype)[:, None, :]
    return l2_normalize(out, -1)


@jax.custom_vjp
def se_sum_opt(feat, others, gates, ws, bs):
    """Gated-exchange SE sum + row l2norm: single fused pallas kernel on
    TPU at batched inference (ops/pallas_kernels.py::se_sum_fused), plain
    XLA elsewhere / under differentiation.  Data-parallel meshes run it
    under shard_map (row-local: feat/others/gates shard by batch, ws/bs
    replicate).  Batch gate bs>=4 (see graph_conv_opt)."""
    mode = _fused_mode(feat, kernel="sesum")
    if mode is not None:
        from cmpc_refseg_tpu.ops.fused_dispatch import shard_rows
        from cmpc_refseg_tpu.ops.pallas_kernels import se_sum_fused

        def fn(f, o, g, w_, b_):
            return se_sum_fused(f, list(o), list(g), list(w_), list(b_),
                                interpret=mode)

        return shard_rows(fn, in_batched=(True, True, True, False, False),
                          out_batched=True)(feat, tuple(others),
                                            tuple(gates), tuple(ws),
                                            tuple(bs))
    return _se_sum_xla(feat, others, gates, ws, bs)


def _se_sum_opt_fwd(feat, others, gates, ws, bs):
    out, vjp = jax.vjp(_se_sum_xla, feat, others, gates, ws, bs)
    return out, vjp


def _se_sum_opt_bwd(vjp, g):
    return vjp(g)


se_sum_opt.defvjp(_se_sum_opt_fwd, _se_sum_opt_bwd)


def exchange_step_normed(pex, cfg, feat, others, lang_feat):
    """One gated-exchange module + the l2norm epilogue.  Standard layout
    runs the fused SE-sum (the gv/gate computations are [B,1,1,C]-tiny and
    stay XLA); the v6 self-gate layout keeps the module loop."""
    if cfg.exchange_self_gate:
        return l2_normalize(apply_exchange(pex, cfg, feat, others,
                                           lang_feat), -1)
    gv = _apply_gv(pex["gv"], cfg, feat, lang_feat)
    gates = tuple(
        jax.nn.sigmoid(conv2d(se["lang_feat"], gv)).reshape(
            feat.shape[0], -1)
        for se in pex["se"])
    ws = tuple(se["trans_feat"]["DW"][0, 0] for se in pex["se"])
    bs = tuple(se["trans_feat"]["biases"] for se in pex["se"])
    b_, h_, w_, c_ = feat.shape
    out = se_sum_opt(feat.reshape(b_, h_ * w_, c_),
                     tuple(o.reshape(b_, h_ * w_, c_) for o in others),
                     gates, ws, bs)
    return out.reshape(b_, h_, w_, c_)


def apply_exchange(p, cfg, feat, others, lang_feat):
    if cfg.exchange_self_gate:
        gv_self = _apply_gv(p["gv_self"], cfg, feat, lang_feat)
        out = _apply_se(p["se_self"], feat, gv_self)
        for se, gv_p, other in zip(p["se"], p["gv_each"], others):
            gv = _apply_gv(gv_p, cfg, other, lang_feat)
            out = out + _apply_se(se, other, gv)
    else:
        gv = _apply_gv(p["gv"], cfg, feat, lang_feat)
        out = feat
        for se, other in zip(p["se"], others):
            out = out + _apply_se(se, other, gv)
    return out


# --- ConvLSTM cell (util/cell.py:3-79: peephole + whole-sample layer norm) --

def init_convlstm(key, cfg):
    from cmpc_refseg_tpu.ops.layers import glorot_uniform
    c = cfg.mlp_dim
    h, w = cfg.vf_h, cfg.vf_w
    k1, k2, k3, k4 = split_stream(key, 4)
    return {
        "kernel": glorot_uniform(k1, (1, 1, 2 * c, 4 * c)),
        "W_ci": glorot_uniform(k2, (h, w, c)),
        "W_cf": glorot_uniform(k3, (h, w, c)),
        "W_co": glorot_uniform(k4, (h, w, c)),
        # 5 layer_norms in call order: j, i, f, o, c (util/cell.py:52-66)
        "ln": [init_layer_norm(c) for _ in range(5)],
    }


def convlstm_step(p, x, c, h, *, forget_bias: float = 1.0):
    """One ConvLSTM step (util/cell.py:36-79).  1x1 kernel => channel matmul.
    Gate split order is (j, i, f, o); peepholes on i/f use the OLD cell and
    on o the NEW cell; j/i/f/o/c are all layer-normalized (whole-sample,
    tf.contrib semantics); normalize=True means no conv bias."""
    dt = x.dtype
    # z = [x, h] @ W computed as x @ W[:C] + h @ W[C:]: the concat would
    # round-trip a [B,H,W,2C] tensor through HBM (~25 MB/step at the
    # reference geometry); the split is the same f32-accumulated sum
    # reassociated.
    w = p["kernel"][0, 0].astype(dt)
    cin = x.shape[-1]
    y = (jnp.einsum("bhwc,cd->bhwd", x, w[:cin],
                    preferred_element_type=jnp.float32)
         + jnp.einsum("bhwc,cd->bhwd", h, w[cin:],
                      preferred_element_type=jnp.float32)).astype(dt)
    j, i, f, o = jnp.split(y, 4, axis=-1)
    i = i + p["W_ci"].astype(dt) * c
    f = f + p["W_cf"].astype(dt) * c
    ln = p["ln"]
    j = tf1_layer_norm(j, ln[0]["gamma"], ln[0]["beta"])
    i = tf1_layer_norm(i, ln[1]["gamma"], ln[1]["beta"])
    f = tf1_layer_norm(f, ln[2]["gamma"], ln[2]["beta"])
    f = jax.nn.sigmoid(f + forget_bias)
    i = jax.nn.sigmoid(i)
    new_c = c * f + i * jnp.tanh(j)
    o = o + p["W_co"].astype(dt) * new_c
    o = tf1_layer_norm(o, ln[3]["gamma"], ln[3]["beta"])
    new_c = tf1_layer_norm(new_c, ln[4]["gamma"], ln[4]["beta"])
    o = jax.nn.sigmoid(o)
    new_h = o * jnp.tanh(new_c)
    return new_c, new_h


# --- ConvGRU cell (util/cell.py:82-143) — alternative recurrent fuser -------

def init_convgru(key, cfg):
    from cmpc_refseg_tpu.ops.layers import glorot_uniform
    c = cfg.mlp_dim
    k1, k2 = split_stream(key, 2)
    return {
        "gates_kernel": glorot_uniform(k1, (1, 1, 2 * c, 2 * c)),
        "cand_kernel": glorot_uniform(k2, (1, 1, 2 * c, c)),
        # layer norms in call order: r, u, candidate (util/cell.py:119-121,139)
        "ln": [init_layer_norm(c) for _ in range(3)],
    }


def convgru_step(p, x, h):
    """One ConvGRU step (util/cell.py:110-143, normalize=True semantics):
    gates conv -> split(r,u) -> whole-sample layer norm -> sigmoid;
    candidate conv on [x, r*h] -> layer norm -> tanh; h' = u*h + (1-u)*cand.
    1x1 kernels lower to channel matmuls on the MXU."""
    dt = x.dtype
    z = jnp.concatenate([x, h], axis=-1)
    y = jnp.einsum("bhwc,cd->bhwd", z, p["gates_kernel"][0, 0].astype(dt),
                   preferred_element_type=jnp.float32).astype(dt)
    r, u = jnp.split(y, 2, axis=-1)
    ln = p["ln"]
    r = jax.nn.sigmoid(tf1_layer_norm(r, ln[0]["gamma"], ln[0]["beta"]))
    u = jax.nn.sigmoid(tf1_layer_norm(u, ln[1]["gamma"], ln[1]["beta"]))
    z2 = jnp.concatenate([x, r * h], axis=-1)
    cand = jnp.einsum("bhwc,cd->bhwd", z2, p["cand_kernel"][0, 0].astype(dt),
                      preferred_element_type=jnp.float32).astype(dt)
    cand = jnp.tanh(tf1_layer_norm(cand, ln[2]["gamma"], ln[2]["beta"]))
    return u * h + (1 - u) * cand


def init_fusion_stack(key, cfg):
    """Two rounds of gated exchange over the levels + ConvLSTM fusion
    (CMPC_model.py:261-293 / CMPCv4_model.py:339-378)."""
    levels = cfg.levels
    n_other = len(levels) - 1
    keys = split_stream(key, 2 * len(levels) + 1)
    p = {"exchange": {}}
    idx = 0
    for rnd in ("", "_2"):
        for lv in levels:
            p["exchange"][f"{lv}{rnd}"] = init_exchange(keys[idx], cfg, n_other)
            idx += 1
    p["convlstm"] = init_convlstm(keys[-1], cfg)
    return p


def apply_fusion_rounds_batched(p, cfg, feats: dict, lang_feat) -> dict:
    """Both gated-exchange rounds with every per-level 1x1 conv batched
    into ONE level-stacked einsum per role (keys / queries / gv / se-gates /
    se-trans).

    MEASURED SLOWER than the reference-shaped loop on v5e-1 (2.14 ms vs
    0.90 ms for both rounds at bs=8/bf16; whole-model bench 505 -> 474
    masks/s): the level-stack and the F[src] pair-gather materialize
    ~115 MB of extra HBM copies per round, which outweighs the saved
    kernel launches — XLA already fuses the sequential loop's small convs
    well.  Kept (parity-tested) as the measured record of why
    apply_fusion_stack uses the loop; the actual fusion-stack hotspot is
    the ConvLSTM (1.49 ms), addressed by the fused Pallas step in
    ops/pallas_kernels.py.  Standard exchange layout only (one gv per
    target level, CMPC_model.py:245-259).
    """
    import numpy as onp

    levels = list(cfg.levels)
    L = len(levels)
    b, h, w, c = feats[levels[0]].shape
    n = h * w
    F = jnp.stack([feats[lv] for lv in levels]).reshape(L, b, n, c)
    dt = F.dtype
    pref = jnp.float32 if dt == jnp.float32 else None
    lang2 = lang_feat.reshape(b, -1)                       # [B, Cl]
    ldt = lang2.dtype
    lpref = jnp.float32 if ldt == jnp.float32 else None
    cl = lang2.shape[-1]

    # pair p -> (target level, source level):  row-major over targets
    src = onp.array([o for l in range(L) for o in range(L) if o != l])
    tgt = onp.repeat(onp.arange(L), L - 1)

    for rnd in ("", "_2"):
        ex = [p["exchange"][f"{lv}{rnd}"] for lv in levels]
        se = [s for e in ex for s in e["se"]]
        Wk = jnp.stack([e["gv"]["spa_graph_key"]["DW"][0, 0]
                        for e in ex]).astype(dt)
        bk = jnp.stack([e["gv"]["spa_graph_key"]["biases"]
                        for e in ex]).astype(dt)
        Wq = jnp.stack([e["gv"]["lang_query"]["DW"][0, 0]
                        for e in ex]).astype(ldt)
        bq = jnp.stack([e["gv"]["lang_query"]["biases"]
                        for e in ex]).astype(ldt)
        Wg = jnp.stack([e["gv"]["gv_lang"]["DW"][0, 0] for e in ex])
        bg = jnp.stack([e["gv"]["gv_lang"]["biases"] for e in ex])
        Wt = jnp.stack([s["trans_feat"]["DW"][0, 0] for s in se]).astype(dt)
        bt = jnp.stack([s["trans_feat"]["biases"] for s in se]).astype(dt)
        Wl = jnp.stack([s["lang_feat"]["DW"][0, 0] for s in se])
        bl = jnp.stack([s["lang_feat"]["biases"] for s in se])

        # global_vec, all levels at once (CMPC_model.py:212-243)
        keys = (jnp.einsum("lbnc,lcd->lbnd", F, Wk,
                           preferred_element_type=pref).astype(dt)
                + bk[:, None, None, :])
        q = (jnp.einsum("bc,lcd->lbd", lang2, Wq,
                        preferred_element_type=lpref) + bq[:, None, :]
             ).astype(dt)
        attn = jnp.einsum("lbnc,lbc->lbn", keys, q,
                          preferred_element_type=jnp.float32
                          ) / (cfg.mlp_dim ** 0.5)
        attn = jax.nn.softmax(attn, axis=-1)               # [L,B,N] f32
        pooled = jnp.einsum("lbn,lbnc->lbc", attn.astype(dt), F,
                            preferred_element_type=jnp.float32)
        gv_in = jnp.concatenate(
            [pooled, jnp.broadcast_to(lang2.astype(pooled.dtype)[None],
                                      (L, b, cl))], axis=-1)
        gv = jnp.einsum("lbc,lcd->lbd", gv_in, Wg,
                        preferred_element_type=jnp.float32) + bg[:, None, :]
        gv = l2_normalize(gv, axis=-1)                     # [L,B,C] f32

        # lang_se, all (target, other) pairs at once (CMPC_model.py:194-210)
        trans = (jnp.einsum("pbnc,pcd->pbnd", F[src], Wt,
                            preferred_element_type=pref).astype(dt)
                 + bt[:, None, None, :])
        trans = jax.nn.relu(trans)
        gate = jax.nn.sigmoid(
            jnp.einsum("pbc,pcd->pbd", gv[tgt], Wl,
                       preferred_element_type=jnp.float32) + bl[:, None, :])
        contrib = trans * gate.astype(dt)[:, :, None, :]
        F = l2_normalize(F + contrib.reshape(L, L - 1, b, n, c).sum(1), -1)

    return {lv: F[i].reshape(b, h, w, c) for i, lv in enumerate(levels)}


def apply_fusion_stack(p, cfg, feats: dict, lang_feat):
    """feats: {level: [B,H,W,mlp]}; returns fused [B,H,W,mlp].

    The ConvLSTM scans the levels LOW-to-HIGH (c3,c4,c5 stacking order at
    CMPC_model.py:288-289) and takes the last hidden state.  3 steps —
    statically unrolled (cheaper than lax.scan at this length).
    """
    levels = list(cfg.levels)
    cur = dict(feats)
    for rnd in ("", "_2"):
        nxt = {}
        for lv in levels:
            others = [cur[o] for o in levels if o != lv]
            nxt[lv] = exchange_step_normed(p["exchange"][f"{lv}{rnd}"], cfg,
                                           cur[lv], others, lang_feat)
        cur = nxt

    x0 = cur[levels[0]]
    c = jnp.zeros_like(x0)
    h = jnp.zeros_like(x0)
    for lv in levels:
        c, h = convlstm_step_opt(p["convlstm"], cur[lv], c, h)
    return h


def _fused_mode(x, min_batch: int = 4, kernel=None):
    """Fused-kernel dispatch decision for the ConvLSTM/graph/SE-sum call
    sites (None = XLA; False = compiled Pallas; True = interpret).  The
    batch >= 4 gate is measured (ConvLSTM 3x standalone at bs=8; video bs=1
    ~18% slower fused).  Multi-chip meshes are handled by shard_map over the
    data axis (ops/fused_dispatch.py) when the driver declares one via
    parallel.mesh.data_parallel_dispatch; CMPC_FUSED=off/interpret are the
    debug overrides, CMPC_FUSED_<KERNEL> the per-surface ones."""
    from cmpc_refseg_tpu.ops.fused_dispatch import fused_mode
    return fused_mode(x.shape[0], min_batch=min_batch, kernel=kernel)


def _convlstm_dispatch(p, x, c, h):
    mode = _fused_mode(x, kernel="convlstm")
    if mode is not None:
        import functools
        from cmpc_refseg_tpu.ops.fused_dispatch import shard_rows
        from cmpc_refseg_tpu.ops.pallas_kernels import convlstm_step_fused
        fn = shard_rows(
            functools.partial(convlstm_step_fused, interpret=mode),
            in_batched=(False, True, True, True), out_batched=(True, True))
        return fn(p, x, c, h)
    return convlstm_step(p, x, c, h)


@jax.custom_vjp
def convlstm_step_opt(p, x, c, h):
    """ConvLSTM step: fused pallas kernels on TPU (inference primal), plain
    XLA elsewhere.  Under differentiation the XLA step runs and autodiff
    reuses its intermediates (same pattern as mutan_fused)."""
    return _convlstm_dispatch(p, x, c, h)


def _convlstm_opt_fwd(p, x, c, h):
    out, vjp = jax.vjp(convlstm_step, p, x, c, h)
    return out, vjp


def _convlstm_opt_bwd(vjp, g):
    return vjp(g)


convlstm_step_opt.defvjp(_convlstm_opt_fwd, _convlstm_opt_bwd)

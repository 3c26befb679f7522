"""Forward/loss/grad tests across the model-variant matrix.

Tiny geometry (H=W=32, res4_blocks=2) keeps CPU tracing fast while exercising
every architectural branch of the config space (SURVEY.md section 2.2 parity
matrix)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmpc_refseg_tpu.config import get_config, VARIANTS
from cmpc_refseg_tpu.models.model import (apply_model, compute_loss,
                                          init_model, rgb_to_hsv)

TINY = dict(H=32, W=32, num_steps=6, vocab_size=30, glove_dim=8,
            rnn_size=16, v_emb_dim=16, mlp_dim=12, batch_size=2,
            res4_blocks=2, bert_dim=16)


def make_batch(cfg, rng, frontpad=False):
    b, t = cfg.batch_size, cfg.num_steps
    batch = {"im": jnp.asarray(
        rng.standard_normal((b, cfg.H, cfg.W, 3)), jnp.float32)}
    if cfg.text_encoder == "bert":
        batch["words_feat"] = jnp.asarray(
            rng.standard_normal((b, t, cfg.bert_dim)), jnp.float32)
        mask = np.zeros((b, t), np.float32)
        mask[0, :3] = 1
        mask[1, :2] = 1
        batch["sequence_mask"] = jnp.asarray(mask)
    elif frontpad:
        words = np.zeros((b, t), np.int32)
        words[0, -3:] = [3, 4, 5]
        words[1, -2:] = [6, 7]
        batch["words"] = jnp.asarray(words)
        batch["valid_idx"] = jnp.asarray([[t - 3], [t - 2]], jnp.int32)
    else:
        words = np.zeros((b, t), np.int32)
        words[0, :3] = [3, 4, 5]
        words[1, :2] = [6, 7]
        batch["words"] = jnp.asarray(words)
        batch["seq_len"] = jnp.asarray([3, 2], jnp.int32)
    return batch


# image variants only here (video handled separately)
IMAGE_VARIANTS = [n for n, c in VARIANTS.items() if not c.video]


@pytest.mark.parametrize("name", IMAGE_VARIANTS)
def test_variant_forward_shapes(name, rng):
    cfg = get_config(name, **TINY)
    if cfg.text_encoder == "bert":
        cfg = cfg.replace(rnn_size=16, v_emb_dim=16, mlp_dim=12, vw_emb_dim=8)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg, rng, frontpad=(cfg.text_encoder == "lstm_frontpad"))
    fwd = jax.jit(lambda p, s, b: apply_model(p, s, cfg, b, train=False))
    out, _ = fwd(params, state, batch)

    b, H, W = cfg.batch_size, cfg.H, cfg.W
    assert out.up.shape == (b, H, W, 1)
    assert out.sigm.shape == (b, H, W, 1)
    assert out.words_parse.shape == (b, 1, cfg.num_steps, cfg.parse_classes)
    for lv in cfg.levels:
        assert out.up_levels[lv].shape == (b, H, W, 1)
    if cfg.decoder == "multiscore":
        assert out.pred.shape == (b, H // 8, W // 8, 1)
    else:  # v3+ decoder emits at c2 resolution
        assert out.pred.shape == (b, H // 4, W // 4, 1)
    assert np.all(np.isfinite(np.asarray(out.up)))
    # parse rows at pad positions must be zero (seq-mask)
    parse = np.asarray(out.words_parse)
    assert np.abs(parse[0, 0, 4:]).max() < 1e-6  # sample 0 has 3 words


def test_loss_and_grad_base(rng):
    cfg = get_config("CMPC_model", **TINY)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg, rng)
    target = jnp.asarray(
        (rng.random((2, cfg.H, cfg.W, 1)) > 0.5).astype(np.float32))

    def loss_fn(p):
        out, _ = apply_model(p, state, cfg, batch, train=True)
        total, _ = compute_loss(out, target, cfg, p)
        return total

    head = {k: v for k, v in params.items() if k != "backbone"}

    def loss_head(h):
        return loss_fn({**params, **h})

    grads = jax.jit(jax.grad(loss_head))(head)
    gnorm = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0
    # every head param group must receive gradient signal
    emb_g = grads["text"]["embedding"]
    assert float(jnp.abs(emb_g).sum()) > 0
    assert float(jnp.abs(grads["fusion_stack"]["convlstm"]["kernel"]).sum()) > 0


def test_frontpad_equals_backpad(rng):
    """Origin front-padding is exactly the back-padded computation after the
    static roll (language.py _normalize_tokens)."""
    cfg = get_config("CMPC_model", **TINY)
    params, state = init_model(jax.random.PRNGKey(1), cfg)
    back = make_batch(cfg, rng)
    t = cfg.num_steps
    words_f = np.zeros((2, t), np.int32)
    words_f[0, -3:] = [3, 4, 5]
    words_f[1, -2:] = [6, 7]
    front = dict(back)
    del front["seq_len"]
    front["words"] = jnp.asarray(words_f)
    front["valid_idx"] = jnp.asarray([[t - 3], [t - 2]], jnp.int32)

    out_b, _ = apply_model(params, state, cfg, back)
    out_f, _ = apply_model(params, state, cfg, front)
    np.testing.assert_allclose(np.asarray(out_b.up), np.asarray(out_f.up),
                               rtol=2e-4, atol=2e-5)


def test_rgb_to_hsv_matches_colorsys(rng):
    import colorsys
    vals = rng.random((20, 3)).astype(np.float32)
    got = np.asarray(rgb_to_hsv(jnp.asarray(vals)))
    for k in range(20):
        h, s, v = colorsys.rgb_to_hsv(*vals[k])
        np.testing.assert_allclose(got[k], [h, s, v], rtol=1e-4, atol=1e-5)


def test_batch_independence(rng):
    """Per-sample semantics: sample 0's output must not depend on sample 1
    (guards the per-sample l2 norms and whole-sample layer norms)."""
    cfg = get_config("CMPC_model", **TINY)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    b1 = make_batch(cfg, rng)
    b2 = {k: v.copy() for k, v in b1.items()}
    b2["im"] = b2["im"].at[1].set(jnp.flip(b2["im"][1], axis=0))
    out1, _ = apply_model(params, state, cfg, b1)
    out2, _ = apply_model(params, state, cfg, b2)
    np.testing.assert_allclose(np.asarray(out1.up[0]), np.asarray(out2.up[0]),
                               rtol=1e-5, atol=1e-6)


class TestQuantizedBackbone:
    """Opt-in int8 serving path (models/backbone.py::quantize_backbone):
    per-channel int8 weights + dynamic per-tensor activation quant, detected
    by _conv_bn via the 'w_q' key. The reference ships only an f32 serving
    graph (export_model_serving.py:57-71); this is a TPU-native extra."""

    def test_quantized_close_to_f32(self, rng):
        from cmpc_refseg_tpu.models.backbone import (apply_backbone,
                                                     init_backbone,
                                                     quantize_backbone)
        p = init_backbone(jax.random.PRNGKey(0), 2)
        pq = quantize_backbone(p)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)),
                        jnp.float32) * 50.0
        ref = apply_backbone(p, x, taps=("c5",), res4_blocks=2)["c5"]
        qut = apply_backbone(pq, x, taps=("c5",), res4_blocks=2)["c5"]
        rel = float(jnp.linalg.norm(ref - qut) / jnp.linalg.norm(ref))
        cos = float(jnp.sum(ref * qut)
                    / (jnp.linalg.norm(ref) * jnp.linalg.norm(qut)))
        assert rel < 0.08, rel
        assert cos > 0.995, cos

    def test_quantize_layout_and_original_kept(self):
        from cmpc_refseg_tpu.models.backbone import (init_backbone,
                                                     quantize_backbone)
        p = init_backbone(jax.random.PRNGKey(0), 2)
        pq = quantize_backbone(p)
        u = pq["res2a"]["branch2b"]
        w = np.asarray(p["res2a"]["branch2b"]["w"])
        assert u["w_q"].dtype == np.int8
        assert u["w_q"].shape == w.shape
        assert u["w_scale"].shape == (w.shape[-1],)
        # the f32 kernel is dropped — serving must not device_put both
        assert "w" not in u
        # int8 range actually used, and dequant reconstructs the kernel
        assert np.abs(u["w_q"]).max() == 127
        np.testing.assert_allclose(u["w_q"] * u["w_scale"], w,
                                   atol=float(u["w_scale"].max()))
        # original params untouched (quantize returns a new tree)
        assert "w_q" not in p["res2a"]["branch2b"]

    def test_full_model_forward_with_quantized_backbone(self, rng):
        from cmpc_refseg_tpu.models.model import prepare_params
        cfg = get_config("CMPC_model", **TINY)
        params, state = init_model(jax.random.PRNGKey(0), cfg)
        qparams = prepare_params(params, cfg, quantize_backbone=True)
        batch = make_batch(cfg, rng)
        ref, _ = apply_model(params, state, cfg, batch, train=False)
        out, _ = apply_model(qparams, state, cfg, batch, train=False)
        assert out.sigm.shape == ref.sigm.shape
        assert np.all(np.isfinite(np.asarray(out.sigm)))
        # quantization error must not flip most pixels at threshold 0.5
        agree = np.mean((np.asarray(out.sigm) > 0.5)
                        == (np.asarray(ref.sigm) > 0.5))
        assert agree > 0.95, agree

    def test_calibrated_static_scales(self, rng):
        """calibrate_backbone bakes per-unit activation scales; the static
        path matches f32 as well as dynamic quant does, incl. on inputs
        outside the calibration set."""
        from cmpc_refseg_tpu.models.backbone import (apply_backbone,
                                                     calibrate_backbone,
                                                     init_backbone,
                                                     quantize_backbone)
        p = init_backbone(jax.random.PRNGKey(0), 2)
        pq = quantize_backbone(p)
        cal = [rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 50
               for _ in range(2)]
        pqs = calibrate_backbone(pq, cal, res4_blocks=2)
        assert "x_scale" in pqs["res2a"]["branch2b"]
        assert "x_scale" not in pq["res2a"]["branch2b"]   # input untouched
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)),
                        jnp.float32) * 50.0
        ref = apply_backbone(p, x, taps=("c5",), res4_blocks=2)["c5"]
        sta = jax.jit(lambda q: apply_backbone(
            q, x, taps=("c5",), res4_blocks=2)["c5"])(pqs)
        rel = float(jnp.linalg.norm(ref - sta) / jnp.linalg.norm(ref))
        assert rel < 0.08, rel


class TestBatchedFusionRounds:
    """apply_fusion_rounds_batched must reproduce the reference-shaped
    per-level loop exactly (same math, batched into stacked einsums)."""

    def _loop_rounds(self, p, cfg, feats, lang_feat):
        from cmpc_refseg_tpu.models.cmpc import apply_exchange
        from cmpc_refseg_tpu.ops.normalization import l2_normalize
        levels = list(cfg.levels)
        cur = dict(feats)
        for rnd in ("", "_2"):
            nxt = {}
            for lv in levels:
                others = [cur[o] for o in levels if o != lv]
                ex = apply_exchange(p["exchange"][f"{lv}{rnd}"], cfg,
                                    cur[lv], others, lang_feat)
                nxt[lv] = l2_normalize(ex, -1)
            cur = nxt
        return cur

    @pytest.mark.parametrize("nlevels", [2, 3])
    def test_matches_reference_loop(self, rng, nlevels):
        import jax.numpy as jnp
        from cmpc_refseg_tpu.models.cmpc import (apply_fusion_rounds_batched,
                                                 init_fusion_stack)
        cfg = get_config("CMPC_model", **TINY)
        if nlevels == 2:
            cfg = cfg.replace(levels=("c4", "c5"))
        p = init_fusion_stack(jax.random.PRNGKey(0), cfg)
        feats = {lv: jnp.asarray(
            rng.standard_normal((2, cfg.vf_h, cfg.vf_w, cfg.mlp_dim)),
            jnp.float32) for lv in cfg.levels}
        lang = jnp.asarray(rng.standard_normal((2, 1, 1, cfg.rnn_size)),
                           jnp.float32)
        want = self._loop_rounds(p, cfg, feats, lang)
        got = apply_fusion_rounds_batched(p, cfg, feats, lang)
        for lv in cfg.levels:
            np.testing.assert_allclose(np.asarray(got[lv]),
                                       np.asarray(want[lv]),
                                       rtol=2e-5, atol=2e-6)

    def test_bf16_close(self, rng):
        import jax.numpy as jnp
        from cmpc_refseg_tpu.models.cmpc import (apply_fusion_rounds_batched,
                                                 init_fusion_stack)
        cfg = get_config("CMPC_model", **TINY)
        p = init_fusion_stack(jax.random.PRNGKey(0), cfg)
        feats = {lv: jnp.asarray(
            rng.standard_normal((2, cfg.vf_h, cfg.vf_w, cfg.mlp_dim)),
            jnp.bfloat16) for lv in cfg.levels}
        lang = jnp.asarray(rng.standard_normal((2, 1, 1, cfg.rnn_size)),
                           jnp.float32)
        want = self._loop_rounds(p, cfg, feats, lang)
        got = apply_fusion_rounds_batched(p, cfg, feats, lang)
        for lv in cfg.levels:
            np.testing.assert_allclose(
                np.asarray(got[lv], np.float32),
                np.asarray(want[lv], np.float32), rtol=0.05, atol=0.02)


class TestSplitFusionConv:
    """The split fusion 1x1 conv (no concat materialization) must equal the
    reference-shaped concat->conv computation."""

    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_matches_concat_conv(self, rng, dtype):
        from cmpc_refseg_tpu.models.cmpc import (apply_lang2vis,
                                                 apply_mutan, apply_spa_graph,
                                                 init_lang2vis,
                                                 valid_lang_feat)
        from cmpc_refseg_tpu.ops.layers import conv2d
        cfg = get_config("CMPC_model", **TINY)
        p = init_lang2vis(jax.random.PRNGKey(0), cfg)
        dt = jnp.float32 if dtype == "float32" else jnp.bfloat16
        b, h, w = 2, cfg.vf_h, cfg.vf_w
        vis = jnp.asarray(rng.standard_normal((b, h, w, cfg.v_emb_dim)),
                          jnp.float32).astype(dt)
        wf = jnp.asarray(rng.standard_normal((b, 1, cfg.num_steps,
                                              cfg.rnn_size)), jnp.float32)
        wp = jax.nn.softmax(jnp.asarray(
            rng.standard_normal((b, 1, cfg.num_steps, 4)), jnp.float32), -1)
        sm = jnp.ones((b, 1, cfg.num_steps, 1), jnp.float32)
        sp = jnp.asarray(rng.standard_normal((b, h, w, cfg.spatial_dim)),
                         jnp.float32)

        got, _ = apply_lang2vis(p, cfg, vis, wf, wp, sm, sp)

        # reference-shaped computation (CMPC_model.py:338-345)
        valid = valid_lang_feat(wp, wf, (0, 1))
        vis_la_sp = apply_mutan(p["mutan"], valid, sp, vis)
        graph_feat, _ = apply_spa_graph(p["graph"], cfg, vis_la_sp, wf, wp,
                                        sm)
        lang_tiled = jnp.broadcast_to(
            valid.astype(vis_la_sp.dtype), (b, h, w, valid.shape[-1]))
        feat_all = jnp.concatenate(
            [vis_la_sp, graph_feat, lang_tiled,
             sp.astype(vis_la_sp.dtype)], axis=-1)
        want = jax.nn.relu(conv2d(p["fusion"], feat_all))

        tol = dict(rtol=2e-5, atol=2e-6) if dtype == "float32" \
            else dict(rtol=0.05, atol=0.03)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32), **tol)

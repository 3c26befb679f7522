"""Checkpoint-converter roundtrip: fabricate a TF checkpoint carrying the
reference's variable names (scopes verified against CMPC_model.py /
util/cell.py / kaffe network.py), run tools/convert_tf_checkpoint.convert,
and check every mapped leaf — including BN folding and mutan head
stacking — equals the expected transformation of the checkpoint values."""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402

from cmpc_refseg_tpu.config import get_config  # noqa: E402
from cmpc_refseg_tpu.models.backbone import resnet_stages  # noqa: E402
from cmpc_refseg_tpu.models.model import init_model  # noqa: E402

TINY = dict(H=32, W=32, num_steps=6, vocab_size=30, glove_dim=8,
            rnn_size=16, v_emb_dim=16, mlp_dim=12, batch_size=1,
            res4_blocks=2)


def _ckpt_tensors(cfg):
    """{tf_variable_name: value} for a tiny CMPC_model checkpoint."""
    rng = np.random.default_rng(7)
    params, _ = init_model(jax.random.PRNGKey(0), cfg)
    t = {}

    def add(name, shape):
        # small scale keeps the converted net's activations finite (unit-
        # scale random "weights" explode through the deep backbone)
        t[name] = (0.05 * rng.standard_normal(shape)).astype(np.float32)
        return t[name]

    # --- backbone: conv '<name>/weights' + BN 'bn<suffix>/{...}' ---
    def add_unit(conv_name, w_shape):
        add(f"{conv_name}/weights", w_shape)
        bn = "bn_conv1" if conv_name == "conv1" else "bn" + conv_name[3:]
        cout = w_shape[-1]
        add(f"{bn}/gamma", (cout,))
        add(f"{bn}/beta", (cout,))
        add(f"{bn}/moving_mean", (cout,))
        t[f"{bn}/moving_variance"] = np.abs(
            rng.standard_normal((cout,))).astype(np.float32) + 0.5

    add_unit("conv1", params["backbone"]["conv1"]["w"].shape)
    for bname, bp in params["backbone"].items():
        if bname == "conv1":
            continue
        for branch, unit in bp.items():
            add_unit(f"{bname}_{branch}", unit["w"].shape)

    # --- head (scope text_objseg) ---
    s = "text_objseg"
    add(f"{s}/Variable", (cfg.vocab_size, cfg.glove_dim))
    add(f"{s}/rnn/lstm_cell/kernel",
        (cfg.glove_dim + cfg.rnn_size, 4 * cfg.rnn_size))
    add(f"{s}/rnn/lstm_cell/bias", (4 * cfg.rnn_size,))

    def add_conv(name, cin, cout, k=1):
        add(f"{s}/{name}/DW", (k, k, cin, cout))
        add(f"{s}/{name}/biases", (cout,))

    def add_ln(name, c):
        add(f"{s}/{name}/gamma", (c,))
        add(f"{s}/{name}/beta", (c,))

    add_conv("words_parse_1", cfg.rnn_size, 500)
    add_conv("words_parse_2", 500, cfg.parse_classes)
    lat_in = {"c3": 512, "c4": 1024, "c5": 2048}
    for lv in cfg.levels:
        add_conv(f"{lv}_lateral", lat_in[lv], cfg.v_emb_dim)
        for i in range(1, 6):
            add_conv(f"vis_trans_{lv}_head{i}", cfg.v_emb_dim + 8,
                     cfg.v_emb_dim)
            add_conv(f"lang_trans_{lv}_head{i}", cfg.rnn_size, cfg.v_emb_dim)
        add_conv(f"words_trans_{lv}", cfg.rnn_size, cfg.v_emb_dim)
        add_conv(f"spa_graph_trans2_{lv}", cfg.v_emb_dim, cfg.v_emb_dim)
        add_conv(f"gconv_update_spa_graph_{lv}", cfg.v_emb_dim, cfg.v_emb_dim)
        add_ln(f"gconv_feat_ln_spa_graph_{lv}", cfg.v_emb_dim)
        add_ln(f"gconv_update_ln_spa_graph_{lv}", cfg.v_emb_dim)
        add_conv(f"fusion_{lv}",
                 2 * cfg.v_emb_dim + cfg.rnn_size + 8, cfg.mlp_dim)
        add_conv(f"score_{lv}", cfg.mlp_dim, 1, k=3)
    for key in ("c3", "c4", "c5", "c3_2", "c4_2", "c5_2"):
        add_conv(f"spa_graph_key_{key}gv_f1", cfg.mlp_dim, cfg.mlp_dim)
        add_conv(f"lang_query_{key}gv_f1", cfg.rnn_size, cfg.mlp_dim)
        add_conv(f"gv_lang_{key}gv_f1", cfg.mlp_dim + cfg.rnn_size,
                 cfg.mlp_dim)
        for i in (1, 2):
            add_conv(f"lang_feat_{key}_f{i}", cfg.mlp_dim, cfg.mlp_dim)
            add_conv(f"trans_feat_{key}_f{i}", cfg.mlp_dim, cfg.mlp_dim)
    base = f"{s}/rnn/conv_lstm_cell"
    add(f"{base}/kernel", (1, 1, 2 * cfg.mlp_dim, 4 * cfg.mlp_dim))
    for w in ("W_ci", "W_cf", "W_co"):
        add(f"{base}/{w}", (cfg.vf_h, cfg.vf_w, cfg.mlp_dim))
    for i in range(5):
        suffix = "" if i == 0 else f"_{i}"
        add(f"{base}/LayerNorm{suffix}/gamma", (cfg.mlp_dim,))
        add(f"{base}/LayerNorm{suffix}/beta", (cfg.mlp_dim,))
    add_conv("score", cfg.mlp_dim, 1, k=3)
    return t


def _write_ckpt(tensors, path):
    g = tf.Graph()
    with g.as_default():
        for name, val in tensors.items():
            tf.compat.v1.get_variable(name, initializer=tf.constant(val))
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            return saver.save(sess, path)


def test_converter_roundtrip(tmp_path):
    from tools.convert_tf_checkpoint import BN_EPS, convert

    cfg = get_config("CMPC_model", **TINY)
    tensors = _ckpt_tensors(cfg)
    ckpt = _write_ckpt(tensors, os.path.join(str(tmp_path), "model.ckpt"))

    out_cfg, params, state = convert(ckpt, "CMPC_model", overrides=TINY)

    # backbone: kernel copied, BN folded
    w = tensors["res3a_branch2b/weights"]
    np.testing.assert_array_equal(
        params["backbone"]["res3a"]["branch2b"]["w"], w)
    g_, b_, m_, v_ = (tensors["bn3a_branch2b/gamma"],
                      tensors["bn3a_branch2b/beta"],
                      tensors["bn3a_branch2b/moving_mean"],
                      tensors["bn3a_branch2b/moving_variance"])
    scale = g_ / np.sqrt(v_ + BN_EPS)
    np.testing.assert_allclose(
        params["backbone"]["res3a"]["branch2b"]["scale"], scale, rtol=1e-6)
    np.testing.assert_allclose(
        params["backbone"]["res3a"]["branch2b"]["offset"], b_ - m_ * scale,
        rtol=1e-5)

    # text encoder + embedding
    np.testing.assert_array_equal(params["text"]["embedding"],
                                  tensors["text_objseg/Variable"])
    np.testing.assert_array_equal(
        params["text"]["lstm"]["kernel"],
        tensors["text_objseg/rnn/lstm_cell/kernel"])

    # mutan heads stacked along the output axis
    want = np.concatenate(
        [tensors[f"text_objseg/vis_trans_c4_head{i}/DW"]
         for i in range(1, 6)], axis=-1)
    np.testing.assert_array_equal(
        params["levels"]["c4"]["mutan"]["vis_trans"]["DW"], want)

    # exchange + ConvLSTM layer norms in creation order (j,i,f,o,c)
    np.testing.assert_array_equal(
        params["fusion_stack"]["exchange"]["c5_2"]["se"][1]["trans_feat"]["DW"],
        tensors["text_objseg/trans_feat_c5_2_f2/DW"])
    np.testing.assert_array_equal(
        params["fusion_stack"]["convlstm"]["ln"][3]["gamma"],
        tensors["text_objseg/rnn/conv_lstm_cell/LayerNorm_3/gamma"])

    # converted params run: forward produces finite output
    from cmpc_refseg_tpu.models.model import apply_model
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    words = np.zeros((1, cfg.num_steps), np.int32)
    words[0, :2] = [3, 4]
    out, _ = apply_model(params, state, out_cfg, {
        "im": jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32),
        "words": jnp.asarray(words),
        "seq_len": jnp.asarray([2], np.int32)})
    assert np.isfinite(np.asarray(out.sigm)).all()

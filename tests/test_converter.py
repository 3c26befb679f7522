"""Checkpoint-converter roundtrips for every checkpointable variant family +
a grep-based name pin against the reference source.

Two complementary guards:
1. Per-family fabricated-TF-checkpoint roundtrips (base LSTM, v4 ASPP/v3+
   with live BN, BiLSTM, BERT, v6_plus self-gate/sent-fusion/2-gconv):
   every mapped leaf — BN folding, mutan head stacking, live BN state —
   equals the expected transformation of the checkpoint values.
2. test_head_names_exist_in_reference_source extracts the scope-name
   string templates from the actual reference model sources
   (self._conv("..."), scope="...", variable_scope("...")) and asserts every
   variable name the converter requests instantiates one of them — so a
   silent name drift between this repo and the reference cannot pass.
"""

import os
import re

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402

from cmpc_refseg_tpu.config import get_config  # noqa: E402
from cmpc_refseg_tpu.models.model import init_model  # noqa: E402

REF = "/root/reference"

TINY = dict(H=32, W=32, num_steps=6, vocab_size=30, glove_dim=8,
            rnn_size=16, v_emb_dim=16, mlp_dim=12, batch_size=1,
            res4_blocks=2)
TINY_BERT = dict(TINY, bert_dim=16, vw_emb_dim=8)

LAT_IN = {"c3": 512, "c4": 1024, "c5": 2048}
ASPP_DEPTH = 256


def _ckpt_tensors(cfg):
    """{tf_variable_name: value} for a tiny checkpoint of any variant."""
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
    lang = cfg.lang_dim
    sp = cfg.spatial_dim
    affin = cfg.vw_emb_dim or cfg.v_emb_dim

    def add_conv(name, cin, cout, k=1):
        add(f"{s}/{name}/DW", (k, k, cin, cout))
        add(f"{s}/{name}/biases", (cout,))

    def add_ln(name, c):
        add(f"{s}/{name}/gamma", (c,))
        add(f"{s}/{name}/beta", (c,))

    def add_gv(name):
        add_conv(f"spa_graph_key_{name}", cfg.mlp_dim, cfg.mlp_dim)
        add_conv(f"lang_query_{name}", lang, cfg.mlp_dim)
        add_conv(f"gv_lang_{name}", cfg.mlp_dim + lang, cfg.mlp_dim)

    def add_se(name):
        add_conv(f"lang_feat_{name}", cfg.mlp_dim, cfg.mlp_dim)
        add_conv(f"trans_feat_{name}", cfg.mlp_dim, cfg.mlp_dim)

    def add_mutan(level_name):
        for i in range(1, 6):
            add_conv(f"vis_trans_{level_name}_head{i}", cfg.v_emb_dim + sp,
                     cfg.v_emb_dim)
            add_conv(f"lang_trans_{level_name}_head{i}", lang, cfg.v_emb_dim)

    # text encoder
    if cfg.text_encoder in ("lstm", "lstm_frontpad"):
        add(f"{s}/Variable", (cfg.vocab_size, cfg.glove_dim))
        add(f"{s}/rnn/lstm_cell/kernel",
            (cfg.glove_dim + cfg.rnn_size, 4 * cfg.rnn_size))
        add(f"{s}/rnn/lstm_cell/bias", (4 * cfg.rnn_size,))
    elif cfg.text_encoder == "bilstm":
        add(f"{s}/Variable", (cfg.vocab_size, cfg.glove_dim))
        for d in ("fw", "bw"):
            add(f"{s}/bidirectional_rnn/{d}/lstm_cell/kernel",
                (cfg.glove_dim + cfg.rnn_size, 4 * cfg.rnn_size))
            add(f"{s}/bidirectional_rnn/{d}/lstm_cell/bias",
                (4 * cfg.rnn_size,))
        add_conv("words_feat", 2 * cfg.rnn_size, cfg.rnn_size)
    # bert: no embedding/LSTM variables (features fed as placeholders)

    add_conv("words_parse_1", lang, 500)
    add_conv("words_parse_2", 500, cfg.parse_classes)
    for lv in cfg.levels:
        add_conv(f"{lv}_lateral", LAT_IN[lv], cfg.v_emb_dim)
        add_mutan(f"entity_fusion_{lv}" if cfg.sent_fusion else lv)
        if cfg.sent_fusion:
            add_mutan(f"sent_fusion_{lv}")
        add_conv(f"words_trans_{lv}", lang, affin)
        add_conv(f"spa_graph_trans2_{lv}", cfg.v_emb_dim, affin)
        for i in range(cfg.num_graph_conv):
            gname = ("spa_graph" if cfg.num_graph_conv == 1
                     else f"spa_graph_{i}")
            add_conv(f"gconv_update_{gname}_{lv}", cfg.v_emb_dim,
                     cfg.v_emb_dim)
            add_ln(f"gconv_feat_ln_{gname}_{lv}", cfg.v_emb_dim)
            add_ln(f"gconv_update_ln_{gname}_{lv}", cfg.v_emb_dim)
        if cfg.sent_fusion:
            add_conv(f"fusion_{lv}", cfg.v_emb_dim, cfg.mlp_dim)
        else:
            add_conv(f"fusion_{lv}", 2 * cfg.v_emb_dim + lang + sp,
                     cfg.mlp_dim)
        add_conv(f"score_{lv}", cfg.mlp_dim, 1, k=3)

    n_other = len(cfg.levels) - 1
    for rnd in ("", "_2"):
        for lv in cfg.levels:
            key = f"{lv}{rnd}"
            if cfg.exchange_self_gate:
                add_gv(f"{key}gv_f")
                add_se(f"{key}_f")
                for i in range(1, n_other + 1):
                    add_gv(f"{key}gv_f{i}")
                    add_se(f"{key}_f{i}")
            else:
                add_gv(f"{key}gv_f1")
                for i in range(1, n_other + 1):
                    add_se(f"{key}_f{i}")

    base = f"{s}/rnn/conv_lstm_cell"
    add(f"{base}/kernel", (1, 1, 2 * cfg.mlp_dim, 4 * cfg.mlp_dim))
    for w in ("W_ci", "W_cf", "W_co"):
        add(f"{base}/{w}", (cfg.vf_h, cfg.vf_w, cfg.mlp_dim))
    for i in range(5):
        suffix = "" if i == 0 else f"_{i}"
        add(f"{base}/LayerNorm{suffix}/gamma", (cfg.mlp_dim,))
        add(f"{base}/LayerNorm{suffix}/beta", (cfg.mlp_dim,))

    if cfg.decoder == "multiscore":
        add_conv("score", cfg.mlp_dim, 1, k=3)
    else:
        # slim ASPP + v3+ decoder (conv 'weights' + BatchNorm sub-scope;
        # live BN statistics)
        def add_slim(tfscope, k, cin, cout, bn=True):
            add(f"{s}/{tfscope}/weights", (k, k, cin, cout))
            if bn:
                add(f"{s}/{tfscope}/BatchNorm/gamma", (cout,))
                add(f"{s}/{tfscope}/BatchNorm/beta", (cout,))
                add(f"{s}/{tfscope}/BatchNorm/moving_mean", (cout,))
                t[f"{s}/{tfscope}/BatchNorm/moving_variance"] = np.abs(
                    rng.standard_normal((cout,))).astype(np.float32) + 0.5
            else:
                add(f"{s}/{tfscope}/biases", (cout,))

        add_slim("aspp/conv_1x1", 1, cfg.mlp_dim, ASPP_DEPTH)
        for i in (1, 2, 3):
            add_slim(f"aspp/conv_3x3_{i}", 3, cfg.mlp_dim, ASPP_DEPTH)
        add_slim("aspp/image_level_features/conv_1x1", 1, cfg.mlp_dim,
                 ASPP_DEPTH)
        add_slim("aspp/conv_1x1_concat", 1, 5 * ASPP_DEPTH, ASPP_DEPTH)
        add_slim("decoder/low_level_features/conv_1x1", 1, 256, 48)
        add_slim("decoder/upsampling_logits/conv_3x3_1", 3, ASPP_DEPTH + 48,
                 ASPP_DEPTH)
        add_slim("decoder/upsampling_logits/conv_3x3_2", 3, ASPP_DEPTH,
                 ASPP_DEPTH)
        add_slim("decoder/upsampling_logits/conv_1x1", 1, ASPP_DEPTH, 1,
                 bn=False)
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


def _forward_batch(cfg, rng):
    import jax.numpy as jnp
    batch = {"im": jnp.asarray(rng.standard_normal((1, cfg.H, cfg.W, 3)),
                               jnp.float32)}
    if cfg.text_encoder == "bert":
        mask = np.zeros((1, cfg.num_steps), np.float32)
        mask[0, :3] = 1
        batch["words_feat"] = jnp.asarray(
            rng.standard_normal((1, cfg.num_steps, cfg.bert_dim)),
            jnp.float32)
        batch["sequence_mask"] = jnp.asarray(mask)
    else:
        words = np.zeros((1, cfg.num_steps), np.int32)
        if cfg.text_encoder == "lstm_frontpad":
            words[0, -2:] = [3, 4]
            batch["valid_idx"] = jnp.asarray([[cfg.num_steps - 2]], np.int32)
        else:
            words[0, :2] = [3, 4]
            batch["seq_len"] = jnp.asarray([2], np.int32)
        batch["words"] = jnp.asarray(words)
    return batch


def _roundtrip(model_name, tmp_path, tiny=None):
    from tools.convert_tf_checkpoint import convert

    tiny = tiny or TINY
    cfg = get_config(model_name, **tiny)
    tensors = _ckpt_tensors(cfg)
    ckpt = _write_ckpt(tensors, os.path.join(str(tmp_path), "model.ckpt"))
    out_cfg, params, state = convert(ckpt, model_name, overrides=tiny)
    return cfg, tensors, out_cfg, params, state


def _assert_finite_forward(out_cfg, params, state):
    from cmpc_refseg_tpu.models.model import apply_model
    rng = np.random.default_rng(0)
    out, _ = apply_model(params, state, out_cfg, _forward_batch(out_cfg, rng))
    assert np.isfinite(np.asarray(out.sigm)).all()


def test_converter_roundtrip(tmp_path):
    from tools.convert_tf_checkpoint import BN_EPS

    cfg, tensors, out_cfg, params, state = _roundtrip("CMPC_model", tmp_path)

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

    _assert_finite_forward(out_cfg, params, state)


def test_converter_roundtrip_v4_aspp(tmp_path):
    """v4 family: ASPP + v3+ decoder slim vars incl. LIVE BN statistics."""
    cfg, tensors, out_cfg, params, state = _roundtrip("CMPCv4_model",
                                                      tmp_path)
    s = "text_objseg"
    np.testing.assert_array_equal(
        params["aspp"]["conv_3x3_2"]["DW"],
        tensors[f"{s}/aspp/conv_3x3_2/weights"])
    np.testing.assert_array_equal(
        params["aspp"]["image_level"]["gamma"],
        tensors[f"{s}/aspp/image_level_features/conv_1x1/BatchNorm/gamma"])
    # live BN stats land in STATE, not folded into params
    np.testing.assert_array_equal(
        state["aspp"]["conv_1x1_concat"]["mean"],
        tensors[f"{s}/aspp/conv_1x1_concat/BatchNorm/moving_mean"])
    np.testing.assert_array_equal(
        state["decoder"]["low_level"]["var"],
        tensors[f"{s}/decoder/low_level_features/conv_1x1/BatchNorm/"
                "moving_variance"])
    np.testing.assert_array_equal(
        params["decoder"]["conv_1x1"]["biases"],
        tensors[f"{s}/decoder/upsampling_logits/conv_1x1/biases"])
    _assert_finite_forward(out_cfg, params, state)


def test_converter_roundtrip_bilstm(tmp_path):
    """BiLSTM family: bidirectional fw/bw scopes + words_feat merge conv."""
    cfg, tensors, out_cfg, params, state = _roundtrip(
        "CMPCv4_BiLSTM_T_model", tmp_path)
    s = "text_objseg"
    np.testing.assert_array_equal(
        params["text"]["lstm_fw"]["kernel"],
        tensors[f"{s}/bidirectional_rnn/fw/lstm_cell/kernel"])
    np.testing.assert_array_equal(
        params["text"]["lstm_bw"]["bias"],
        tensors[f"{s}/bidirectional_rnn/bw/lstm_cell/bias"])
    np.testing.assert_array_equal(
        params["text"]["words_feat"]["DW"],
        tensors[f"{s}/words_feat/DW"])
    _assert_finite_forward(out_cfg, params, state)


def test_converter_roundtrip_bert(tmp_path):
    """BERT family: no embedding/LSTM vars; vw-dim graph projections."""
    cfg, tensors, out_cfg, params, state = _roundtrip(
        "CMPCv4_BERT_model", tmp_path, tiny=TINY_BERT)
    s = "text_objseg"
    assert f"{s}/Variable" not in tensors
    wt = params["levels"]["c4"]["graph"]["words_trans"]["DW"]
    assert wt.shape[-1] == cfg.vw_emb_dim
    np.testing.assert_array_equal(wt, tensors[f"{s}/words_trans_c4/DW"])
    _assert_finite_forward(out_cfg, params, state)


def test_converter_roundtrip_v6_plus(tmp_path):
    """v6+: self-gated exchange, entity_/sent_fusion mutans, 2 gconvs."""
    cfg, tensors, out_cfg, params, state = _roundtrip(
        "CMPCv6_plus_model", tmp_path)
    s = "text_objseg"
    # entity/sent mutan prefixes
    want = np.concatenate(
        [tensors[f"{s}/vis_trans_entity_fusion_c5_head{i}/DW"]
         for i in range(1, 6)], axis=-1)
    np.testing.assert_array_equal(
        params["levels"]["c5"]["mutan"]["vis_trans"]["DW"], want)
    want = np.concatenate(
        [tensors[f"{s}/lang_trans_sent_fusion_c4_head{i}/biases"]
         for i in range(1, 6)], axis=-1)
    np.testing.assert_array_equal(
        params["levels"]["c4"]["sent_mutan"]["lang_trans"]["biases"], want)
    # stacked gconvs spa_graph_0 / spa_graph_1
    np.testing.assert_array_equal(
        params["levels"]["c4"]["graph"]["gconv"][1]["update"]["DW"],
        tensors[f"{s}/gconv_update_spa_graph_1_c4/DW"])
    # v6 exchange layout: self gv/se at `gv_f`/`_f`, other level at f1
    ex = params["fusion_stack"]["exchange"]["c4_2"]
    np.testing.assert_array_equal(
        ex["gv_self"]["lang_query"]["DW"],
        tensors[f"{s}/lang_query_c4_2gv_f/DW"])
    np.testing.assert_array_equal(
        ex["se_self"]["lang_feat"]["DW"],
        tensors[f"{s}/lang_feat_c4_2_f/DW"])
    np.testing.assert_array_equal(
        ex["gv_each"][0]["gv_lang"]["biases"],
        tensors[f"{s}/gv_lang_c4_2gv_f1/biases"])
    np.testing.assert_array_equal(
        ex["se"][0]["trans_feat"]["DW"],
        tensors[f"{s}/trans_feat_c4_2_f1/DW"])
    _assert_finite_forward(out_cfg, params, state)


# ---------------------------------------------------------------------------
# Name pinning against the reference source
# ---------------------------------------------------------------------------

VARIANT_REF_FILE = {
    "CMPC_model": "CMPC_model.py",
    "CMPCv4_model": "CMPCv4_model.py",
    "CMPCv4_BiLSTM_T_model": "CMPCv4_BiLSTM_T_model.py",
    "CMPCv4_BERT_model": "CMPCv4_BERT_model.py",
    "CMPCv5_model": "CMPCv5_model.py",
    "CMPCv6_model": "CMPCv6_model.py",
    "CMPCv6_plus_model": "CMPCv6_plus_model.py",
}

# scopes created by TF library internals, not source string literals
_TF_INTERNAL = re.compile(
    r"(rnn/lstm_cell|bidirectional_rnn/(fw|bw)/lstm_cell|"
    r"rnn/conv_lstm_cell|LayerNorm(_\d+)?|Variable$|BatchNorm)")
_VAR_LEAVES = {"DW", "biases", "gamma", "beta", "weights",
               "moving_mean", "moving_variance", "kernel", "bias",
               "W_ci", "W_cf", "W_co"}


def _reference_scope_templates(fname):
    with open(os.path.join(REF, fname)) as f:
        src = f.read()
    tpl = set(re.findall(r"_conv\(\s*['\"]([^'\"]+)['\"]", src))
    tpl |= set(re.findall(r"scope=['\"]([^'\"]+)['\"]", src))
    tpl |= set(re.findall(r"variable_scope\(['\"]([^'\"]+)['\"]", src))
    return tpl


def _requested_names(model_name, tiny=None):
    """Every TF variable name convert_head would read, captured by running
    it with a recording dummy `get`."""
    from tools.convert_tf_checkpoint import convert_head

    cfg = get_config(model_name, **(tiny or TINY))
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    names = []

    def get(name):
        names.append(name)
        return np.zeros((1, 1, 1, 1), np.float32)

    convert_head(get, params, cfg, state=state)
    return cfg, names


@pytest.mark.parametrize("model_name", sorted(VARIANT_REF_FILE))
def test_head_names_exist_in_reference_source(model_name):
    """Every scope the converter reads must instantiate a scope-name
    template found verbatim in the reference variant's source ({}-holes
    wildcarded) — converter name drift cannot pass silently."""
    tiny = TINY_BERT if "BERT" in model_name else TINY
    cfg, names = _requested_names(model_name, tiny)
    templates = _reference_scope_templates(VARIANT_REF_FILE[model_name])
    regexes = [re.compile("^" + re.escape(t).replace(r"\{\}", ".+") + "$")
               for t in templates]

    unmatched = []
    for name in names:
        assert name.startswith("text_objseg/")
        path = name[len("text_objseg/"):]
        if _TF_INTERNAL.search(path):
            continue
        parts = path.split("/")
        assert parts[-1] in _VAR_LEAVES, name
        scope_parts = [p for p in parts[:-1] if p != "BatchNorm"]
        for comp in scope_parts:
            if not any(rx.match(comp) for rx in regexes):
                unmatched.append(name)
                break
    assert not unmatched, (
        f"converter reads scopes absent from {VARIANT_REF_FILE[model_name]}: "
        f"{sorted(set(unmatched))[:10]}")

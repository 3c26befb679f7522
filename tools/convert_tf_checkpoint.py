"""TF-1.x checkpoint -> cmpc_refseg_tpu params converter.

Maps the reference's variable names to our pytree:
- backbone (caffe names, kaffe/tensorflow/network.py): '<conv>/weights' +
  'bn<suffix>/{gamma,beta,moving_mean,moving_variance}' -> conv kernel +
  FOLDED scale/offset (slim BN eps=1e-3, see models/backbone.py docstring);
- head ('text_objseg/...'): '<scope>/DW' + '<scope>/biases'
  (CMPC_model.py:412-417), LSTM 'rnn/lstm_cell/{kernel,bias}', embedding
  'Variable', ConvLSTM 'rnn/conv_lstm_cell/{kernel,W_ci,W_cf,W_co}' +
  'LayerNorm{,_1..4}/{gamma,beta}' in creation order (j,i,f,o,c —
  util/cell.py:52-66), mutan heads stacked into the fused conv.

Usage:
  python tools/convert_tf_checkpoint.py --ckpt /path/model.ckpt-700000 \
      --model CMPC_model --out params.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

BN_EPS = 1e-3   # slim.batch_norm default epsilon in the vendored backbone


def fold_bn(gamma, beta, mean, var, eps=BN_EPS):
    scale = gamma / np.sqrt(var + eps)
    offset = beta - mean * scale
    return scale.astype(np.float32), offset.astype(np.float32)


def bn_name_for(conv_name: str) -> str:
    """caffe conv name -> BN scope (deeplab_resnet/model.py: res2a_branch1 ->
    bn2a_branch1; conv1 -> bn_conv1)."""
    if conv_name == "conv1":
        return "bn_conv1"
    assert conv_name.startswith("res")
    return "bn" + conv_name[len("res"):]


def convert_backbone(reader, get, params_bb):
    """Fill backbone params in place from a TF checkpoint reader."""
    blocks = {"conv1": ["conv1"]}
    for name in params_bb:
        if name == "conv1":
            continue
        blocks[name] = list(params_bb[name].keys())

    def fill(unit, conv_name):
        unit["w"] = get(f"{conv_name}/weights")
        bn = bn_name_for(conv_name)
        unit["scale"], unit["offset"] = fold_bn(
            get(f"{bn}/gamma"), get(f"{bn}/beta"),
            get(f"{bn}/moving_mean"), get(f"{bn}/moving_variance"))

    fill(params_bb["conv1"], "conv1")
    for bname, bp in params_bb.items():
        if bname == "conv1":
            continue
        for branch, unit in bp.items():
            fill(unit, f"{bname}_{branch}")
    return params_bb


def convert_backbone_from_kaffe_npy(npy_path: str, params_bb: dict,
                                    params_head: dict | None = None):
    """Ingest a kaffe-converted caffemodel .npy (the reference's
    convert.py/npy2ckpt.py intermediate: {op_name: {param_name: array}},
    conv kernels already HWIO, BN params named gamma/beta/moving_mean/
    moving_variance — kaffe/transformers.py:270-289, network.py:54-69).
    Fills the backbone (BN folded) and, if `params_head` is given, the VOC
    head convs fc1_voc12_c0..c3 (weights/biases)."""
    data = np.load(npy_path, allow_pickle=True).item()

    def get(name):
        op, param = name.rsplit("/", 1)
        return np.asarray(data[op][param], np.float32)

    convert_backbone(None, get, params_bb)
    if params_head is not None:
        for i in range(4):
            params_head[f"c{i}"]["w"] = get(f"fc1_voc12_c{i}/weights")
            params_head[f"c{i}"]["b"] = get(f"fc1_voc12_c{i}/biases")
    return params_bb


def convert_head(get, params, cfg, scope="text_objseg", state=None):
    """Fill head params from reference variable names.

    Covers every checkpointable variant family:
    - base/v2/v3: LSTM encoder + multiscore decoder (CMPC_model.py);
    - v4/v5: ASPP + v3+ decoder slim variables incl. LIVE BN statistics
      (CMPCv4_model.py:181-242) — pass `state` to fill them;
    - BiLSTM (T/T2/v5_BiLSTM): bidirectional_dynamic_rnn fw/bw scopes +
      the words_feat merge conv (CMPCv4_BiLSTM_T_model.py:161-187);
    - BERT: no embedding/LSTM vars (features are placeholders,
      CMPCv4_BERT_model.py:80-83); graph vw-projection shares the
      words_trans/spa_graph_trans2 names at vw_emb_dim (:445-453);
    - v6: per-exchanged-feature global vectors + self gate
      (CMPCv6_model.py:323-339 — scopes `{key}gv_f` / `_f` for self,
      `{key}gv_f1` / `_f1` for the other level);
    - v6+: entity_fusion_/sent_fusion_ mutan prefixes
      (CMPCv6_plus_model.py:419-427) and stacked gconvs spa_graph_0/1
      (:494-496).
    """
    def conv(scope_name):
        return {"DW": get(f"{scope}/{scope_name}/DW"),
                "biases": get(f"{scope}/{scope_name}/biases")}

    def ln(scope_name):
        return {"gamma": get(f"{scope}/{scope_name}/gamma"),
                "beta": get(f"{scope}/{scope_name}/beta")}

    def gv(name):
        """global_vec scope set (CMPC_model.py:212-243)."""
        return {
            "spa_graph_key": conv(f"spa_graph_key_{name}"),
            "lang_query": conv(f"lang_query_{name}"),
            "gv_lang": conv(f"gv_lang_{name}"),
        }

    def mutan(level_name):
        """Stack the 5 per-head convs along the output axis
        (mutan_head scopes `vis_trans_{level}_head{i}`, CMPC_model.py:295-328)."""
        vis_k = [get(f"{scope}/vis_trans_{level_name}_head{i}/DW")
                 for i in range(1, 6)]
        vis_b = [get(f"{scope}/vis_trans_{level_name}_head{i}/biases")
                 for i in range(1, 6)]
        lang_k = [get(f"{scope}/lang_trans_{level_name}_head{i}/DW")
                  for i in range(1, 6)]
        lang_b = [get(f"{scope}/lang_trans_{level_name}_head{i}/biases")
                  for i in range(1, 6)]
        return {
            "vis_trans": {"DW": np.concatenate(vis_k, axis=-1),
                          "biases": np.concatenate(vis_b, axis=-1)},
            "lang_trans": {"DW": np.concatenate(lang_k, axis=-1),
                           "biases": np.concatenate(lang_b, axis=-1)},
        }

    # text encoder
    if cfg.text_encoder == "bert":
        pass   # features are placeholders; no embedding/LSTM variables
    else:
        params["text"]["embedding"] = get(f"{scope}/Variable")
        if "lstm" in params["text"]:
            params["text"]["lstm"] = {
                "kernel": get(f"{scope}/rnn/lstm_cell/kernel"),
                "bias": get(f"{scope}/rnn/lstm_cell/bias"),
            }
        if "lstm_fw" in params["text"]:
            # bidirectional_dynamic_rnn default scope
            # (CMPCv4_BiLSTM_T_model.py:166-171)
            base = f"{scope}/bidirectional_rnn"
            params["text"]["lstm_fw"] = {
                "kernel": get(f"{base}/fw/lstm_cell/kernel"),
                "bias": get(f"{base}/fw/lstm_cell/bias")}
            params["text"]["lstm_bw"] = {
                "kernel": get(f"{base}/bw/lstm_cell/kernel"),
                "bias": get(f"{base}/bw/lstm_cell/bias")}
            # fw/bw concat -> 1x1 merge conv (:178)
            params["text"]["words_feat"] = conv("words_feat")
    params["parser"]["words_parse_1"] = conv("words_parse_1")
    params["parser"]["words_parse_2"] = conv("words_parse_2")

    for lv in cfg.levels:
        lp = params["levels"][lv]
        params["laterals"][lv] = conv(f"{lv}_lateral")
        # v6+ prefixes the mutan scopes (CMPCv6_plus_model.py:419,427)
        lp["mutan"] = {**lp["mutan"],
                       **mutan(f"entity_fusion_{lv}" if cfg.sent_fusion
                               else lv)}
        if "sent_mutan" in lp:
            lp["sent_mutan"] = {**lp["sent_mutan"],
                                **mutan(f"sent_fusion_{lv}")}
        lp["graph"]["words_trans"] = conv(f"words_trans_{lv}")
        lp["graph"]["spa_graph_trans2"] = conv(f"spa_graph_trans2_{lv}")
        for i, gp in enumerate(lp["graph"]["gconv"]):
            gname = ("spa_graph" if cfg.num_graph_conv == 1
                     else f"spa_graph_{i}")
            gp["update"] = conv(f"gconv_update_{gname}_{lv}")
            gp["feat_ln"] = ln(f"gconv_feat_ln_{gname}_{lv}")
            gp["update_ln"] = ln(f"gconv_update_ln_{gname}_{lv}")
        lp["fusion"] = conv(f"fusion_{lv}")
        params["scores"][f"score_{lv}"] = conv(f"score_{lv}")

    # gated exchange rounds
    ex = params["fusion_stack"]["exchange"]
    for key, p in ex.items():
        if "gv" in p:
            p["gv"] = gv(f"{key}gv_f1")
        else:
            # v6 layout (CMPCv6_model.py:323-339): gv+se on the target
            # feature itself (`gv_f` / `_f`), then one gv+se per other
            # level (`gv_f1` / `_f1`, ...)
            p["gv_self"] = gv(f"{key}gv_f")
            p["se_self"] = {"lang_feat": conv(f"lang_feat_{key}_f"),
                            "trans_feat": conv(f"trans_feat_{key}_f")}
            p["gv_each"] = [gv(f"{key}gv_f{i}")
                            for i in range(1, len(p["gv_each"]) + 1)]
        for i, se in enumerate(p["se"], start=1):
            se["lang_feat"] = conv(f"lang_feat_{key}_f{i}")
            se["trans_feat"] = conv(f"trans_feat_{key}_f{i}")

    # ConvLSTM (dynamic_rnn scope 'rnn/conv_lstm_cell')
    cl = params["fusion_stack"]["convlstm"]
    base = f"{scope}/rnn/conv_lstm_cell"
    cl["kernel"] = get(f"{base}/kernel")
    for w in ("W_ci", "W_cf", "W_co"):
        cl[w] = get(f"{base}/{w}")
    for i in range(5):   # creation order j,i,f,o,c
        suffix = "" if i == 0 else f"_{i}"
        cl["ln"][i] = {"gamma": get(f"{base}/LayerNorm{suffix}/gamma"),
                       "beta": get(f"{base}/LayerNorm{suffix}/beta")}

    if "score" in params["scores"]:
        params["scores"]["score"] = conv("score")

    if cfg.decoder == "aspp_v3plus":
        convert_aspp_decoder(get, params, state, scope=scope)
    return params


# slim conv2d scope -> our aspp/decoder param keys.  The model builds under
# variable_scope('text_objseg') (CMPCv4_model.py:95); ASPP at :212-242,
# decoder at :181-197.  resnet_arg_scope attaches BatchNorm (scale=True) to
# every conv except the final decoder 1x1 logits conv
# (activation_fn=None, normalizer_fn=None -> weights + biases).
ASPP_SCOPES = {
    "conv_1x1": "aspp/conv_1x1",
    "conv_3x3_1": "aspp/conv_3x3_1",
    "conv_3x3_2": "aspp/conv_3x3_2",
    "conv_3x3_3": "aspp/conv_3x3_3",
    "image_level": "aspp/image_level_features/conv_1x1",
    "conv_1x1_concat": "aspp/conv_1x1_concat",
}
DECODER_BN_SCOPES = {
    "low_level": "decoder/low_level_features/conv_1x1",
    "conv_3x3_1": "decoder/upsampling_logits/conv_3x3_1",
    "conv_3x3_2": "decoder/upsampling_logits/conv_3x3_2",
}
DECODER_LOGITS_SCOPE = "decoder/upsampling_logits/conv_1x1"


def convert_aspp_decoder(get, params, state, scope="text_objseg"):
    """Fill ASPP + DeepLabv3+ decoder params AND live-BN state from slim
    variable names (CMPCv4_model.py:181-242).  Unlike the frozen backbone
    BN (folded into scale/offset), these BN layers train in the reference
    (update_ops dependency), so moving_mean/variance land in `state` and
    gamma/beta stay separate parameters."""
    def bn_unit(tfscope):
        p = {"DW": get(f"{scope}/{tfscope}/weights"),
             "gamma": get(f"{scope}/{tfscope}/BatchNorm/gamma"),
             "beta": get(f"{scope}/{tfscope}/BatchNorm/beta")}
        s = {"mean": get(f"{scope}/{tfscope}/BatchNorm/moving_mean"),
             "var": get(f"{scope}/{tfscope}/BatchNorm/moving_variance")}
        return p, s

    for key, sc in ASPP_SCOPES.items():
        params["aspp"][key], st = bn_unit(sc)
        if state is not None:
            state["aspp"][key] = st
    for key, sc in DECODER_BN_SCOPES.items():
        params["decoder"][key], st = bn_unit(sc)
        if state is not None:
            state["decoder"][key] = st
    params["decoder"]["conv_1x1"] = {
        "DW": get(f"{scope}/{DECODER_LOGITS_SCOPE}/weights"),
        "biases": get(f"{scope}/{DECODER_LOGITS_SCOPE}/biases")}
    return params


def convert(ckpt_path: str, model_name: str, overrides=None):
    import tensorflow as tf
    from cmpc_refseg_tpu.config import get_config
    from cmpc_refseg_tpu.models.model import init_model
    import jax

    cfg = get_config(model_name, **(overrides or {}))
    params, state = init_model(jax.random.PRNGKey(0), cfg)

    reader = tf.train.load_checkpoint(ckpt_path)

    def get(name):
        return np.asarray(reader.get_tensor(name))

    convert_backbone(reader, get, params["backbone"])
    convert_head(get, params, cfg, state=state)
    return cfg, params, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--model", default="CMPC_model")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    cfg, params, state = convert(args.ckpt, args.model)
    import jax
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    np.savez(args.out, **{jax.tree_util.keystr(k): np.asarray(v)
                          for k, v in flat})
    print(f"wrote {args.out} ({len(flat)} tensors)")


if __name__ == "__main__":
    main()

"""Language encoders: GloVe embedding + LSTM / BiLSTM / BERT-feature input.

Reference encoders:
- fork 'lstm': trainable GloVe embedding + `dynamic_rnn(LSTMCell)` with
  back-padded tokens and true `seq_len` (CMPC_model.py:144-164);
- origin 'lstm_frontpad': front-padded tokens, manually unrolled
  BasicLSTMCell skipping pad steps via `tf.cond` (CMPC_model_origin.py:105-147).
  Because pads are all at the front, the state is zero until the first valid
  word, and skipped steps emit zero outputs, this is EXACTLY an LSTM over the
  back-padded valid words — so both variants share one static-shape
  `lax.scan` core (no data-dependent control flow under jit).  The only real
  difference: origin takes `lang_feat` from the final hidden state, the fork
  sums word features (CMPC_model.py:161 vs CMPC_model_origin.py:140-141).
- 'bilstm': `bidirectional_dynamic_rnn` + 1x1 conv merge
  (CMPCv4_BiLSTM_T_model.py:158-185);
- 'bert': precomputed BERT features [B,T,768] + mask
  (CMPCv4_BERT_model.py:80-83) — no recurrence, just masking.

TF parity notes: LSTMCell/BasicLSTMCell gate order is (i, j, f, o) with
forget_bias=1.0 added to f pre-sigmoid; `dynamic_rnn` zeroes outputs past
`sequence_length`.  Kernel init is glorot-uniform, bias zeros.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

import numpy as np

from cmpc_refseg_tpu.ops.layers import (dense, glorot_uniform, init_conv,
                                         normal_init, split_stream)
from cmpc_refseg_tpu.ops.normalization import l2_normalize


class TextFeatures(NamedTuple):
    """Output bundle of a text encoder."""
    words_feat: jnp.ndarray   # [B, 1, T, C] word features fed downstream
    lang_feat: jnp.ndarray    # [B, 1, 1, C] sentence feature
    seq_mask: jnp.ndarray     # [B, 1, T, 1] 1.0 at valid words
    parse_feat: jnp.ndarray   # [B, 1, T, C] features the lang parser runs on


# ---------------------------------------------------------------------------
# LSTM core
# ---------------------------------------------------------------------------

def init_lstm_cell(key, input_dim: int, hidden: int) -> dict:
    """TF LSTMCell params: kernel [input+hidden, 4*hidden] (i|j|f|o), bias 0."""
    return {
        "kernel": glorot_uniform(key, (input_dim + hidden, 4 * hidden)),
        "bias": np.zeros((4 * hidden,), np.float32),
    }


def lstm_scan(cell_params: dict, inputs: jnp.ndarray, seq_len: jnp.ndarray,
              *, forget_bias: float = 1.0, reverse: bool = False):
    """Run an LSTM over [B, T, D] inputs with `dynamic_rnn` semantics:
    outputs zeroed and state frozen at t >= seq_len.

    With ``reverse=True``, implements `bidirectional_dynamic_rnn`'s backward
    pass: the VALID prefix is reversed per sample (tf.reverse_sequence), the
    scan runs forward, and outputs are re-reversed — done here with static
    gather indices derived from seq_len (no dynamic shapes).
    """
    b, t, _ = inputs.shape
    hidden = cell_params["kernel"].shape[1] // 4

    if reverse:
        # reverse_sequence: index j -> seq_len-1-j for j < seq_len, else j
        pos = jnp.arange(t)[None, :]                      # [1, T]
        rev_idx = jnp.where(pos < seq_len[:, None],
                            seq_len[:, None] - 1 - pos, pos)  # [B, T]
        inputs = jnp.take_along_axis(inputs, rev_idx[:, :, None], axis=1)

    # Hoist the input projection out of the recurrence: ONE [B*T,D]x[D,4H]
    # matmul instead of T small ones inside the scan (the x-rows and h-rows
    # of the TF kernel are contiguous, so this is numerically identical).
    d = inputs.shape[-1]
    k_x, k_h = cell_params["kernel"][:d], cell_params["kernel"][d:]
    gx = (jnp.matmul(inputs.reshape(b * t, d), k_x,
                     preferred_element_type=jnp.float32)
          .reshape(b, t, -1) + cell_params["bias"])

    def step(carry, gxt):
        c, h, tpos = carry
        gates = jnp.matmul(h, k_h, preferred_element_type=jnp.float32) + gxt
        i, j, f, o = jnp.split(gates, 4, axis=-1)
        new_c = (jax.nn.sigmoid(f + forget_bias) * c
                 + jax.nn.sigmoid(i) * jnp.tanh(j))
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        valid = (tpos < seq_len)[:, None].astype(new_h.dtype)
        c = valid * new_c + (1 - valid) * c
        h = valid * new_h + (1 - valid) * h
        out = valid * new_h
        return (c, h, tpos + 1), out

    init = (jnp.zeros((b, hidden), inputs.dtype),
            jnp.zeros((b, hidden), inputs.dtype),
            jnp.asarray(0, jnp.int32))
    (_, final_h, _), outs = jax.lax.scan(step, init,
                                         jnp.swapaxes(gx, 0, 1))
    outs = jnp.swapaxes(outs, 0, 1)  # [B, T, H]

    if reverse:
        outs = jnp.take_along_axis(outs, rev_idx[:, :, None], axis=1)
    return outs, final_h


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------

def init_text_encoder(key, cfg, glove: jnp.ndarray | None = None) -> dict:
    """Params for the configured text encoder.  `glove` [vocab, glove_dim]
    initializes the trainable embedding (CMPC_model.py:79-81,145)."""
    k1, k2, k3, k4 = split_stream(key, 4)
    enc = cfg.text_encoder
    if enc == "bert":
        return {}
    if glove is None:
        glove = normal_init(k1, (cfg.vocab_size, cfg.glove_dim))
    params = {"embedding": np.asarray(glove, np.float32)}
    if enc in ("lstm", "lstm_frontpad"):
        params["lstm"] = init_lstm_cell(k2, cfg.glove_dim, cfg.rnn_size)
    elif enc == "bilstm":
        params["lstm_fw"] = init_lstm_cell(k2, cfg.glove_dim, cfg.rnn_size)
        params["lstm_bw"] = init_lstm_cell(k3, cfg.glove_dim, cfg.rnn_size)
        params["words_feat"] = init_conv(k4, 1, 2 * cfg.rnn_size, cfg.rnn_size)
    else:
        raise ValueError(f"unknown text encoder {enc!r}")
    return params


def _normalize_tokens(words: jnp.ndarray, seq_len: jnp.ndarray | None,
                      valid_idx: jnp.ndarray | None, T: int):
    """Canonicalize to back-padded tokens + seq_len.  Front-padded input
    (origin-style, pad id 0 at the front, `valid_idx` = #pads) is rolled to
    back-padded form with a static gather."""
    if seq_len is not None:
        return words, seq_len
    if valid_idx is None:
        raise ValueError("need seq_len (back-pad) or valid_idx (front-pad)")
    valid_idx = valid_idx.reshape(-1)          # [B]
    pos = jnp.arange(T)[None, :]
    src = jnp.minimum(pos + valid_idx[:, None], T - 1)
    rolled = jnp.take_along_axis(words, src, axis=1)
    return rolled, (T - valid_idx).astype(jnp.int32)


def encode_text(params: dict, cfg, words: jnp.ndarray = None,
                seq_len: jnp.ndarray = None, valid_idx: jnp.ndarray = None,
                words_feat: jnp.ndarray = None,
                sequence_mask: jnp.ndarray = None) -> TextFeatures:
    """Encode tokens (or precomputed BERT features) into TextFeatures."""
    enc = cfg.text_encoder
    T = cfg.num_steps

    if enc == "bert":
        # CMPCv4_BERT_model.py:80-106: features fed directly; mask given.
        wf = l2_normalize(words_feat, -1) * sequence_mask[:, :, None]
        wf = wf[:, None]                                   # [B,1,T,C]
        lang = jnp.sum(wf, axis=-2, keepdims=True)         # [B,1,1,C]
        mask = sequence_mask[:, None, :, None].astype(jnp.float32)
        return TextFeatures(wf, lang, mask, wf)

    words, seq_len = _normalize_tokens(words, seq_len, valid_idx, T)
    emb = jnp.take(params["embedding"], words, axis=0)     # [B,T,glove]

    if enc in ("lstm", "lstm_frontpad"):
        outs, final_h = lstm_scan(params["lstm"], emb, seq_len)
        wf = l2_normalize(outs, -1)[:, None]               # [B,1,T,C]
        if enc == "lstm":
            # fork: sentence feature = sum of word features (CMPC_model.py:161)
            lang = jnp.sum(wf, axis=-2, keepdims=True)
        else:
            # origin: final hidden state, l2-normalized
            # (CMPC_model_origin.py:140-141)
            lang = l2_normalize(final_h, -1)[:, None, None]
        # seq_mask from zero output rows (CMPC_model.py:163)
        mask = (jnp.sum(jnp.abs(wf), -1, keepdims=True) != 0
                ).astype(jnp.float32)
        return TextFeatures(wf, lang, mask, wf)

    if enc == "bilstm":
        fw, _ = lstm_scan(params["lstm_fw"], emb, seq_len)
        bw, _ = lstm_scan(params["lstm_bw"], emb, seq_len, reverse=True)
        cat = jnp.concatenate([fw, bw], axis=-1)[:, None]  # [B,1,T,2C]
        merged = dense({"DW": params["words_feat"]["DW"][0, 0],
                        "biases": params["words_feat"]["biases"]}, cat)
        if cfg.bilstm_tanh:
            merged = jnp.tanh(merged)          # v5_BiLSTM (line 183)
        merged = l2_normalize(merged, -1)
        fw_n = l2_normalize(fw, -1)[:, None]
        if cfg.bilstm_mask_pre_merge:
            # v5_BiLSTM: mask from the raw fw/bw concat (true pad mask)
            mask = (jnp.sum(jnp.abs(cat), -1, keepdims=True) != 0
                    ).astype(jnp.float32)
        else:
            # T/T2: mask from POST-conv merged feats
            # (CMPCv4_BiLSTM_T_model.py:183) — zero rows only while the merge
            # bias is zero; reproduced faithfully.
            mask = (jnp.sum(jnp.abs(merged), -1, keepdims=True) != 0
                    ).astype(jnp.float32)
        # downstream word features: fw for T/T2, merged for v5
        wf = fw_n if cfg.bilstm_words_source == "fw" else merged
        lang = jnp.sum(wf, axis=-2, keepdims=True)
        # parser always consumes the merged features (both sub-variants)
        return TextFeatures(wf, lang, mask, merged)

    raise ValueError(f"unknown text encoder {enc!r}")

"""End-to-end SEMANTIC test: the full pipeline (tokens -> LSTM -> parser ->
mutan -> graph -> TGFE -> decoder, trained with the reference loss/optimizer)
must learn referring segmentation on a synthetic two-box dataset — the
expression selects WHICH box to segment, so passing requires genuine
cross-modal grounding, not just mask regression."""

import jax
import numpy as np

from cmpc_refseg_tpu.config import get_config
from cmpc_refseg_tpu.models.model import apply_model
from cmpc_refseg_tpu.train.trainer import state_params
from cmpc_refseg_tpu.train.trainer import create_train_state, make_train_step

RED, BLUE = 3, 4


def _make_batch(rng, b=4):
    ims, words, masks = [], [], []
    for _ in range(b):
        im = np.zeros((32, 32, 3), np.float32)
        ry, rx = rng.integers(2, 6), rng.integers(2, 6)
        by, bx = rng.integers(18, 22), rng.integers(18, 22)
        im[ry:ry + 10, rx:rx + 10, 0] = 120.0     # red box
        im[by:by + 10, bx:bx + 10, 2] = 120.0     # blue box
        word = rng.choice([RED, BLUE])
        m = np.zeros((32, 32, 1), np.float32)
        if word == RED:
            m[ry:ry + 10, rx:rx + 10] = 1
        else:
            m[by:by + 10, bx:bx + 10] = 1
        tok = np.zeros(4, np.int32)
        tok[0] = word
        ims.append(im)
        words.append(tok)
        masks.append(m)
    return {"im": np.stack(ims), "words": np.stack(words),
            "seq_len": np.ones(b, np.int32), "target": np.stack(masks)}


def test_model_learns_referring_grounding(rng):
    cfg = get_config("CMPC_model", H=32, W=32, num_steps=4, vocab_size=8,
                     glove_dim=8, rnn_size=16, v_emb_dim=16, mlp_dim=12,
                     batch_size=4, res4_blocks=2, start_lr=3e-3, end_lr=1e-3,
                     lr_decay_step=700)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg)
    for _ in range(700):
        state, metrics = step(state, _make_batch(rng))
    assert float(metrics["train_mIoU"]) > 0.4

    # grounding: SAME image, different expression -> different mask
    params = state_params(state)
    im = np.zeros((32, 32, 3), np.float32)
    im[3:13, 3:13, 0] = 120.0
    im[19:29, 19:29, 2] = 120.0
    red_region = im[:, :, 0] > 0
    blue_region = im[:, :, 2] > 0
    cover = {}
    for word in (RED, BLUE):
        tok = np.zeros((1, 4), np.int32)
        tok[0, 0] = word
        out, _ = apply_model(params, state.model_state, cfg,
                             {"im": im[None], "words": tok,
                              "seq_len": np.ones(1, np.int32)})
        sigm = np.asarray(out.sigm)[0, :, :, 0]
        cover[word] = (sigm[red_region].mean(), sigm[blue_region].mean())
    # the referred box must carry far more probability mass than the other
    # (discrimination, robust to calibration of the absolute threshold)
    assert cover[RED][0] > 0.3 and cover[RED][0] > 4 * cover[RED][1], cover
    assert cover[BLUE][1] > 0.3 and cover[BLUE][1] > 4 * cover[BLUE][0], cover

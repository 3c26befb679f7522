"""Video model forward test (CMPC_video_mm_tgraph_allvec parity shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

from cmpc_refseg_tpu.config import get_config
from cmpc_refseg_tpu.models.video import apply_video_model, init_video_model

TINY = dict(H=32, W=32, num_steps=6, vocab_size=30, glove_dim=8,
            rnn_size=16, v_emb_dim=16, mlp_dim=12, batch_size=1,
            res4_blocks=2, num_frames=8, sampled_frames=(0, 2, 4, 6, 7))


def test_video_forward_shapes(rng):
    cfg = get_config("CMPC_video_mm_tgraph_allvec", **TINY)
    params, state = init_video_model(jax.random.PRNGKey(0), cfg)
    b, t = cfg.batch_size, cfg.num_steps
    words = np.zeros((b, t), np.int32)
    words[0, -3:] = [3, 4, 5]
    batch = {
        "clip": jnp.asarray(
            rng.standard_normal((b, cfg.num_frames, cfg.H, cfg.W, 3)),
            jnp.float32),
        "words": jnp.asarray(words),
        "valid_idx": jnp.asarray([[t - 3]], jnp.int32),
    }
    fwd = jax.jit(lambda p, s, bt: apply_video_model(p, s, cfg, bt))
    out, _ = fwd(params, state, batch)
    assert out.up.shape == (b, cfg.H, cfg.W, 1)
    assert out.words_parse.shape == (b, 1, t, 5)   # 5-way parse (+Action)
    for lv in cfg.levels:
        assert out.up_levels[lv].shape == (b, cfg.H, cfg.W, 1)
    assert np.all(np.isfinite(np.asarray(out.up)))
    # front-padded input is canonicalized to back-padded order internally
    # (language.py _normalize_tokens): valid words land at [:3], pads at [3:]
    # and must carry no parse mass
    parse = np.asarray(out.words_parse)
    assert np.abs(parse[0, 0, 3:]).max() < 1e-6
    assert np.abs(parse[0, 0, :3]).sum() > 0.1


def test_video_bf16_head_consistency(rng):
    """bf16 compute path stays close to f32 and returns f32 logits."""
    cfg32 = get_config("CMPC_video_mm_tgraph_allvec", **TINY)
    cfg16 = cfg32.replace(compute_dtype="bfloat16")
    params, state = init_video_model(jax.random.PRNGKey(0), cfg32)
    b, t = cfg32.batch_size, cfg32.num_steps
    words = np.zeros((b, t), np.int32)
    words[0, -3:] = [3, 4, 5]
    batch = {
        "clip": jnp.asarray(
            rng.standard_normal((b, cfg32.num_frames, cfg32.H, cfg32.W, 3)),
            jnp.float32),
        "words": jnp.asarray(words),
        "valid_idx": jnp.asarray([[t - 3]], jnp.int32),
    }
    o32, _ = apply_video_model(params, state, cfg32, batch)
    o16, _ = apply_video_model(params, state, cfg16, batch)
    assert o16.up.dtype == jnp.float32
    s32 = 1 / (1 + np.exp(-np.asarray(o32.up)))
    s16 = 1 / (1 + np.exp(-np.asarray(o16.up)))
    assert np.abs(s32 - s16).max() < 0.05

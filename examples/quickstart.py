"""Quickstart: build a model, run a forward pass, train a few steps.

Runs anywhere (CPU or TPU); uses a tiny configuration and synthetic data so
it finishes in under two minutes with no datasets.

  python examples/quickstart.py
"""

import numpy as np


def main():
    import jax

    from cmpc_refseg_tpu.api import build_model
    from cmpc_refseg_tpu.config import VARIANTS
    from cmpc_refseg_tpu.train.trainer import (create_train_state,
                                               make_train_step)

    print(f"devices: {jax.devices()}")
    print(f"{len(VARIANTS)} model variants: {sorted(VARIANTS)[:4]} ...")

    tiny = dict(H=64, W=64, num_steps=8, vocab_size=100, glove_dim=16,
                rnn_size=32, v_emb_dim=32, mlp_dim=24, res4_blocks=2)

    # --- inference through the high-level API -----------------------------
    model = build_model("CMPC_model", **tiny)
    rng = np.random.default_rng(0)
    words = np.zeros((1, 8), np.int32)
    words[0, :3] = [5, 17, 31]          # token ids of "the red box"
    batch = {
        "im": rng.standard_normal((1, 64, 64, 3)).astype(np.float32),
        "words": words,
        "seq_len": np.asarray([3], np.int32),
    }
    out = model.forward(batch)
    print(f"forward: mask prob {out.sigm.shape}, "
          f"word parse {out.words_parse.shape}")

    # --- a few training steps ---------------------------------------------
    cfg = model.cfg.replace(batch_size=2, start_lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg)
    tb = {
        "im": rng.standard_normal((2, 64, 64, 3)).astype(np.float32),
        "words": np.tile(words, (2, 1)),
        "seq_len": np.asarray([3, 3], np.int32),
        "target": (rng.random((2, 64, 64, 1)) > 0.7).astype(np.float32),
    }
    for it in range(3):
        state, metrics = step(state, tb)
        print(f"train step {it}: loss {float(metrics['loss_cls_all']):.2f}")
    print("ok")


if __name__ == "__main__":
    main()

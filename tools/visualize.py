"""Qualitative visualization dumps (reference: test_visualize_fusion*.py,
test_visualize_graph.py, trainval_model.py visualize_seg :306-334).

Given a checkpoint and an eval sample stream, writes per-sample:
- predicted mask overlay PNG,
- per-level upsampled score maps (up_c3/up_c4/up_c5),
- words_parse distribution as JSON,
- per-word graph attention heatmaps (gw_v) as a PNG grid
  (test_visualize_graph.py:269-274 plots a 4x5 matplotlib grid).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def colorize(prob: np.ndarray) -> np.ndarray:
    """[H,W] in [0,1] -> uint8 heatmap (blue->red)."""
    p = np.clip(prob, 0, 1)
    r = (p * 255).astype(np.uint8)
    b = ((1 - p) * 255).astype(np.uint8)
    g = np.zeros_like(r)
    return np.stack([r, g, b], axis=-1)


def overlay(image: np.ndarray, mask: np.ndarray, alpha=0.5) -> np.ndarray:
    out = image.astype(np.float32).copy()
    out[mask] = (1 - alpha) * out[mask] + alpha * np.array([255, 0, 0])
    return out.astype(np.uint8)


def dump_sample(out_dir: str, idx: int, sample: dict, outputs, tokens=None):
    """Write all visualization artifacts for one eval sample."""
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    sigm = np.asarray(outputs.sigm)[0, :, :, 0]
    Image.fromarray(colorize(sigm)).save(
        os.path.join(out_dir, f"{idx:05d}_sigm.png"))
    if "im_native" in sample:
        from cmpc_refseg_tpu.data.image import resize_and_crop
        native = np.asarray(sample["im_native"])
        mask = resize_and_crop(sigm, native.shape[0], native.shape[1]) > 0.5
        Image.fromarray(overlay(native, mask)).save(
            os.path.join(out_dir, f"{idx:05d}_overlay.png"))
    for lv, up in outputs.up_levels.items():
        prob = 1 / (1 + np.exp(-np.asarray(up)[0, :, :, 0]))
        Image.fromarray(colorize(prob)).save(
            os.path.join(out_dir, f"{idx:05d}_up_{lv}.png"))

    parse = np.asarray(outputs.words_parse)[0, 0]       # [T, K]
    rec = {"words_parse": parse.tolist()}
    if tokens is not None:
        rec["tokens"] = list(tokens)
    with open(os.path.join(out_dir, f"{idx:05d}_parse.json"), "w") as f:
        json.dump(rec, f, indent=2)

    # per-word graph attention grid (gw_v: [B,HW,T] per level)
    for lv, (gw_w, gw_v) in outputs.gw.items():
        g = np.asarray(gw_v)[0]                          # [HW, T]
        hw, t = g.shape
        side = int(np.sqrt(hw))
        cols = 5
        rows = (t + cols - 1) // cols
        grid = np.zeros((rows * side, cols * side), np.float32)
        for w in range(t):
            r, c = divmod(w, cols)
            m = g[:, w].reshape(side, side)
            mx = m.max()
            grid[r * side:(r + 1) * side, c * side:(c + 1) * side] = (
                m / mx if mx > 0 else m)
        Image.fromarray(colorize(grid)).save(
            os.path.join(out_dir, f"{idx:05d}_gw_{lv}.png"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", dest="model_name", default="CMPC_model")
    ap.add_argument("-d", dest="dataset", default="unc")
    ap.add_argument("-t", dest="split", default="val")
    ap.add_argument("-f", dest="data_folder", default="./data")
    ap.add_argument("-ckpt_dir", dest="ckpt_dir", default="./checkpoints")
    ap.add_argument("-out", dest="out_dir", default="./visualize")
    ap.add_argument("-max", dest="max_samples", type=int, default=20)
    args = ap.parse_args()

    import jax
    from cmpc_refseg_tpu.cli import make_config, npz_eval_samples
    from cmpc_refseg_tpu.models.model import apply_model
    from cmpc_refseg_tpu.train.checkpoint import restore_checkpoint
    from cmpc_refseg_tpu.train.trainer import state_params
    from cmpc_refseg_tpu.train.trainer import create_train_state

    args.batch_size, args.num_steps, args.H, args.W = 1, 20, 320, 320
    args.start_lr, args.conv5, args.compute_dtype = 2.5e-4, False, None
    args.emb_name, args.emb_dir = None, "data"
    cfg, _ = make_config(args)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    state = restore_checkpoint(args.ckpt_dir, state)
    params = state_params(state)

    fwd = jax.jit(lambda p, s, b: apply_model(p, s, cfg, b)[0])
    for i, sample in enumerate(npz_eval_samples(
            args.data_folder, args.dataset, args.split, cfg)):
        if i >= args.max_samples:
            break
        batch = {k: sample[k] for k in ("im", "words", "seq_len")}
        outputs = fwd(params, state.model_state, batch)
        dump_sample(args.out_dir, i, sample, outputs,
                    tokens=sample["words"][0].tolist())
    print(f"wrote visualizations to {args.out_dir}")


if __name__ == "__main__":
    main()

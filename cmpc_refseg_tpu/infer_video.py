"""YouTube-VOS / RefVOS full-set inference (reference: test.py).

Iterates meta_expressions.json videos -> expressions -> frames
(test.py:237-250), tokenizes each expression (:267), runs the model,
thresholds the sigmoid at `threshold` (default 0.5, :419), writes PNG masks
at half resolution x255 (:307-308) via the async save worker (:249,329).
Optional DenseCRF refinement (:309-322).

TPU-native upgrade over the reference's frame-at-a-time sess.run: frames of
one expression are processed in fixed-size batches through one jitted
forward (pad the tail), keeping the chip fed.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def find_pivot_frames(frames_feature, num_propagate: int = 2):
    """Pivot-frame selection for mask propagation (reference test.py:150-180,
    dormant in the reference's inference loop but part of its surface).

    Given per-frame global features (mask-pooled visual features), picks the
    frame most cosine-similar to all others as the first pivot, then walks
    frames ordered by distance to it, greedily selecting pivots and marking
    a +/- num_propagate neighborhood as covered.

    Returns selected frame indices (0-based), in selection order.
    """
    feats = np.asarray(frames_feature, dtype=np.float64)
    n = feats.shape[0]
    norm = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    sim = norm @ norm.T
    first_pivot = int(np.argmax(sim.sum(axis=0)))
    order = np.argsort(sim[first_pivot])
    available = np.ones(n, dtype=bool)
    selected = []
    for fid in order:
        if available[fid]:
            selected.append(int(fid))
            lo = max(fid - num_propagate, 0)
            hi = min(fid + num_propagate + 1, n)
            available[lo:hi] = False
    return selected


def video_output_mask(pred_raw, oh: int, ow: int) -> np.ndarray:
    """Output-resolution uint8 mask with exact reference semantics
    (test.py:307-308, 322-323): the model-resolution FLOAT 0/1 mask
    (sigmoid already thresholded, or CRF argmax) is bilinearly resized to
    (oh, ow) and then uint8-TRUNCATED and scaled x255 — fractional boundary
    pixels from the interpolation fall to 0 (the mask erodes), unlike
    thresholding after the resize."""
    from cmpc_refseg_tpu.data.image import resize_and_crop
    return resize_and_crop(np.asarray(pred_raw, np.float32),
                           oh, ow).astype(np.uint8) * 255


def iter_video_expressions(meta_path: str):
    with open(meta_path) as f:
        meta = json.load(f)["videos"]
    for vid in sorted(meta.keys()):
        vdata = meta[vid]
        for eid in sorted(vdata["expressions"].keys()):
            yield vid, eid, vdata["expressions"][eid]["exp"], vdata["frames"]


def run_inference(cfg, params, model_state, *, meta_path: str, im_dir: str,
                  out_dir: str, vocab_path: str, threshold: float = 0.5,
                  use_crf: bool = False, frame_batch: int = 8,
                  half_resolution: bool = True, max_expressions=None,
                  inconsistency_report: bool = False):
    import jax
    from cmpc_refseg_tpu.data.image import IMAGE_MEAN_BGR, resize_and_pad
    from cmpc_refseg_tpu.data.text import (load_vocab_dict_from_file,
                                           preprocess_sentence_lstm)
    from cmpc_refseg_tpu.models.model import apply_model
    from cmpc_refseg_tpu.utils.save_image_worker import SaveImageWorker
    from PIL import Image

    vocab = load_vocab_dict_from_file(vocab_path)
    saver = SaveImageWorker()
    # padded inference views + device-commit once (numpy params would
    # re-transfer per batch)
    from cmpc_refseg_tpu.models.model import prepare_params
    params = prepare_params(params, cfg)
    params, model_state = jax.device_put((params, model_state))

    import jax.numpy as _jnp

    lv_lo, lv_hi = cfg.levels[0], cfg.levels[-1]

    def _area(x):
        return _jnp.sum(x.astype(_jnp.float32), axis=(1, 2, 3))

    # The consistency branch (two extra sigmoid+threshold passes over the
    # full-resolution aux heads + reductions) is only traced into the jitted
    # forward when the report is requested — the default path returns just
    # out.sigm and pays nothing for the dormant feature.
    if inconsistency_report:
        @jax.jit
        def fwd(p, s, b):
            out = apply_model(p, s, cfg, b)[0]
            # Per-frame consistency score between the two aux heads
            # (commented CMPCv5_model.py:146: iou_with_threshold(
            # sigm(score_c4), sigm(score_c5), 0.2); test_v5+.py:302-303
            # flags score < 0.3).
            a = jax.nn.sigmoid(out.up_levels[lv_lo]) > 0.2
            c = jax.nn.sigmoid(out.up_levels[lv_hi]) > 0.2
            inter = _area(a & c)
            union = _area(a) + _area(c) - inter
            return out.sigm, inter / union  # NaN when both heads are empty
    else:
        @jax.jit
        def fwd(p, s, b):
            out = apply_model(p, s, cfg, b)[0]
            return out.sigm, _jnp.zeros((b["im"].shape[0],), _jnp.float32)

    inconsistent = []
    n_expr = 0
    for vid, eid, exp, frames in iter_video_expressions(meta_path):
        if max_expressions is not None and n_expr >= max_expressions:
            break
        n_expr += 1
        tokens, seq_len = preprocess_sentence_lstm(exp, vocab, cfg.num_steps)
        tokens = np.asarray(tokens, np.int32)

        for start in range(0, len(frames), frame_batch):
            chunk = frames[start:start + frame_batch]
            ims, natives, proc_ims = [], [], []
            for frame in chunk:
                with Image.open(os.path.join(im_dir, vid,
                                             f"{frame}.jpg")) as img:
                    native = np.asarray(img.convert("RGB"))
                natives.append(native)
                im = resize_and_pad(native.astype(np.float32), cfg.H, cfg.W)
                # model-resolution RGB (uint8) — the CRF pairwise image
                # (test.py:282,318: rgbim=proc_im)
                proc_ims.append(np.clip(im, 0, 255).astype(np.uint8))
                ims.append(im[..., ::-1] - IMAGE_MEAN_BGR)
            pad = frame_batch - len(chunk)
            ims += [np.zeros_like(ims[0])] * pad
            batch = {
                "im": np.stack(ims).astype(np.float32),
                "words": np.tile(tokens[None], (frame_batch, 1)),
                "seq_len": np.full((frame_batch,), seq_len, np.int32),
            }
            sigm_b, cons_b = fwd(params, model_state, batch)
            sigm = np.asarray(sigm_b)[:, :, :, 0]
            cons = np.asarray(cons_b)
            for k, frame in enumerate(chunk):
                if (inconsistency_report and np.isfinite(cons[k])
                        and cons[k] < 0.3):
                    inconsistent.append((vid, eid, frame))
                native = natives[k]
                oh, ow = native.shape[:2]
                if half_resolution:
                    oh, ow = oh // 2, ow // 2
                # Reference semantics (test.py:307-323): threshold (or CRF)
                # at MODEL resolution first, bilinear-resize the float 0/1
                # mask to output resolution, then uint8-truncate (*255) —
                # fractional boundary pixels fall to 0.
                if use_crf:
                    from cmpc_refseg_tpu.ops.densecrf import refine_mask
                    pred_raw = refine_mask(proc_ims[k], sigm[k],
                                           0.5).astype(np.float32)
                else:
                    pred_raw = (sigm[k] >= threshold).astype(np.float32)
                mask = video_output_mask(pred_raw, oh, ow)
                saver.save_image(
                    os.path.join(out_dir, vid, eid, f"{frame}.png"), mask)
    saver.flush()
    if inconsistency_report:
        # reference filename typo preserved (test_v5+.py:354)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "inconsitent_frames.json"), "w") as f:
            json.dump([list(t) for t in inconsistent], f)
    return n_expr


def main(argv=None):
    ap = argparse.ArgumentParser("cmpc_refseg_tpu YouTube-VOS inference")
    ap.add_argument("-n", dest="model_name", default="CMPC_model")
    ap.add_argument("-meta", dest="meta", required=True)
    ap.add_argument("-im_dir", dest="im_dir", required=True)
    ap.add_argument("-out", dest="out_dir", required=True)
    ap.add_argument("-vocab", dest="vocab", required=True)
    ap.add_argument("-ckpt_dir", dest="ckpt_dir", default="./checkpoints")
    ap.add_argument("-threshold", type=float, default=0.5)
    ap.add_argument("-c", dest="use_crf", action="store_true")
    ap.add_argument("-full_res", dest="full_res", action="store_true")
    ap.add_argument("-inconsistency_report", action="store_true",
                    help="write inconsitent_frames.json (test_v5+.py:354 "
                         "surface): frames whose c4/c5 aux-head masks "
                         "disagree (IoU@0.2 < 0.3)")
    ap.add_argument("-emb", dest="emb_name", default="refvos")
    ap.add_argument("-emb_dir", dest="emb_dir", default="data")
    args = ap.parse_args(argv)

    import jax
    from cmpc_refseg_tpu.cli import load_glove
    from cmpc_refseg_tpu.config import get_config
    from cmpc_refseg_tpu.train.checkpoint import restore_checkpoint
    from cmpc_refseg_tpu.train.trainer import state_params
    from cmpc_refseg_tpu.train.trainer import create_train_state

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = get_config(args.model_name, batch_size=8,
                     compute_dtype="bfloat16" if on_tpu else "float32")
    glove = load_glove(args.emb_dir, args.emb_name)
    state = create_train_state(jax.random.PRNGKey(0), cfg, glove)
    state = restore_checkpoint(args.ckpt_dir, state)
    params = state_params(state)
    n = run_inference(cfg, params, state.model_state, meta_path=args.meta,
                      im_dir=args.im_dir, out_dir=args.out_dir,
                      vocab_path=args.vocab, threshold=args.threshold,
                      use_crf=args.use_crf,
                      half_resolution=not args.full_res,
                      inconsistency_report=args.inconsistency_report)
    print(f"done: {n} expressions")


if __name__ == "__main__":
    main()

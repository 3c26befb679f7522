"""Scaled convergence proof: train the flagship CMPC model at the full
320x320/bs=8 geometry on a procedurally generated multi-object referring
dataset and record the held-out IoU curve.

Derisks optimizer/loss/bf16 at the real geometry (the 32x32 CPU grounding
test cannot): every image contains several colored shapes and the
expression ("the {color} {shape}") refers to exactly one — the model must
ground language, not segment saliency.  Done criterion: held-out IoU > 0.7.

Reproducible via:
  python tools/convergence_proof.py --steps 4000 --out CONVERGENCE.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLORS = {
    "red": (200, 40, 40), "green": (40, 180, 60), "blue": (40, 70, 200),
    "yellow": (220, 200, 50), "purple": (150, 60, 180),
    "cyan": (60, 190, 190),
}
SHAPES = ("circle", "square", "triangle")
VOCAB = ["<pad>", "<go>", "<eos>", "<unk>", "the"] + list(COLORS) + \
    list(SHAPES)
WORD_ID = {w: i for i, w in enumerate(VOCAB)}


def draw_shape(im, mask, shape, color, cy, cx, r, yy, xx):
    if shape == "circle":
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    elif shape == "square":
        m = np.maximum(np.abs(yy - cy), np.abs(xx - cx)) < r
    else:   # triangle (isoceles, apex up)
        m = ((yy > cy - r) & (yy < cy + r)
             & (np.abs(xx - cx) < (yy - (cy - r)) / 2))
    im[m] = color
    if mask is not None:
        mask |= m
    return m


def make_sample(rng, H=320, W=320, n_objects=(2, 4)):
    """(image uint8 RGB, target mask bool, tokens, seq_len)."""
    yy, xx = np.mgrid[:H, :W]
    # textured background
    base = rng.integers(40, 160, (3,))
    im = (base[None, None] + rng.normal(0, 18, (H, W, 3))
          ).clip(0, 255).astype(np.float64)

    combos = [(c, s) for c in COLORS for s in SHAPES]
    rng.shuffle(combos)
    n = int(rng.integers(n_objects[0], n_objects[1] + 1))
    target_mask = None
    tokens = None
    for k in range(n):
        color_name, shape = combos[k]
        r = int(rng.integers(max(6, H // 11), max(8, H // 6)))
        cy = int(rng.integers(r + 4, H - r - 4))
        cx = int(rng.integers(r + 4, W - r - 4))
        color = np.asarray(COLORS[color_name], np.float64) \
            + rng.normal(0, 8, (3,))
        m = draw_shape(im, None, shape, color.clip(0, 255), cy, cx, r,
                       yy, xx)
        if k == 0:                       # first drawn object is the target
            target_mask = m
            words = ["the", color_name, shape]
            tokens = [WORD_ID[w] for w in words]
    T = 20
    seq_len = len(tokens)
    toks = np.zeros((T,), np.int32)
    toks[:seq_len] = tokens
    return im.astype(np.uint8), target_mask, toks, seq_len


def build_pool(n, seed, H=320, W=320):
    rng = np.random.default_rng(seed)
    ims = np.zeros((n, H, W, 3), np.uint8)
    masks = np.zeros((n, H, W), bool)
    toks = np.zeros((n, 20), np.int32)
    lens = np.zeros((n,), np.int32)
    for i in range(n):
        ims[i], masks[i], toks[i], lens[i] = make_sample(rng, H, W)
    return ims, masks, toks, lens


def main(argv=None):
    ap = argparse.ArgumentParser(__doc__)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--pool", type=int, default=1500)
    ap.add_argument("--holdout", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--lr", type=float, default=2.5e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="CONVERGENCE.json")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny geometry smoke test (CPU)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from cmpc_refseg_tpu.utils.compile_cache import enable as enable_cache
    enable_cache()
    from cmpc_refseg_tpu.config import get_config
    from cmpc_refseg_tpu.data.image import IMAGE_MEAN_BGR
    from cmpc_refseg_tpu.models.model import apply_model
    from cmpc_refseg_tpu.train.trainer import (create_train_state,
                                               make_train_step, state_params)

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    geo = dict(H=64, W=64, res4_blocks=2, rnn_size=64, v_emb_dim=64,
               mlp_dim=48, glove_dim=16) if args.tiny else dict(glove_dim=50)
    cfg = get_config("CMPC_model", batch_size=args.batch_size,
                     vocab_size=len(VOCAB),
                     compute_dtype="bfloat16" if on_tpu else "float32",
                     start_lr=args.lr, lr_decay_step=args.steps, **geo)

    print(f"building {args.pool}+{args.holdout} samples ...", flush=True)
    t0 = time.time()
    H, W = cfg.H, cfg.W
    ims, masks, toks, lens = build_pool(args.pool + args.holdout, args.seed,
                                        H, W)
    print(f"  built in {time.time() - t0:.0f}s", flush=True)
    ho = slice(args.pool, None)

    def prep_im(batch_u8):
        im = batch_u8.astype(np.float32)[..., ::-1] - IMAGE_MEAN_BGR
        return im

    state = create_train_state(jax.random.PRNGKey(args.seed), cfg)
    state = jax.device_put(state)
    step_fn = make_train_step(cfg)

    @jax.jit
    def eval_fwd(params, mstate, batch):
        out, _ = apply_model(params, mstate, cfg, batch, train=False)
        return out.up[..., 0] >= 1e-9

    def holdout_iou(state):
        inter = union = 0
        n_ho = args.holdout
        bs = args.batch_size
        for s in range(0, n_ho - n_ho % bs, bs):
            idx = np.arange(args.pool + s, args.pool + s + bs)
            batch = {"im": prep_im(ims[idx]), "words": toks[idx],
                     "seq_len": lens[idx]}
            pred = np.asarray(eval_fwd(state_params(state),
                                       state.model_state, batch))
            gt = masks[idx]
            inter += np.logical_and(pred, gt).sum()
            union += np.logical_or(pred, gt).sum()
        return float(inter) / float(max(union, 1))

    rng = np.random.default_rng(args.seed + 1)
    curve = []
    t_start = time.time()
    for it in range(args.steps):
        idx = rng.integers(0, args.pool, args.batch_size)
        batch = {
            "im": prep_im(ims[idx]),
            "words": toks[idx],
            "seq_len": lens[idx],
            "target": masks[idx].astype(np.float32)[..., None],
        }
        state, metrics = step_fn(state, batch)
        if it % 100 == 0:
            print(f"step {it}: loss {float(metrics['loss_cls_all']):.1f} "
                  f"mIoU {float(metrics['train_mIoU']):.3f} "
                  f"({(time.time() - t_start):.0f}s)", flush=True)
        if (it + 1) % args.eval_every == 0 or it + 1 == args.steps:
            iou = holdout_iou(state)
            curve.append({"step": it + 1, "holdout_iou": round(iou, 4)})
            print(f"  holdout IoU @ {it + 1}: {iou:.4f}", flush=True)

    result = {
        "metric": "synthetic_grounding_holdout_iou",
        "value": curve[-1]["holdout_iou"],
        "steps": args.steps,
        "geometry": f"{cfg.H}x{cfg.W} bs={args.batch_size} "
                    f"{cfg.compute_dtype}",
        "curve": curve,
        "wall_clock_s": round(time.time() - t_start, 1),
        "passed": bool(curve[-1]["holdout_iou"] > 0.7),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "curve"}))
    return result


if __name__ == "__main__":
    main()

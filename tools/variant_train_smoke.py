"""Per-variant on-chip training smoke matrix (VERDICT r3 #7).

The reference trained several of its variants end-to-end
(/root/reference/trainval.sh:7-27, CMPC_video/train_a2d_new.sh); forward/grad
parity tests structurally cannot catch variant-specific TRAINING bugs
(BiLSTM/BERT/HSV/v6+/detection paths), so this runs a real train loop for
every registry variant and records:

- loss_first / loss_last over N steps on a fixed 4-batch synthetic pool
  (memorization: loss must decrease),
- steps/s at the smoke geometry (chained through the donated state, slope
  protocol — bench.py notes),
- finiteness of every logged metric.

Writes VARIANT_TRAIN_SMOKE.json.  The CPU-toy-scale replay of the same
configs lives in tests/test_train_smoke.py (shared batch builder below).

Usage:  python tools/variant_train_smoke.py [--steps 200] [--only NAME]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE_GEO = dict(H=160, W=160, res4_blocks=8, batch_size=8)
TOY_GEO = dict(H=32, W=32, num_steps=6, vocab_size=30, glove_dim=8,
               rnn_size=16, v_emb_dim=16, mlp_dim=12, batch_size=2,
               res4_blocks=2, bert_dim=16)


def smoke_batch(cfg, rng, pool_seed=0):
    """One synthetic train batch covering every variant's input surface
    (text encoder family, HSV, bbox head, video clip)."""
    import jax.numpy as jnp
    b, t = cfg.batch_size, cfg.num_steps
    lengths = 2 + rng.integers(0, 3, b)
    batch = {}
    if cfg.text_encoder == "bert":
        batch["words_feat"] = jnp.asarray(
            rng.standard_normal((b, t, cfg.bert_dim)) * 0.1, jnp.float32)
        mask = np.zeros((b, t), np.float32)
        for i, n in enumerate(lengths):
            mask[i, :n] = 1
        batch["sequence_mask"] = jnp.asarray(mask)
    elif cfg.text_encoder == "lstm_frontpad":
        words = np.zeros((b, t), np.int32)
        for i, n in enumerate(lengths):
            words[i, -n:] = rng.integers(3, min(30, cfg.vocab_size), n)
        batch["words"] = jnp.asarray(words)
        batch["valid_idx"] = jnp.asarray([[t - int(n)] for n in lengths],
                                         jnp.int32)
    else:
        words = np.zeros((b, t), np.int32)
        for i, n in enumerate(lengths):
            words[i, :n] = rng.integers(3, min(30, cfg.vocab_size), n)
        batch["words"] = jnp.asarray(words)
        batch["seq_len"] = jnp.asarray(lengths, jnp.int32)

    # structured target: a per-sample bright disk on a dark image, so the
    # pool is memorizable (pure-noise targets keep the loss flat)
    H, W = cfg.H, cfg.W
    yy, xx = np.mgrid[0:H, 0:W]
    ims = np.zeros((b, H, W, 3), np.float32)
    tgts = np.zeros((b, H, W, 1), np.float32)
    for i in range(b):
        cy, cx = rng.integers(H // 4, 3 * H // 4), rng.integers(W // 4,
                                                                3 * W // 4)
        r = rng.integers(H // 8, H // 4)
        disk = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        ims[i] = rng.standard_normal((H, W, 3)) * 10
        ims[i][disk] += np.asarray([80.0, 40.0, -40.0])
        tgts[i, :, :, 0] = disk
    if cfg.video:
        f16 = 16
        clip = np.repeat(ims[:, None], f16, axis=1)
        clip += rng.standard_normal(clip.shape).astype(np.float32) * 2
        batch["clip"] = jnp.asarray(clip, jnp.float32)
    else:
        batch["im"] = jnp.asarray(ims)
    batch["target"] = jnp.asarray(tgts)

    if cfg.bbox_head:
        from cmpc_refseg_tpu.data.anchors import (DEFAULT_ANCHORS,
                                                  preprocess_true_boxes)
        labels, boxes = [], []
        for i in range(b):
            box = np.asarray([[W * 0.25, H * 0.25, W * 0.75, H * 0.75]],
                             np.float32)
            l, tb = preprocess_true_boxes(box, cfg.H, DEFAULT_ANCHORS)
            labels.append(l)
            boxes.append(tb)
        batch["label_bbox"] = jnp.asarray(np.stack(labels), jnp.float32)
        batch["true_bbox"] = jnp.asarray(np.stack(boxes), jnp.float32)
    return batch


def make_variant_step(cfg, seed=0):
    """(state, step_fn) for any variant, image or video."""
    import jax
    if cfg.video:
        from cmpc_refseg_tpu.cli_video import (create_video_train_state,
                                               make_video_train_step)
        return (create_video_train_state(seed, cfg),
                make_video_train_step(cfg))
    from cmpc_refseg_tpu.train.trainer import (create_train_state,
                                               make_train_step)
    return (create_train_state(jax.random.PRNGKey(seed), cfg),
            make_train_step(cfg))


def run_variant(name, steps, geo, lr=2.5e-4):
    import jax
    from cmpc_refseg_tpu.config import get_config

    t_all = time.time()
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    over = dict(geo)
    cfg = get_config(name, compute_dtype="bfloat16" if on_tpu else "float32",
                     start_lr=lr, lr_decay_step=max(steps, 100), **over)
    rng = np.random.default_rng(7)
    pool = [smoke_batch(cfg, rng) for _ in range(4)]
    state, step_fn = make_variant_step(cfg)
    state = jax.device_put(state)

    losses = []
    t0 = time.time()
    state, m = step_fn(state, pool[0])
    losses.append(float(m["loss_cls_all"]))
    compile_s = time.time() - t0

    # warm < steps - 1 so the timing window is non-empty even for tiny
    # --steps (advisor r4: warm >= steps left t_mark unset -> TypeError)
    warm = min(max(2, steps // 10), max(steps - 2, 0))
    t_mark = time.time()
    for it in range(1, steps):
        state, m = step_fn(state, pool[it % len(pool)])
        if it == warm:
            float(state.step)            # sync before timing window
            t_mark = time.time()
        if it % 10 == 0 or it >= steps - 10:
            losses.append(float(m["loss_cls_all"]))
    float(state.step)                    # host sync
    dt = (time.time() - t_mark) / max(steps - 1 - warm, 1)

    first = float(np.mean(losses[:3]))
    last = float(np.mean(losses[-3:]))
    return {
        "variant": name,
        "steps": steps,
        "geometry": f"{cfg.H}x{cfg.W}/res4_{cfg.res4_blocks}/bs{cfg.batch_size}",
        "compile_s": round(compile_s, 1),
        "steps_per_sec": round(1.0 / dt, 2),
        "loss_first": round(first, 3),
        "loss_last": round(last, 3),
        "decreased": bool(last < first),
        "finite": bool(np.all(np.isfinite(losses))),
        "total_s": round(time.time() - t_all, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated variant subset")
    ap.add_argument("--out", type=str, default="VARIANT_TRAIN_SMOKE.json")
    args = ap.parse_args(argv)

    from cmpc_refseg_tpu.utils.compile_cache import enable as enable_cache
    enable_cache()
    from cmpc_refseg_tpu.config import VARIANTS

    names = list(VARIANTS) if not args.only else args.only.split(",")
    results = []
    for name in names:
        print(f"[smoke] {name} ...", flush=True)
        try:
            r = run_variant(name, args.steps, SMOKE_GEO)
        except Exception as e:          # record, keep going
            r = {"variant": name, "error": str(e)[:200]}
        print(f"  {r}", flush=True)
        results.append(r)
        with open(args.out, "w") as f:
            json.dump({"geometry": SMOKE_GEO, "steps": args.steps,
                       "results": results}, f, indent=1)
    bad = [r["variant"] for r in results
           if r.get("error") or not r.get("decreased")
           or not r.get("finite")]
    print(f"[smoke] done: {len(results) - len(bad)}/{len(results)} ok"
          + (f"; FAILED: {bad}" if bad else ""))
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())

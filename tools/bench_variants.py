"""Benchmark every model variant's inference throughput on one chip.

Chained-slope protocol (see bench.py).  Writes a markdown table to stdout
and a JSON blob to --out.  Also serves as a whole-matrix compile smoke test
on real hardware.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# repo root on sys.path (NOT via the PYTHONPATH env var, which breaks the
# axon TPU plugin registration on this image)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_variant(name: str, batch: int = 8, on_tpu: bool = True):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cmpc_refseg_tpu.config import get_config
    from cmpc_refseg_tpu.models.model import (apply_model, init_model,
                                              prepare_params)
    from cmpc_refseg_tpu.models.video import (apply_video_model,
                                              init_video_model)

    cfg = get_config(name, batch_size=batch,
                     compute_dtype="bfloat16" if on_tpu else "float32")
    rng = np.random.default_rng(0)
    if cfg.video:
        params, state = init_video_model(jax.random.PRNGKey(0), cfg)
        apply_fn = apply_video_model
        feed = {
            "clip": rng.standard_normal(
                (batch, cfg.num_frames, cfg.H, cfg.W, 3)).astype(np.float32),
        }
        im_key = "clip"
    else:
        params, state = init_model(jax.random.PRNGKey(0), cfg)
        apply_fn = apply_model
        feed = {"im": rng.standard_normal(
            (batch, cfg.H, cfg.W, 3)).astype(np.float32)}
        im_key = "im"
    params = prepare_params(params, cfg)

    T = cfg.num_steps
    if cfg.text_encoder == "bert":
        feed["words_feat"] = rng.standard_normal(
            (batch, T, cfg.bert_dim)).astype(np.float32)
        mask = np.zeros((batch, T), np.float32)
        mask[:, :4] = 1
        feed["sequence_mask"] = mask
    elif cfg.text_encoder == "lstm_frontpad" or cfg.video:
        words = np.zeros((batch, T), np.int32)
        words[:, -4:] = rng.integers(3, 30, (batch, 4))
        feed["words"] = words
        feed["valid_idx"] = np.full((batch, 1), T - 4, np.int32)
    else:
        words = np.zeros((batch, T), np.int32)
        words[:, :4] = rng.integers(3, 30, (batch, 4))
        feed["words"] = words
        feed["seq_len"] = np.full((batch,), 4, np.int32)

    params, state, feed = jax.device_put((params, state, feed))

    rest = {k: v for k, v in feed.items() if k != im_key}

    @jax.jit
    def fwd_chain(params, state, im):
        b = dict(rest)
        b[im_key] = im
        outputs, _ = apply_fn(params, state, cfg, b, train=False)
        s = jnp.concatenate([outputs.sigm] * 3, axis=-1) * 100.0
        if cfg.video:
            s = jnp.broadcast_to(s[:, None], (batch, cfg.num_frames) +
                                 s.shape[1:])
        return s

    import numpy as np2

    def run(k):
        x = feed[im_key]
        for _ in range(k):
            x = fwd_chain(params, state, x)
        np2.asarray(jnp.sum(x))

    t0 = time.perf_counter()
    run(1)
    compile_s = time.perf_counter() - t0
    k1, k2 = (5, 25) if on_tpu else (1, 2)
    t0 = time.perf_counter(); run(k1); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); run(k2); tb = time.perf_counter() - t0
    dt = (tb - ta) / (k2 - k1)
    return {"ms_per_batch": round(dt * 1000, 2),
            "items_per_sec": round(batch / dt, 1),
            "compile_s": round(compile_s, 1),
            "unit": "clips/s" if cfg.video else "masks/s"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--video-batch", type=int, default=1)
    ap.add_argument("--latency", action="store_true",
                    help="bs=1 latency mode (the reference's actual "
                         "operating regime, trainval_model.py:349 / "
                         "test.py:286-296): reports ms/mask per variant")
    ap.add_argument("--modes", default="auto",
                    help="comma list of CMPC_FUSED dispatch modes to A/B "
                         "per variant (auto,on,off); best is recorded")
    ap.add_argument("--only", default=None,
                    help="comma list of variant names (default: all)")
    args = ap.parse_args()

    import jax

    from cmpc_refseg_tpu.config import VARIANTS, get_config
    from cmpc_refseg_tpu.utils.compile_cache import enable
    enable()
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    modes = args.modes.split(",")
    names = args.only.split(",") if args.only else list(VARIANTS)

    results = {}
    for name in names:
        if args.latency:
            batch = 1
        else:
            batch = (args.video_batch if get_config(name).video
                     else args.batch)
        try:
            per_mode = {}
            for mode in modes:
                os.environ["CMPC_FUSED"] = mode
                per_mode[mode] = bench_variant(name, batch, on_tpu)
            os.environ.pop("CMPC_FUSED", None)
            best_mode = min(per_mode, key=lambda m:
                            per_mode[m]["ms_per_batch"])
            r = dict(per_mode[best_mode])
            if len(modes) > 1:
                r["dispatch"] = best_mode
                r["per_mode_ms"] = {m: per_mode[m]["ms_per_batch"]
                                    for m in per_mode}
            if args.latency:
                r["ms_per_item"] = round(r["ms_per_batch"] / batch, 2)
            results[name] = r
            extra = (f" [{best_mode}]" if len(modes) > 1 else "")
            print(f"| {name} | {r['ms_per_batch']} ms | "
                  f"{r['items_per_sec']} {r['unit']} |{extra}", flush=True)
        except Exception as e:
            results[name] = {"error": str(e)[:160]}
            print(f"| {name} | ERROR {str(e)[:80]} |", flush=True)
        if args.out:   # incremental dump — timeouts keep partial results
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    errs = [n for n, r in results.items() if "error" in r]
    if errs:
        print(f"FAILED variants: {errs}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()

"""Operating-point sweep + interleaved variant A/B (VERDICT r4 #5/#7).

Part A: flagship inference throughput at several batch sizes in ONE
session — validates (or raises) the bs=8 headline operating point.

Part B: interleaved same-session A/B between two variants (default
CMPC_model vs CMPC_model_origin) at bs=8 — alternating reps so tunnel/chip
drift hits both arms equally; settles the 512-vs-542 two-session ambiguity.

Chained-slope protocol throughout (bench.py notes); medians of --reps.

Usage: python tools/bench_sweep.py [--batches 8,16,32] [--reps 3]
                                   [--ab CMPC_model,CMPC_model_origin]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_forward(name, batch, on_tpu):
    import jax
    import jax.numpy as jnp
    from cmpc_refseg_tpu.config import get_config
    from cmpc_refseg_tpu.models.model import (apply_model, init_model,
                                              prepare_params)
    cfg = get_config(name, batch_size=batch,
                     compute_dtype="bfloat16" if on_tpu else "float32")
    rng = np.random.default_rng(0)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    params = prepare_params(params, cfg)
    words = np.zeros((batch, cfg.num_steps), np.int32)
    words[:, :4] = rng.integers(3, 30, (batch, 4))
    feed = {"words": words, "seq_len": np.full((batch,), 4, np.int32)}
    im0 = rng.standard_normal((batch, cfg.H, cfg.W, 3)).astype(np.float32)
    params, state, feed, im0 = jax.device_put((params, state, feed, im0))

    @jax.jit
    def fwd(params, state, im):
        out, _ = apply_model(params, state, cfg,
                             {"im": im, **feed}, train=False)
        return jnp.concatenate([out.sigm] * 3, -1) * 100.0

    def run(k):
        x = im0
        for _ in range(k):
            x = fwd(params, state, x)
        np.asarray(jnp.sum(x))
    return run


def slope_ms(run, k1, k2):
    t0 = time.perf_counter(); run(k1); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); run(k2); tb = time.perf_counter() - t0
    return (tb - ta) / (k2 - k1) * 1e3


def main(argv=None):
    ap = argparse.ArgumentParser(__doc__)
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ab", default="CMPC_model,CMPC_model_origin")
    ap.add_argument("--ab-reps", type=int, default=5)
    ap.add_argument("--skip-sweep", action="store_true")
    ap.add_argument("--skip-ab", action="store_true")
    ap.add_argument("--out", default="SWEEP_r5.json")
    args = ap.parse_args(argv)

    import jax
    from cmpc_refseg_tpu.utils.compile_cache import enable
    enable()
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    k1, k2 = (10, 50) if on_tpu else (1, 2)
    result = {"platform": "tpu" if on_tpu else "cpu"}

    if not args.skip_sweep:
        sweep = {}
        for b in (int(x) for x in args.batches.split(",")):
            run = build_forward("CMPC_model", b, on_tpu)
            run(1)                         # compile
            ms = float(np.median([slope_ms(run, k1, k2)
                                  for _ in range(args.reps)]))
            sweep[b] = {"ms_per_batch": round(ms, 2),
                        "masks_per_s": round(b / ms * 1e3, 1)}
            print(f"bs={b}: {ms:.2f} ms/batch = {b / ms * 1e3:.1f} masks/s",
                  flush=True)
        result["batch_sweep"] = sweep

    if not args.skip_ab:
        a, b = args.ab.split(",")
        runs = {a: build_forward(a, 8, on_tpu), b: build_forward(b, 8, on_tpu)}
        for r in runs.values():
            r(1)                           # compile both BEFORE timing
        times = {a: [], b: []}
        for rep in range(args.ab_reps):    # interleaved: A B A B ...
            for name in (a, b):
                times[name].append(slope_ms(runs[name], k1, k2))
        result["interleaved_ab"] = {
            name: {"ms_median": round(float(np.median(ts)), 2),
                   "masks_per_s": round(8 / np.median(ts) * 1e3, 1),
                   "ms_all": [round(t, 2) for t in ts]}
            for name, ts in times.items()}
        print(json.dumps(result["interleaved_ab"]), flush=True)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"written": args.out}))
    return result


if __name__ == "__main__":
    main()

"""Per-call dispatch overhead A/B on the serving path (VERDICT r4 #8).

The video headline is protocol-dependent: chained-slope (outputs fed back)
measures ~9% faster than the historical unchained single-feed protocol.
The difference is per-call HOST dispatch cost (python jit-call argument
processing + tunnel enqueue) that chaining lets the host run ahead of.  A
non-chained serving caller pays it — unless a cheaper calling convention
recovers the gap.

Modes measured here, all with the differenced-iteration-count protocol
(two loop lengths, hard host sync via np.asarray at the end — NOT
block_until_ready, which does not fence on this platform):

- chained:       x_{i+1} = f(x_i)            (the bench.py headline protocol)
- unchained:     y = f(x0) in a loop          (python jit dispatch per call)
- unchained_aot: y = compiled(x0) in a loop   (jit(f).lower().compile() —
                 skips per-call tracing-cache lookup and pytree work)

Usage: python tools/bench_dispatch.py [--variant CMPC_video_mm_tgraph_allvec]
                                      [--batch 1] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(variant, batch, on_tpu):
    import jax
    import jax.numpy as jnp
    from cmpc_refseg_tpu.config import get_config
    from cmpc_refseg_tpu.models.model import (apply_model, init_model,
                                              prepare_params)
    from cmpc_refseg_tpu.models.video import (apply_video_model,
                                              init_video_model)

    cfg = get_config(variant, batch_size=batch,
                     compute_dtype="bfloat16" if on_tpu else "float32")
    rng = np.random.default_rng(0)
    if cfg.video:
        params, state = init_video_model(jax.random.PRNGKey(0), cfg)
        apply_fn = apply_video_model
        feed = {"clip": rng.standard_normal(
            (batch, cfg.num_frames, cfg.H, cfg.W, 3)).astype(np.float32)}
        im_key = "clip"
    else:
        params, state = init_model(jax.random.PRNGKey(0), cfg)
        apply_fn = apply_model
        feed = {"im": rng.standard_normal(
            (batch, cfg.H, cfg.W, 3)).astype(np.float32)}
        im_key = "im"
    params = prepare_params(params, cfg)
    T = cfg.num_steps
    if cfg.text_encoder == "lstm_frontpad" or cfg.video:
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

    def fwd(params, state, im):
        b = dict(rest)
        b[im_key] = im
        outputs, _ = apply_fn(params, state, cfg, b, train=False)
        s = jnp.concatenate([outputs.sigm] * 3, axis=-1) * 100.0
        if cfg.video:
            s = jnp.broadcast_to(s[:, None], (batch, cfg.num_frames)
                                 + s.shape[1:])
        return s
    return cfg, params, state, feed[im_key], fwd


def slope(run, k1, k2):
    t0 = time.perf_counter(); run(k1); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); run(k2); tb = time.perf_counter() - t0
    return (tb - ta) / (k2 - k1)


def main(argv=None):
    ap = argparse.ArgumentParser(__doc__)
    ap.add_argument("--variant", default="CMPC_video_mm_tgraph_allvec")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from cmpc_refseg_tpu.utils.compile_cache import enable
    enable()
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg, params, state, x0, fwd = build(args.variant, args.batch, on_tpu)

    jfwd = jax.jit(fwd)
    compiled = jfwd.lower(params, state, x0).compile()

    def sync(y):
        np.asarray(jnp.sum(y))

    def run_chained(k):
        x = x0
        for _ in range(k):
            x = jfwd(params, state, x)
        sync(x)

    def run_unchained(k):
        for _ in range(k):
            y = jfwd(params, state, x0)
        sync(y)

    def run_aot(k):
        for _ in range(k):
            y = compiled(params, state, x0)
        sync(y)

    # warm both paths (compile + cache)
    sync(jfwd(params, state, x0))
    sync(compiled(params, state, x0))
    k1, k2 = (10, 50) if on_tpu else (1, 3)
    out = {"variant": args.variant, "batch": args.batch,
           "platform": "tpu" if on_tpu else "cpu", "reps": args.reps}
    for name, run in (("chained", run_chained), ("unchained", run_unchained),
                      ("unchained_aot", run_aot)):
        ms = [slope(run, k1, k2) * 1e3 for _ in range(args.reps)]
        out[name + "_ms"] = round(float(np.median(ms)), 3)
        out[name + "_spread_ms"] = [round(m, 3) for m in ms]
    base = out["chained_ms"]
    out["unchained_overhead_ms"] = round(out["unchained_ms"] - base, 3)
    out["aot_overhead_ms"] = round(out["unchained_aot_ms"] - base, 3)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

"""Interleaved same-process A/B of train-step optimizer/gradient modes.

profile_blocks runs one mode per process; with session drift up to ~1 ms
between processes (PERF.md caveats), sub-ms deltas between modes cannot be
resolved that way.  Here every arm is built in ONE process (make_train_step
reads CMPC_ADAM / CMPC_GRAD_PACK_SEGMENTS at build time, so the env is set
per-arm before building) and slope reps alternate across arms so tunnel
drift hits all arms equally — the same protocol that settled the
origin-vs-flagship ambiguity (bench_sweep.py).

Arms (default): tree+optax (r4 default), tree+fused Adam, packed-G48+fused.

Usage: python tools/bench_train_modes.py [--reps 5] [--out TRAIN_MODES_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = {
    "tree_optax": {"grad_mode": "tree", "CMPC_ADAM": "optax"},
    "tree_fused": {"grad_mode": "tree", "CMPC_ADAM": "fused"},
    "packed48_fused": {"grad_mode": "packed", "CMPC_ADAM": "fused",
                       "CMPC_GRAD_PACK_SEGMENTS": "48"},
}


def main(argv=None):
    ap = argparse.ArgumentParser(__doc__)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--arms", default=",".join(ARMS))
    ap.add_argument("--out", default="TRAIN_MODES_r5.json")
    args = ap.parse_args(argv)

    import jax
    from cmpc_refseg_tpu.utils.compile_cache import enable
    enable()
    from cmpc_refseg_tpu.config import get_config
    from cmpc_refseg_tpu.train.trainer import (create_train_state,
                                               make_train_step)
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    batch = 8 if on_tpu else 1
    cfg = get_config("CMPC_model", batch_size=batch,
                     compute_dtype="bfloat16" if on_tpu else "float32")
    rng = np.random.default_rng(0)
    words = np.zeros((batch, cfg.num_steps), np.int32)
    words[:, :4] = rng.integers(3, 30, (batch, 4))
    tb = jax.device_put({
        "im": rng.standard_normal((batch, cfg.H, cfg.W, 3)
                                  ).astype(np.float32),
        "words": words,
        "seq_len": np.full((batch,), 4, np.int32),
        "target": (rng.random((batch, cfg.H, cfg.W, 1)) > 0.7
                   ).astype(np.float32),
    })

    arms = {}
    for name in args.arms.split(","):
        spec = ARMS[name]
        for k in ("CMPC_ADAM", "CMPC_GRAD_PACK_SEGMENTS"):
            if k in spec:
                os.environ[k] = spec[k]
            else:
                os.environ.pop(k, None)
        step = make_train_step(cfg, grad_mode=spec["grad_mode"])
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        state = jax.device_put(state)
        t0 = time.perf_counter()
        state, _ = step(state, tb)       # compile (donates; chain forward)
        float(state.step)
        print(f"{name}: compile {time.perf_counter() - t0:.1f}s",
              flush=True)
        arms[name] = {"step": step, "state": state, "ms": []}

    k1, k2 = (5, 30) if on_tpu else (1, 2)
    for rep in range(args.reps):
        for name, arm in arms.items():   # interleave: A B C A B C ...
            ts = []
            for k in (k1, k2):
                st = arm["state"]
                t0 = time.perf_counter()
                for _ in range(k):
                    st = arm["step"](st, tb)[0]
                float(st.step)
                ts.append(time.perf_counter() - t0)
                arm["state"] = st
            arm["ms"].append((ts[1] - ts[0]) / (k2 - k1) * 1e3)

    out = {"platform": "tpu" if on_tpu else "cpu", "batch": batch}
    for name, arm in arms.items():
        med = float(np.median(arm["ms"]))
        out[name] = {"ms_median": round(med, 2),
                     "steps_per_sec": round(1e3 / med, 2),
                     "ms_all": [round(t, 2) for t in arm["ms"]]}
        print(f"{name}: {med:.2f} ms median "
              f"({1e3 / med:.2f} steps/s) {out[name]['ms_all']}", flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": args.out}))
    return out


if __name__ == "__main__":
    main()

"""Fused-mutan-backward A/B (VERDICT r3 #1, second criterion).

The shipped bf16 training path saves a bf16 residual in the fused mutan
backward and matches the exact XLA vjp only to ~±5% per-gradient tolerance
(ops/pallas_kernels.py::_mutan_fwd_with_residual).  This runs the SAME
synthetic training problem twice at full geometry — fused backward on
(production default) vs CMPC_MUTAN_FUSED_BWD=off (exact XLA vjp) — and
asserts the loss curves track within a point-wise band, recording both
curves in CONVERGENCE_AB.json.

Usage: python tools/convergence_ab.py [--steps 300]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(tag, steps, batch_size, seed, fused_bwd):
    if fused_bwd:
        os.environ.pop("CMPC_MUTAN_FUSED_BWD", None)
    else:
        os.environ["CMPC_MUTAN_FUSED_BWD"] = "off"
    import jax
    from cmpc_refseg_tpu.config import get_config
    from cmpc_refseg_tpu.data.image import IMAGE_MEAN_BGR
    from cmpc_refseg_tpu.train.trainer import (create_train_state,
                                               make_train_step)
    from convergence_proof import VOCAB, build_pool

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = get_config("CMPC_model", batch_size=batch_size,
                     vocab_size=len(VOCAB),
                     compute_dtype="bfloat16" if on_tpu else "float32",
                     lr_decay_step=steps)
    ims, masks, toks, lens = build_pool(256, seed, cfg.H, cfg.W)
    state = jax.device_put(create_train_state(jax.random.PRNGKey(seed), cfg))
    # make_train_step traces lazily at the first call, so the env var set
    # above governs which backward this arm compiles
    step_fn = make_train_step(cfg)
    rng = np.random.default_rng(seed + 1)
    losses = []
    t0 = time.time()
    for it in range(steps):
        idx = rng.integers(0, 256, batch_size)
        batch = {
            "im": ims[idx].astype(np.float32)[..., ::-1] - IMAGE_MEAN_BGR,
            "words": toks[idx], "seq_len": lens[idx],
            "target": masks[idx].astype(np.float32)[..., None],
        }
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss_cls_all"]))
    print(f"[{tag}] {steps} steps in {time.time() - t0:.0f}s, "
          f"loss {losses[0]:.1f} -> {np.mean(losses[-20:]):.2f}", flush=True)
    return losses


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="CONVERGENCE_AB.json")
    args = ap.parse_args(argv)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from cmpc_refseg_tpu.utils.compile_cache import enable
    enable()

    fused = run_arm("fused bf16-residual bwd", args.steps, args.batch_size,
                    args.seed, fused_bwd=True)
    exact = run_arm("exact XLA vjp bwd", args.steps, args.batch_size,
                    args.seed, fused_bwd=False)

    f = np.asarray(fused)
    e = np.asarray(exact)
    # identical data/init/schedule: curves must track.  Compare smoothed
    # curves (20-step window) point-wise, relative to the curve's range.
    k = 20
    sm_f = np.convolve(f, np.ones(k) / k, mode="valid")
    sm_e = np.convolve(e, np.ones(k) / k, mode="valid")
    scale = max(sm_e.max() - sm_e.min(), 1e-6)
    rel = np.abs(sm_f - sm_e) / scale
    result = {
        "steps": args.steps,
        "fused_final_ma20": round(float(sm_f[-1]), 3),
        "exact_final_ma20": round(float(sm_e[-1]), 3),
        "max_rel_curve_gap": round(float(rel.max()), 4),
        "final_rel_gap": round(float(rel[-1]), 4),
        "fused_losses": [round(x, 3) for x in fused],
        "exact_losses": [round(x, 3) for x in exact],
    }
    with open(args.out, "w") as fo:
        json.dump(result, fo, indent=1)
    ok = rel.max() < 0.15 and rel[-1] < 0.08
    print(json.dumps({k: v for k, v in result.items()
                      if "losses" not in k}) + f"  ok={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

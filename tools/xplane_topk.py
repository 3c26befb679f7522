"""Top-k device-kernel breakdown from a jax.profiler xplane trace.

Captures N iterations of a chosen program (forward / train / video) on the
chip, parses the XPlane proto (tensorflow.tsl.profiler.protobuf) and prints
per-kernel total/avg durations on the TPU device plane — the ground truth
the block-level slope timings (tools/profile_blocks.py) approximate.

Usage:
  python tools/xplane_topk.py [--program forward|train] [--iters 12]
                              [--topk 25] [--variant CMPC_model]
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(path, device_only=True):
    """-> list of (plane_name, event_name, total_ps, count)."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    rows = []
    for plane in space.planes:
        if device_only and "TPU" not in plane.name \
                and "/device" not in plane.name:
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        agg = defaultdict(lambda: [0, 0])
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[name][0] += ev.duration_ps
                agg[name][1] += 1
        for name, (tot, cnt) in agg.items():
            rows.append((plane.name, name, tot, cnt))
    return rows


def capture(program, variant, iters, batch):
    import jax
    import jax.numpy as jnp
    from cmpc_refseg_tpu.utils.compile_cache import enable
    enable()
    from cmpc_refseg_tpu.config import get_config
    from cmpc_refseg_tpu.models.model import (apply_model, init_model,
                                              prepare_params)

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = get_config(variant, batch_size=batch,
                     compute_dtype="bfloat16" if on_tpu else "float32")
    rng = np.random.default_rng(0)
    words = np.zeros((batch, cfg.num_steps), np.int32)
    words[:, :4] = rng.integers(3, 30, (batch, 4))
    feed = {
        "im": rng.standard_normal((batch, cfg.H, cfg.W, 3)
                                  ).astype(np.float32),
        "words": words,
        "seq_len": np.full((batch,), 4, np.int32),
    }
    logdir = "/tmp/xplane_topk"
    os.system(f"rm -rf {logdir}")

    if program == "forward":
        params, state = init_model(jax.random.PRNGKey(0), cfg)
        params = jax.device_put(prepare_params(params, cfg))
        state, feed = jax.device_put((state, feed))

        @jax.jit
        def fwd(p, s, im, w, sl):
            out, _ = apply_model(p, s, cfg,
                                 {"im": im, "words": w, "seq_len": sl},
                                 train=False)
            return jnp.concatenate([out.sigm] * 3, -1) * 100.0

        x = fwd(params, state, feed["im"], feed["words"], feed["seq_len"])
        np.asarray(jnp.sum(x))
        jax.profiler.start_trace(logdir)
        for _ in range(iters):
            x = fwd(params, state, x, feed["words"], feed["seq_len"])
        np.asarray(jnp.sum(x))
        jax.profiler.stop_trace()
    elif program == "train":
        from cmpc_refseg_tpu.train.trainer import (create_train_state,
                                                   make_train_step)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        step = make_train_step(cfg)
        feed["target"] = (rng.random((batch, cfg.H, cfg.W, 1)) > 0.7
                          ).astype(np.float32)
        state, feed = jax.device_put((state, feed))
        state, _ = step(state, feed)
        float(state.step)
        jax.profiler.start_trace(logdir)
        for _ in range(iters):
            state, _ = step(state, feed)
        float(state.step)
        jax.profiler.stop_trace()
    else:
        raise SystemExit(f"unknown program {program}")
    pbs = glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb")
    if not pbs:
        raise SystemExit(f"no xplane under {logdir}")
    return pbs[0]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--program", default="forward",
                    choices=["forward", "train"])
    ap.add_argument("--variant", default="CMPC_model")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--topk", type=int, default=25)
    ap.add_argument("--xplane", default=None,
                    help="parse an existing .xplane.pb instead of capturing")
    args = ap.parse_args(argv)

    path = args.xplane or capture(args.program, args.variant, args.iters,
                                  args.batch)
    rows = parse_xplane(path)
    per_iter = defaultdict(float)
    counts = {}
    total = 0.0
    for plane, name, tot, cnt in rows:
        ms = tot / 1e9 / args.iters
        per_iter[name] += ms
        counts[name] = cnt
        total += ms
    print(f"xplane: {path}")
    print(f"{'ms/iter':>9}  {'calls/iter':>10}  kernel")
    for name, ms in sorted(per_iter.items(), key=lambda kv: -kv[1]
                           )[:args.topk]:
        print(f"{ms:9.3f}  {counts[name] / args.iters:10.1f}  {name[:90]}")
    print(f"{total:9.3f}  total device time accounted")


if __name__ == "__main__":
    main()

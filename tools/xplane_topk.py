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


def attributed_breakdown(path, iters, boundaries=(15.4, 39.3)):
    """Sync-op breakdown of a train-step trace, attributed to source lines.

    Uses only the device plane's 'XLA Ops' line (the synchronous critical
    path; 'Async XLA Ops' — cross-program weight prefetches — overlap and
    are excluded), buckets each op by its time position within its 'Steps'
    event (fwd < boundaries[0] ms, bwd < boundaries[1], opt after), and
    aggregates per op-metadata `source` file:line stat.

    Returns (bucket_totals, rows) where rows = [(bucket, source, ms/iter)].
    The fwd/bwd boundaries come from tools/profile_blocks.py block timings
    (fwd-only and fwd+bwd chain slopes)."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    plane = next(p for p in space.planes
                 if "TPU" in p.name or "/device" in p.name)
    sm = {k: v.name for k, v in plane.stat_metadata.items()}
    lines = {l.name: l for l in plane.lines}
    steps = sorted((ev.offset_ps, ev.duration_ps)
                   for ev in lines["Steps"].events)

    def step_pos(off):
        for s0, d in steps:
            if s0 <= off < s0 + d:
                return (off - s0) / 1e9
        return None

    def source_of(md):
        for st in md.stats:
            if sm.get(st.metadata_id) == "source":
                return st.str_value or st.ref_value
        return "?"

    bucket_tot = defaultdict(float)
    by_src = defaultdict(float)
    for ev in lines["XLA Ops"].events:
        pos = step_pos(ev.offset_ps)
        if pos is None:
            continue
        ms = ev.duration_ps / 1e9 / iters
        b = ("fwd" if pos < boundaries[0]
             else "bwd" if pos < boundaries[1] else "opt")
        bucket_tot[b] += ms
        by_src[(b, str(source_of(plane.event_metadata[ev.metadata_id])))] \
            += ms
    rows = sorted(((b, s, ms) for (b, s), ms in by_src.items()),
                  key=lambda r: -r[2])
    return dict(bucket_tot), rows


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
    ap.add_argument("--by-source", action="store_true",
                    help="attributed breakdown: sync ops only, bucketed "
                         "fwd/bwd/opt by step position, grouped by source "
                         "file:line (train-step analysis mode)")
    ap.add_argument("--boundaries", default="15.4,39.3",
                    help="fwd-end,bwd-end ms for --by-source bucketing "
                         "(from profile_blocks fwd / fwd+bwd slopes)")
    args = ap.parse_args(argv)

    path = args.xplane or capture(args.program, args.variant, args.iters,
                                  args.batch)
    if args.by_source:
        bounds = tuple(float(x) for x in args.boundaries.split(","))
        totals, rows = attributed_breakdown(path, args.iters, bounds)
        print(f"xplane: {path}")
        print("bucket totals (ms/iter):",
              {k: round(v, 2) for k, v in totals.items()})
        print(f"{'ms/iter':>9}  bucket  source")
        for b, src, ms in rows[:args.topk]:
            print(f"{ms:9.3f}  {b:6s}  {src[:84]}")
        return
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

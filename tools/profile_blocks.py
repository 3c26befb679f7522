"""Per-block timing of the flagship forward on real hardware.

The chained-slope protocol (see bench.py; `jax.block_until_ready` is not a
reliable fence on the tunneled platform): each block is wrapped in a jitted
chain step that feeds its output back as its input, two different chain
lengths are timed with one hard host sync each, and the slope is the
per-iteration device time — enqueue overhead and tunnel latency cancel.

Produces the breakdown that drives kernel work (round-2 numbers, v5e-1,
bs=8 bf16: backbone 6.7 ms, lang2vis 3x~1.5 ms, exchange loop 0.90 ms,
ConvLSTM ~1.3 ms fused, language 0.28 ms, heads+upsample 0.57 ms).

  python tools/profile_blocks.py [--blocks backbone,exchange,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, x0, iters=(5, 30)):
    import jax
    import jax.numpy as jnp
    t0 = time.perf_counter()
    x = fn(x0)
    np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))
    compile_s = time.perf_counter() - t0
    ts = []
    for k in iters:
        y = x0
        t0 = time.perf_counter()
        for _ in range(k):
            y = fn(y)
        np.asarray(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (iters[1] - iters[0]), compile_s


def main(argv=None):
    ap = argparse.ArgumentParser(__doc__)
    ap.add_argument("--blocks", default="full,backbone,language,lang2vis,"
                                        "exchange,convlstm,heads")
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args(argv)
    want = set(args.blocks.split(","))

    import jax
    import jax.numpy as jnp
    from cmpc_refseg_tpu.utils.compile_cache import enable
    enable()
    from cmpc_refseg_tpu.config import get_config
    from cmpc_refseg_tpu.models import cmpc
    from cmpc_refseg_tpu.models.backbone import apply_backbone
    from cmpc_refseg_tpu.models.language import encode_text
    from cmpc_refseg_tpu.models.model import (apply_model, init_model,
                                              prepare_params)
    from cmpc_refseg_tpu.ops.layers import conv2d
    from cmpc_refseg_tpu.ops.resize import resize_bilinear

    B = args.batch_size
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = get_config("CMPC_model", batch_size=B,
                     compute_dtype="bfloat16" if on_tpu else "float32")
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    params = prepare_params(params, cfg)
    params, state = jax.device_put((params, state))
    rng = np.random.default_rng(0)
    C, L = cfg.mlp_dim, cfg.rnn_size
    h8, w8 = cfg.vf_h, cfg.vf_w

    words = np.zeros((B, cfg.num_steps), np.int32)
    words[:, :4] = 5
    feed = {"words": jnp.asarray(words),
            "seq_len": jnp.full((B,), 4, jnp.int32)}
    im0 = jax.device_put(
        rng.standard_normal((B, cfg.H, cfg.W, 3)).astype(np.float32))
    feats = {lv: jax.device_put(rng.standard_normal(
        (B, h8, w8, C)).astype(np.float32).astype(dt))
        for lv in cfg.levels}
    lang = jax.device_put(
        rng.standard_normal((B, 1, 1, L)).astype(np.float32))
    fs = params["fusion_stack"]

    def report(name, fn, x0):
        dt_s, comp = chain_time(fn, x0)
        print(f"{name:24s} {dt_s * 1e3:7.2f} ms   (compile {comp:.1f}s)",
              flush=True)

    # NOTE: params must be ARGUMENTS of the jitted fns, not closures — the
    # tunneled platform ships closed-over constants inside the HLO upload
    # (HTTP 413 on the full model; CLAUDE.md gotcha).
    if "full" in want:
        @jax.jit
        def full_(p_, s_, x):
            out, _ = apply_model(p_, s_, cfg, {"im": x, **feed},
                                 train=False)
            return jnp.concatenate([out.sigm] * 3, -1) * 100.0
        report("full forward", lambda x: full_(params, state, x), im0)

    if "backbone" in want:
        @jax.jit
        def bb_(pbb, x):
            outs = apply_backbone(pbb, x, taps=tuple(cfg.levels),
                                  compute_dtype=dt)
            y = jnp.mean(outs[cfg.levels[-1]].astype(jnp.float32), -1,
                         keepdims=True)
            y = jax.image.resize(y, (B, cfg.H, cfg.W, 1), "nearest")
            return y * jnp.ones((1, 1, 1, 3))
        report("backbone (+chain glue)",
               lambda x: bb_(params["backbone"], x), im0)

    if "language" in want:
        @jax.jit
        def lang_fn(x):
            tf_ = encode_text(params["text"], cfg, words=feed["words"],
                              seq_len=feed["seq_len"])
            return tf_.lang_feat + x * 1e-9
        report("language encoder", lang_fn, lang)

    if "lang2vis" in want:
        vis = jax.device_put(rng.standard_normal(
            (B, h8, w8, cfg.v_emb_dim)).astype(np.float32).astype(dt))
        wf = jax.device_put(rng.standard_normal(
            (B, 1, cfg.num_steps, L)).astype(np.float32))
        wp = jax.device_put(np.abs(rng.standard_normal(
            (B, 1, cfg.num_steps, cfg.parse_classes))).astype(np.float32))
        sm = jax.device_put(
            np.ones((B, 1, cfg.num_steps, 1), np.float32))
        sp = jax.device_put(np.broadcast_to(rng.standard_normal(
            (1, h8, w8, cfg.spatial_dim)).astype(np.float32),
            (B, h8, w8, cfg.spatial_dim)).copy())
        lp = params["levels"][cfg.levels[-1]]

        @jax.jit
        def l2v(x):
            fusion, _ = cmpc.apply_lang2vis(lp, cfg, x, wf, wp, sm, sp)
            return jnp.concatenate([fusion, fusion], -1)
        report("lang2vis (one level)", l2v, vis)

    def rounds(f):
        cur = dict(f)
        for rnd in ("", "_2"):
            nxt = {}
            for lv in cfg.levels:
                others = [cur[o] for o in cfg.levels if o != lv]
                ex = cmpc.apply_exchange(fs["exchange"][f"{lv}{rnd}"], cfg,
                                         cur[lv], others, lang)
                nxt[lv] = cmpc.l2_normalize(ex, -1)
            cur = nxt
        return cur

    if "exchange" in want:
        @jax.jit
        def ex_fn(f):
            return rounds(f)
        report("exchange rounds x2", ex_fn, feats)

    if "convlstm" in want:
        @jax.jit
        def cl_fn(f):
            x0 = f[cfg.levels[0]]
            c = jnp.zeros_like(x0)
            h = jnp.zeros_like(x0)
            for lv in cfg.levels:
                c, h = cmpc.convlstm_step_opt(fs["convlstm"], f[lv], c, h)
            return {lv: h for lv in cfg.levels}
        report("convlstm x3 (dispatch)", cl_fn, feats)

    if "train" in want:
        # Train-step breakdown (VERDICT round-3: the backward path had zero
        # optimization work in round 2).  Chained through TrainState /
        # through the image with a tiny loss feedback term.
        from cmpc_refseg_tpu.train.optimizer import make_optimizer
        from cmpc_refseg_tpu.train.trainer import (create_train_state,
                                                   make_train_step,
                                                   trainable_tree)
        tstate = create_train_state(jax.random.PRNGKey(0), cfg)
        step_fn = make_train_step(cfg)
        tb = {
            "im": im0,
            "words": feed["words"],
            "seq_len": feed["seq_len"],
            "target": jax.device_put(
                (rng.random((B, cfg.H, cfg.W, 1)) > 0.7
                 ).astype(np.float32)),
        }
        tstate = jax.device_put(tstate)

        from cmpc_refseg_tpu.models.model import compute_loss
        from cmpc_refseg_tpu.train.optimizer import merge_params

        def loss_of(trainable, frozen, mstate, im):
            p = merge_params(trainable, frozen)
            out, _ = apply_model(p, mstate, cfg, {**tb, "im": im},
                                 train=True)
            total, _ = compute_loss(out, tb["target"], cfg, p)
            return total

        @jax.jit
        def fwd_only(tr, fr, ms, x):
            return x + (loss_of(tr, fr, ms, x) * 1e-20).astype(x.dtype)
        tr_tree = trainable_tree(tstate)
        report("train fwd only (w/ loss)",
               lambda x: fwd_only(tr_tree, tstate.frozen,
                                  tstate.model_state, x), im0)

        @jax.jit
        def fwd_bwd(tr, fr, ms, x):
            loss, grads = jax.value_and_grad(loss_of)(tr, fr, ms, x)
            # consume EVERY grad leaf: summing only one let XLA dead-code-
            # eliminate most of the backward (the r4 session measured 18.7
            # ms here vs ~25 implied by the full step — DCE artifact)
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree.leaves(grads))
            return x + (loss * 1e-20).astype(x.dtype) \
                + (gsum * 1e-20).astype(x.dtype)
        report("train fwd+bwd (no adam)",
               lambda x: fwd_bwd(tr_tree, tstate.frozen,
                                 tstate.model_state, x), im0)

        # optimizer update alone on zero grads — the flat-in-state
        # production path: one grad-tree concat + Adam + the parameter add
        # on a single contiguous vector (per-leaf chain measured 12.3 ms;
        # round-3's ravel-per-step layout cost another ~9-10 ms)
        opt = make_optimizer(cfg, flat=True)
        zeros = jax.tree.map(jnp.zeros_like, tr_tree)
        unravel = tstate.unravel

        @jax.jit
        def adam_only(opt_state, grads, flat_p):
            fg = unravel.ravel(grads)
            upd, new_os = opt.update(fg, opt_state, flat_p)
            s = jnp.sum(flat_p + upd)
            return jax.tree.map(
                lambda x: x + (s * 0).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, new_os)
        report("adam update only (flat)",
               lambda os_: adam_only(os_, zeros, tstate.trainable),
               tstate.opt_state)

        # full step LAST: make_train_step donates its input state, so chain
        # FORWARD through the returned state (an input state's buffers are
        # gone after the call) and sync via a host read of .step
        st = tstate
        t0 = time.perf_counter()
        st = step_fn(st, tb)[0]
        float(st.step)
        comp = time.perf_counter() - t0
        ts = []
        for k in (5, 30):
            t0 = time.perf_counter()
            for _ in range(k):
                st = step_fn(st, tb)[0]
            float(st.step)
            ts.append(time.perf_counter() - t0)
        dt_s = (ts[1] - ts[0]) / 25
        print(f"{'train step (full)':24s} {dt_s * 1e3:7.2f} ms   "
              f"(compile {comp:.1f}s)", flush=True)

    if "heads" in want:
        sc = feats[cfg.levels[0]]

        @jax.jit
        def heads(x):
            ups = []
            for lv in cfg.levels:
                s = conv2d(params["scores"][f"score_{lv}"], x)
                ups.append(resize_bilinear(s.astype(jnp.float32),
                                           cfg.H, cfg.W))
            s = conv2d(params["scores"]["score"], x)
            ups.append(resize_bilinear(s.astype(jnp.float32), cfg.H, cfg.W))
            m = sum(u.sum() for u in ups)
            return x + (m * 1e-20).astype(x.dtype)
        report("score heads + upsample", heads, sc)


if __name__ == "__main__":
    main()

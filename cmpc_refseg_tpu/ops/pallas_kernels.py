"""Pallas TPU kernels for the CMPC hot path.

The mutan bilinear fusion (reference CMPC_model.py:295-328) is the head's
FLOP/bandwidth hotspot: XLA computes ``tanh(x @ W + b)`` into a
[B,HW,5*C] intermediate (~128MB bf16 at the reference geometry), re-reads it
for the per-head language product, then reduces over heads.  The fused
kernel keeps each M-tile's head-partial in VMEM and never materializes the
5C intermediate in HBM:

    part = x_tile @ W_wide                       (one [tm,Kp]x[Kp,H*Cp] dot)
    acc  = sum_h tanh(part[:, h]) * lang[h]      (VPU, f32 accumulator)
    out  = l2norm(tanh(acc))                     (bf16 in/out)

Wide-N grid over flat M tiles: W (all heads, lane-padded) has a constant
index map so it stays VMEM-resident across the whole grid; only x/out
stream.  Hard-won Mosaic facts baked in here: flat 2-D blocks (a leading
unit block dim is ~2x slower), one-hot instead of dynamic sublane indexing,
lane dims padded to 128 HOST-side (in-jit pads relayout ~2.4ms/call — see
pad_mutan_params / models.model.prepare_params), tiles must not straddle
batch rows (per-tile lang selection).

A custom VJP recomputes the backward pass with plain XLA ops (the backward
is matmul-dominated and XLA-fused; training throughput is secondary to the
inference path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_mutan_params(vis_trans: dict, lang_trans: dict, num_heads: int = 5,
                     compute_dtype=jnp.bfloat16):
    """One-time host-side padding of mutan weights to lane-aligned shapes.

    Padding the weights INSIDE jit costs ~2.4ms/call at the reference
    geometry (XLA inserts a relayout copy feeding the pallas custom call);
    done once at parameter-prep time it is free.  Returns a dict consumed by
    apply_mutan's fast path:
      w_wide [Kp, H*Cp] compute_dtype, b_pad [H, Cp] f32,
      lang_dw [1,1,Ld,H*Cp], lang_b [H*Cp] (zero pad cols -> lang pads are
      tanh(0)=0, which the kernel multiplies to zero).
    """
    w = np.asarray(vis_trans["DW"])[0, 0]                    # [K, H*C]
    b = np.asarray(vis_trans["biases"])
    k, hc = w.shape
    c = hc // num_heads
    kp, cp = _round_up(k, 128), _round_up(c, 128)
    wp = np.zeros((kp, num_heads, cp), np.float32)
    wp[:k, :, :c] = w.reshape(k, num_heads, c)
    bp = np.zeros((num_heads, cp), np.float32)
    bp[:, :c] = b.reshape(num_heads, c)
    ldw = np.asarray(lang_trans["DW"])                       # [1,1,Ld,H*C]
    lb = np.asarray(lang_trans["biases"])
    ldw_p = np.zeros(ldw.shape[:3] + (num_heads, cp), np.float32)
    ldw_p[..., :c] = ldw.reshape(ldw.shape[:3] + (num_heads, c))
    lb_p = np.zeros((num_heads, cp), np.float32)
    lb_p[:, :c] = lb.reshape(num_heads, c)
    # arrays only (ints would become traced pytree leaves); the logical C
    # is recovered from the visual feature width at apply time
    return {
        "w_wide": jnp.asarray(wp.reshape(kp, num_heads * cp), compute_dtype),
        "b_pad": jnp.asarray(bp),
        "lang_dw": jnp.asarray(ldw_p.reshape(
            ldw.shape[:3] + (num_heads * cp,))),
        "lang_b": jnp.asarray(lb_p.reshape(num_heads * cp)),
    }


def _bf16_tanh_enabled(dtype) -> bool:
    """bf16 tanh chain gate — MEASURED ANTI-WIN on v5e, default OFF.

    Hypothesis (VERDICT r3 #5i): the mutan epilogue is VPU-tanh-bound, and
    packed bf16 transcendentals run 2x f32.  Measured (2026-08-21, v5e-1,
    bs=8 320x320): standalone kernel A/Bs were noise-dominated through the
    tunnel (0.117-0.808 ms for the SAME kernel across sessions), and the
    full-model A/B showed NO win (f32 548.7 vs bf16 542.8 masks/s) — v5e's
    VPU evidently does not run bf16 tanh faster.  The exact f32 chain stays
    the default; CMPC_MUTAN_TANH=bf16 keeps the fast-chain path alive for
    A/B on other TPU generations (parity pinned by
    tests/test_pallas.py::test_mutan_bf16_tanh_chain_parity)."""
    import os
    return (os.environ.get("CMPC_MUTAN_TANH", "").lower() == "bf16"
            and dtype == jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("num_heads", "c", "interpret",
                                             "bf16_tanh"))
def mutan_fused_padded(x, w_wide, b_pad, lang_pad, *, num_heads: int,
                       c: int, interpret: bool = False,
                       bf16_tanh: bool = False):
    """Fast path with pre-padded weights: x [B,N,Kp] (already lane-aligned),
    w_wide [Kp, H*Cp], b_pad [H,Cp], lang_pad [B,H*Cp] -> [B,N,c]."""
    bsz, n, kp = x.shape
    cp = w_wide.shape[-1] // num_heads
    x_flat = x.reshape(bsz * n, kp)
    l_pad = lang_pad.reshape(bsz, num_heads, cp).astype(jnp.float32)

    w_bytes = kp * num_heads * cp * x.dtype.itemsize
    budget = 15 * 1024 * 1024 - w_bytes
    per_row = (kp * x.dtype.itemsize + num_heads * cp * 4 + cp * 4
               + cp * x.dtype.itemsize) * 2
    cap = max(8, (budget // max(per_row, 1)) // 8 * 8)
    tm = _pick_tm(n, min(256, cap))
    rows_per_b = n
    tanh = _tanh_fn(bf16_tanh)

    def kern(x_ref, w_ref, b_ref, l_ref, o_ref):
        part = jnp.dot(x_ref[:, :], w_ref[:, :],
                       preferred_element_type=jnp.float32)
        acc = jnp.zeros((tm, cp), jnp.float32)
        for h in range(num_heads):
            seg = part[:, h * cp:(h + 1) * cp] + b_ref[h, :]
            acc = acc + tanh(seg) * l_ref[0, h, :]
        y = tanh(acc)
        sq = jnp.sum(y * y, axis=-1, keepdims=True)
        o_ref[:, :] = (y * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
                       ).astype(o_ref.dtype)

    out = pl.pallas_call(
        kern,
        grid=(bsz * n // tm,),
        in_specs=[
            pl.BlockSpec((tm, kp), lambda mi: (mi, 0)),
            pl.BlockSpec((kp, num_heads * cp), lambda mi: (0, 0)),
            pl.BlockSpec((num_heads, cp), lambda mi: (0, 0)),
            pl.BlockSpec((1, num_heads, cp),
                         lambda mi: (mi * tm // rows_per_b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, cp), lambda mi: (mi, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz * n, cp), x.dtype),
        interpret=interpret,
    )(x_flat, w_wide, b_pad, l_pad)
    return out[:, :c].reshape(bsz, n, c)


def _tanh_fn(bf16: bool):
    """f32->f32 tanh, optionally evaluated at bf16 precision (packed VPU,
    2x rate; see _bf16_tanh_enabled)."""
    if not bf16:
        return jnp.tanh
    return lambda v: jnp.tanh(v.astype(jnp.bfloat16)).astype(jnp.float32)


def _pick_tm(rows_per_b: int, cap: int) -> int:
    """Largest multiple-of-8 divisor of rows_per_b not exceeding cap (a tile
    must not straddle batch elements — the lang block is selected per tile)."""
    best = None
    for cand in range(8, min(rows_per_b, cap) + 1, 8):
        if rows_per_b % cand == 0:
            best = cand
    return best or rows_per_b


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret",
                                             "bf16_tanh"))
def _mutan_fused_fwd(x, w, b, lang, *, num_heads: int = 5,
                     interpret: bool = False, bf16_tanh: bool = False):
    """x [B,N,K] (bf16/f32), w [K, H*C], b [H*C] f32, lang [B,H*C] ->
    [B,N,C] l2-normalized fused feature (x dtype).

    Wide-N design: W (all heads, zero-padded to lane width) stays resident
    in VMEM across the whole grid (constant index map); each grid step does
    ONE [tm, Kp] x [Kp, H*Cp] MXU dot and the per-head tanh/product/reduce
    epilogue on the VPU — measured matmul-bound (~2x the per-head streaming
    formulation, ~4x XLA) at the reference geometry.
    """
    bsz, n, k = x.shape
    c = w.shape[-1] // num_heads
    kp = _round_up(k, 128)
    cp = _round_up(c, 128)

    if kp != k:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, kp - k)))
    x_flat = x.reshape(bsz * n, kp)

    # zero-pad per-head blocks: K rows to Kp, C cols to Cp.  Pad columns
    # produce acc=0 -> tanh(0)=0, so the l2-norm over Cp equals the norm
    # over C; pad K rows are zeros so padded x lanes contribute nothing.
    w_pad = jnp.zeros((kp, num_heads, cp), w.dtype)
    w_pad = w_pad.at[:k, :, :c].set(w.reshape(k, num_heads, c))
    w_wide = w_pad.reshape(kp, num_heads * cp).astype(x.dtype)
    b_pad = jnp.zeros((num_heads, cp), jnp.float32
                      ).at[:, :c].set(b.reshape(num_heads, c))
    l_pad = jnp.zeros((bsz, num_heads, cp), jnp.float32
                      ).at[:, :, :c].set(
                          lang.reshape(bsz, num_heads, c).astype(jnp.float32))

    # VMEM budget: W + per-tile x + part f32 [tm, H*Cp] + acc/out.
    w_bytes = kp * num_heads * cp * x.dtype.itemsize
    if w_bytes > 12 * 1024 * 1024:
        # W cannot stay VMEM-resident (e.g. f32 inputs at BERT dims); the
        # XLA path is preferable to a thrashing kernel.
        return _mutan_reference(x[..., :k], w, b, lang, num_heads)
    budget = 15 * 1024 * 1024 - w_bytes
    per_row = (kp * x.dtype.itemsize + num_heads * cp * 4 + cp * 4
               + cp * x.dtype.itemsize) * 2   # x2 for pipeline buffers
    cap = max(8, (budget // max(per_row, 1)) // 8 * 8)
    tm = _pick_tm(n, min(256, cap))
    rows_per_b = n
    tanh = _tanh_fn(bf16_tanh)

    def kern(x_ref, w_ref, b_ref, l_ref, o_ref):
        part = jnp.dot(x_ref[:, :], w_ref[:, :],
                       preferred_element_type=jnp.float32)  # [tm, H*Cp]
        acc = jnp.zeros((tm, cp), jnp.float32)
        for h in range(num_heads):
            seg = part[:, h * cp:(h + 1) * cp] + b_ref[h, :]
            acc = acc + tanh(seg) * l_ref[0, h, :]
        y = tanh(acc)
        sq = jnp.sum(y * y, axis=-1, keepdims=True)
        o_ref[:, :] = (y * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
                       ).astype(o_ref.dtype)

    out = pl.pallas_call(
        kern,
        grid=(bsz * n // tm,),
        in_specs=[
            pl.BlockSpec((tm, kp), lambda mi: (mi, 0)),
            pl.BlockSpec((kp, num_heads * cp), lambda mi: (0, 0)),
            pl.BlockSpec((num_heads, cp), lambda mi: (0, 0)),
            pl.BlockSpec((1, num_heads, cp),
                         lambda mi: (mi * tm // rows_per_b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, cp), lambda mi: (mi, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz * n, cp), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * kp * num_heads * cp,
            bytes_accessed=(x_flat.size * x.dtype.itemsize + w_bytes
                            + bsz * n * cp * x.dtype.itemsize),
            transcendentals=bsz * n * cp * (num_heads + 1),
        ),
    )(x_flat, w_wide, b_pad, l_pad)
    return out[:, :c].reshape(bsz, n, c)


def _mutan_reference(x, w, b, lang, num_heads: int = 5):
    """Plain-XLA reference implementation (also the backward recompute)."""
    bsz, n, k = x.shape
    c = w.shape[-1] // num_heads
    v = jnp.tanh((jnp.einsum("bnk,kd->bnd", x, w.astype(x.dtype),
                             preferred_element_type=jnp.float32)
                  + b).astype(jnp.float32))
    prod = v.reshape(bsz, n, num_heads, c) * \
        lang.reshape(bsz, 1, num_heads, c).astype(jnp.float32)
    y = jnp.tanh(jnp.sum(prod, axis=2))
    sq = jnp.sum(y * y, axis=-1, keepdims=True)
    out = y * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def mutan_fused(x, w, b, lang, num_heads: int = 5):
    """Fused mutan head: l2norm(tanh(sum_h tanh(x@W_h+b_h)*lang_h)).

    x [B,N,K], w [K,H*C], b [H*C], lang [B,H*C] -> [B,N,C] in x.dtype.
    Pallas on TPU; plain XLA elsewhere (or under vmap/interpreters).  On a
    declared data-parallel mesh (parallel.mesh.data_parallel_dispatch) the
    kernel is wrapped in shard_map over the data axis — batch-row-local.
    """
    from cmpc_refseg_tpu.ops.fused_dispatch import fused_mode, shard_rows
    mode = fused_mode(x.shape[0], kernel="mutan")  # no batch gate
    if mode is not None:
        fn = shard_rows(
            functools.partial(_mutan_fused_fwd, num_heads=num_heads,
                              interpret=mode,
                              bf16_tanh=_bf16_tanh_enabled(x.dtype)),
            in_batched=(True, False, False, True), out_batched=True)
        return fn(x, w, b, lang)
    return _mutan_reference(x, w, b, lang, num_heads)


def _use_fused_mutan_bwd(x) -> bool:
    """Fused-backward gate: single-chip TPU bf16 training only.  The
    multi-chip GSPMD train path keeps the XLA vjp (dW/db/dlang are batch
    REDUCTIONS — not row-local, so the shard_map wrap used for inference
    does not apply), as do f32 runs (the resident W + dW scratch would
    blow the VMEM budget at f32).  CMPC_MUTAN_FUSED_BWD=off forces the
    exact XLA vjp while leaving every OTHER dispatch untouched — the
    controlled A/B for the bf16-residual approximation
    (tools/convergence_ab.py, VERDICT r3 #1)."""
    import os
    if os.environ.get("CMPC_MUTAN_FUSED_BWD", "").lower() in ("off", "0"):
        return False
    from cmpc_refseg_tpu.ops.fused_dispatch import fused_mode
    from cmpc_refseg_tpu.parallel.mesh import active_data_mesh
    return (fused_mode(x.shape[0]) is False and active_data_mesh() is None
            and x.dtype == jnp.bfloat16)


def _mutan_fwd(x, w, b, lang, num_heads):
    # Under differentiation custom_vjp calls THIS instead of the primal.
    # bf16 single-chip: run the PALLAS forward and save only the inputs —
    # the backward kernel recomputes the [B,N,H*C] intermediate per tile in
    # VMEM (mutan_bwd_fused).  The round-2 XLA-vjp choice materialized that
    # intermediate as an f32 residual and re-read it through several layout
    # copies — profiled at ~4 ms/level/step on v5e — so recompute-in-kernel
    # wins decisively.  Elsewhere: XLA reference + its vjp closure.
    if _use_fused_mutan_bwd(x):
        out, v_res = _mutan_fwd_with_residual(x, w, b, lang,
                                              num_heads=num_heads)
        return out, (x, w, b, lang, v_res)
    out, vjp = jax.vjp(
        lambda x_, w_, b_, l_: _mutan_reference(x_, w_, b_, l_, num_heads),
        x, w, b, lang)
    return out, vjp


def _mutan_bwd(num_heads, res, g):
    if isinstance(res, tuple):
        x, w, b, lang, v_res = res
        return mutan_bwd_fused(x, w, b, lang, g, v_res,
                               num_heads=num_heads)
    return res(g)


mutan_fused.defvjp(_mutan_fwd, _mutan_bwd)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret",
                                             "res_dtype"))
def _mutan_fwd_with_residual(x, w, b, lang, *, num_heads: int = 5,
                             interpret: bool = False,
                             res_dtype=jnp.bfloat16):
    """Pallas mutan forward that ALSO emits the bf16 tanh intermediate
    v = tanh(x@W+b) [B,N,H*Cp] as the training residual — ONE bf16 write
    instead of the f32 materializations + layout copies the XLA vjp path
    produced (profiled ~4 ms/level/step on v5e).  Returns (out, v_pad,
    aux) with aux = (kp, cp) for the backward's padded-layout matmuls."""
    bsz, n, k = x.shape
    c = w.shape[-1] // num_heads
    kp = _round_up(k, 128)
    cp = _round_up(c, 128)
    hcp = num_heads * cp
    dt = x.dtype

    if kp != k:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, kp - k)))
    x_flat = x.reshape(bsz * n, kp)
    w_pad = jnp.zeros((kp, num_heads, cp), w.dtype)
    w_pad = w_pad.at[:k, :, :c].set(w.reshape(k, num_heads, c))
    w_wide = w_pad.reshape(kp, hcp).astype(dt)
    b_pad = jnp.zeros((num_heads, cp), jnp.float32
                      ).at[:, :c].set(b.reshape(num_heads, c)
                                      ).reshape(1, hcp)
    l_pad = jnp.zeros((bsz, num_heads, cp), jnp.float32
                      ).at[:, :, :c].set(
                          lang.reshape(bsz, num_heads, c).astype(jnp.float32)
                      ).reshape(bsz, 1, hcp)

    w_bytes = kp * hcp * x.dtype.itemsize
    budget = 14 * 1024 * 1024 - w_bytes
    per_row = (kp * 2 + hcp * 4 + hcp * 2 + cp * 2) * 2
    cap = max(8, (budget // max(per_row, 1)) // 8 * 8)
    tm = _pick_tm(n, min(256, cap))

    def kern(x_ref, w_ref, b_ref, l_ref, o_ref, v_ref):
        part = jnp.dot(x_ref[...], w_ref[...],
                       preferred_element_type=jnp.float32) + b_ref[0]
        v = jnp.tanh(part)                                 # [tm, hcp] f32
        v_ref[...] = v.astype(v_ref.dtype)
        prod = v * l_ref[0]
        acc = jnp.zeros((tm, cp), jnp.float32)
        for h in range(num_heads):
            acc = acc + prod[:, h * cp:(h + 1) * cp]
        y = jnp.tanh(acc)
        sq = jnp.sum(y * y, axis=-1, keepdims=True)
        o_ref[...] = (y * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
                      ).astype(o_ref.dtype)

    row = lambda bi, ti: (bi * (n // tm) + ti, 0)  # noqa: E731
    out, v_res = pl.pallas_call(
        kern,
        grid=(bsz, n // tm),
        in_specs=[
            pl.BlockSpec((tm, kp), row),
            pl.BlockSpec((kp, hcp), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, hcp), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, 1, hcp), lambda bi, ti: (bi, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((tm, cp), row),
                   pl.BlockSpec((tm, hcp), row)],
        out_shape=[jax.ShapeDtypeStruct((bsz * n, cp), dt),
                   jax.ShapeDtypeStruct((bsz * n, hcp), res_dtype)],
        interpret=interpret,
    )(x_flat, w_wide, b_pad, l_pad)
    return out[:, :c].reshape(bsz, n, c), v_res


def _mutan_dw_call(x_flat, dz_p, *, kp, cp, num_heads, bsz_n,
                   interpret=False):
    """dW = x^T @ dz as a Pallas kernel consuming dz in its NATIVE layout.

    The XLA dot for this contraction (over the B*N rows — the MAJOR dim of
    both operands) forces a relayout copy of one operand, and layout
    assignment picks dz (131MB bf16 -> 0.39 ms/level; operand order cannot
    steer it — dots are canonicalized first, PERF.md r5 notes).  Here the
    per-head grid accumulates x_tile^T @ dz_htile into a VMEM f32 scratch
    ([kp, cp] = 4.1MB at production dims) with small in-VMEM tile
    transposes, so dz is only ever read in row-major blocks.

    x_flat [B*N, kp] bf16, dz_p [B*N, H*cp] bf16 -> dW [kp, H, cp] f32.
    """
    from jax.experimental.pallas import tpu as pltpu
    # Row-block size independent of the dz kernel's tile: as large as VMEM
    # allows (x + dz blocks double-buffered + f32 acc + out block) so each
    # grid step is a big MXU contraction, not a tm-row sliver.
    tm = bsz_n
    for cand in (1280, 1024, 640, 512, 256, 128, 64, 32, 16, 8):
        if bsz_n % cand == 0 and cand <= bsz_n \
                and (cand * (kp + cp) * 2 * 2          # in blocks, 2x buffered
                     + kp * cp * 4 * 2) < 14 * 1024 * 1024:
            tm = cand
            break
    tiles = bsz_n // tm

    def kern(x_ref, dz_ref, dw_ref, acc_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot_general(
            x_ref[...], dz_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(t == tiles - 1)
        def _():
            dw_ref[0] = acc_ref[...]

    return pl.pallas_call(
        kern,
        grid=(num_heads, tiles),
        in_specs=[
            pl.BlockSpec((tm, kp), lambda h, t: (t, 0)),
            pl.BlockSpec((tm, cp), lambda h, t: (t, h)),
        ],
        out_specs=pl.BlockSpec((1, kp, cp), lambda h, t: (h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((num_heads, kp, cp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((kp, cp), jnp.float32)],
        interpret=interpret,
    )(x_flat, dz_p)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def mutan_bwd_fused(x, w, b, lang, g, v_res, *, num_heads: int = 5,
                    interpret: bool = False):
    """Fused mutan backward from the saved bf16 intermediate.

    x [B,N,K], w [K,H*C], b [H*C], lang [B,H*C], g [B,N,C] (cotangent),
    v_res [B*N, H*Cp] bf16 (from _mutan_fwd_with_residual) ->
    (dx, dw, db, dlang) matching jax.vjp of _mutan_reference.

    The pallas kernel rebuilds the l2norm/tanh chain from v per tile and
    emits dz (bf16, the ONLY H*C-wide HBM write) plus the per-sample dlang
    and global db reductions in scratch; dx = dz @ W^T and dW = x^T dz run
    as two plain XLA matmuls on the padded layout (MXU-efficient, no
    layout copies — the XLA autodiff path produced six f32 [B,N,H*C]
    copies here)."""
    bsz, n, k = x.shape
    c = w.shape[-1] // num_heads
    kp = _round_up(k, 128)
    cp = _round_up(c, 128)
    hcp = num_heads * cp
    eps = 1e-12

    l_pad = jnp.zeros((bsz, num_heads, cp), jnp.float32
                      ).at[:, :, :c].set(
                          lang.reshape(bsz, num_heads, c).astype(jnp.float32)
                      ).reshape(bsz, 1, hcp)
    g_pad = jnp.zeros((bsz, n, cp), jnp.float32
                      ).at[:, :, :c].set(g.astype(jnp.float32))
    g_flat = g_pad.reshape(bsz * n, cp)

    # tiles: largest mult-of-8 divisor of n with ~4 wide f32 buffers < 8MB
    cap = max(8, (8 * 1024 * 1024 // (hcp * 4 * 4)) // 8 * 8)
    tm = _pick_tm(n, min(256, cap))
    tiles = n // tm

    from jax.experimental.pallas import tpu as pltpu

    def kern(v_ref, l_ref, g_ref, dz_ref, dl_ref, db_ref,
             dlacc_ref, dbacc_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)

        @pl.when((bi == 0) & (ti == 0))
        def _():
            dbacc_ref[...] = jnp.zeros_like(dbacc_ref)

        @pl.when(ti == 0)
        def _():
            dlacc_ref[...] = jnp.zeros_like(dlacc_ref)

        v = v_ref[...].astype(jnp.float32)                 # [tm, hcp]
        lrow = l_ref[0]                                    # [1, hcp]
        prod = v * lrow
        acc = jnp.zeros((tm, cp), jnp.float32)
        for h in range(num_heads):
            acc = acc + prod[:, h * cp:(h + 1) * cp]
        y = jnp.tanh(acc)
        sq = jnp.sum(y * y, axis=-1, keepdims=True)
        r = jax.lax.rsqrt(jnp.maximum(sq, eps))
        out = y * r
        gt = g_ref[...]
        gy = jnp.sum(gt * out, axis=-1, keepdims=True)
        dy = jnp.where(sq > eps, (gt - out * gy) * r, gt * r)
        dacc = dy * (1.0 - y * y)                          # [tm, cp]
        dacc_w = jnp.concatenate([dacc] * num_heads, axis=-1)
        dz = dacc_w * lrow * (1.0 - v * v)                 # [tm, hcp] f32
        dlacc_ref[...] += jnp.sum(dacc_w * v, axis=0, keepdims=True)
        dbacc_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
        dz_ref[...] = dz.astype(dz_ref.dtype)

        @pl.when(ti == tiles - 1)
        def _():
            dl_ref[0] = dlacc_ref[...]

        @pl.when((bi == pl.num_programs(0) - 1) & (ti == tiles - 1))
        def _():
            db_ref[...] = dbacc_ref[...]

    row = lambda bi, ti: (bi * tiles + ti, 0)  # noqa: E731
    dz_p, dl_p, db_p = pl.pallas_call(
        kern,
        grid=(bsz, tiles),
        in_specs=[
            pl.BlockSpec((tm, hcp), row),
            pl.BlockSpec((1, 1, hcp), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((tm, cp), row),
        ],
        out_specs=[
            pl.BlockSpec((tm, hcp), row),
            pl.BlockSpec((1, 1, hcp), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((1, hcp), lambda bi, ti: (0, 0)),
        ],
        out_shape=[
            # dz precision follows the residual's (bf16 in production; f32
            # residuals keep the whole backward exact for the math tests)
            jax.ShapeDtypeStruct((bsz * n, hcp), v_res.dtype),
            jax.ShapeDtypeStruct((bsz, 1, hcp), jnp.float32),
            jax.ShapeDtypeStruct((1, hcp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, hcp), jnp.float32),
                        pltpu.VMEM((1, hcp), jnp.float32)],
        interpret=interpret,
    )(v_res, l_pad, g_flat)

    # dx / dW as two big padded-layout MXU matmuls in XLA
    dt = x.dtype
    if kp != k:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, kp - k)))
    x_flat = x.reshape(bsz * n, kp).astype(dt)
    w_pad = jnp.zeros((kp, num_heads, cp), w.dtype)
    w_pad = w_pad.at[:k, :, :c].set(w.reshape(k, num_heads, c))
    w_wide = w_pad.reshape(kp, hcp).astype(dt)
    dx_p = jax.lax.dot_general(dz_p.astype(dt), w_wide,
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    # dW: the XLA dot for this contraction (over the MAJOR dim of both
    # operands) forces a 131MB relayout copy of dz regardless of operand
    # order (dots are canonicalized before layout assignment — r5 xplane
    # A/B, PERF.md).  The Pallas per-head accumulation kernel reads dz in
    # its native layout instead; CMPC_MUTAN_DW=xla restores the dot for
    # A/B.
    import os
    if os.environ.get("CMPC_MUTAN_DW", "").lower() == "xla":
        dw_p = jax.lax.dot_general(x_flat, dz_p.astype(dt),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dw_p = dw_p.reshape(kp, num_heads, cp)
    else:
        dw_p = _mutan_dw_call(x_flat, dz_p.astype(dt), kp=kp, cp=cp,
                              num_heads=num_heads, bsz_n=bsz * n,
                              interpret=interpret
                              ).transpose(1, 0, 2)      # [kp, H, cp]

    dx = dx_p.astype(dt).reshape(bsz, n, kp)[:, :, :k]
    dw = dw_p[:k, :, :c].reshape(k, num_heads * c).astype(w.dtype)
    db = db_p.reshape(num_heads, cp)[:, :c].reshape(
        num_heads * c).astype(b.dtype)
    dlang = dl_p.reshape(bsz, num_heads, cp)[:, :, :c].reshape(
        bsz, num_heads * c).astype(lang.dtype)
    return dx, dw, db, dlang


# ---------------------------------------------------------------------------
# Fused ConvLSTM step (util/cell.py:36-79 semantics; 1x1 kernel)
# ---------------------------------------------------------------------------
#
# XLA runs one ConvLSTM step as ~10 HBM passes over [B,HW,C]-sized tensors
# (gate matmul, 5 whole-sample layer norms as reduce+apply pairs, peepholes,
# gating) — measured ~430 us/step at the reference geometry (bs=8, N=1600,
# C=500, bf16).  The fused pipeline cuts that roughly in half:
#
#   kernel 1 "gates":  per (b, row-tile): x@Wx_g + h@Wh_g for the 4 gates
#     (f32 accumulate, bf16 store), peepholes folded into i/f, and the
#     layer-norm statistics (sum, sum-of-squares) of j/i/f accumulated in
#     VMEM scratch across the row-tiles, emitted per sample (lane-replicated
#     rows so no scalar VMEM addressing is needed).
#   kernel 2 "raw":    per (b, row-tile): normalize j/i/f with kernel 1's
#     statistics, new_c_raw = c*sigmoid(LN f + fb) + sigmoid(LN i)*tanh(LN j),
#     o_raw = o + W_co*new_c_raw, accumulating THEIR statistics.
#   finalize (XLA):    new_c = LN(new_c_raw); new_h = sigmoid(LN o_raw) *
#     tanh(new_c) — a single fused elementwise pass.
#
# Training keeps the XLA step (cmpc.convlstm_step); the model dispatches to
# this fused path for inference only (apply_fusion_stack train=False).

_LN_EPS = 1e-12


def _stats_rows(acc_ref, row, val_f32):
    """Accumulate (sum, sumsq) into lane-replicated scratch rows."""
    s = jnp.sum(val_f32)
    ss = jnp.sum(val_f32 * val_f32)
    acc_ref[2 * row:2 * row + 1, :] += jnp.full((1, 128), s, jnp.float32)
    acc_ref[2 * row + 1:2 * row + 2, :] += jnp.full((1, 128), ss,
                                                    jnp.float32)


def _ln_from_stats(v, s_row, ss_row, gamma, beta, cnt):
    """Whole-sample layer norm given lane-replicated (sum, sumsq) rows."""
    s = jnp.sum(s_row) / 128.0
    ss = jnp.sum(ss_row) / 128.0
    m = s / cnt
    var = jnp.maximum(ss / cnt - m * m, 0.0)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    return (v.astype(jnp.float32) - m) * inv * gamma + beta


def _convlstm_gates_call(x2, h2, c2, wx3, wh3, ci, cf, *, bsz, n, c,
                         tiles, interpret=False):
    """x2/h2/c2 [B*N, C]; wx3/wh3 [4, C, C]; ci/cf [N, C] ->
    gates [4, B*N, C] (j, i+peep, f+peep, o), stats [B, 8, 128]."""
    tm = n // tiles

    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, h_ref, c_ref, wx_ref, wh_ref, ci_ref, cf_ref,
             g_ref, s_ref, acc_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        cc = c_ref[...]
        for g in range(4):
            y = (jnp.dot(x_ref[...], wx_ref[g],
                         preferred_element_type=jnp.float32)
                 + jnp.dot(h_ref[...], wh_ref[g],
                           preferred_element_type=jnp.float32)
                 ).astype(g_ref.dtype)
            if g == 1:
                y = y + ci_ref[...] * cc
            elif g == 2:
                y = y + cf_ref[...] * cc
            g_ref[g] = y
            if g < 3:
                _stats_rows(acc_ref, g, y.astype(jnp.float32))

        @pl.when(t == tiles - 1)
        def _():
            s_ref[0] = acc_ref[...]

    return pl.pallas_call(
        kern,
        grid=(bsz, tiles),
        in_specs=[
            pl.BlockSpec((tm, c), lambda b, t: (b * tiles + t, 0)),
            pl.BlockSpec((tm, c), lambda b, t: (b * tiles + t, 0)),
            pl.BlockSpec((tm, c), lambda b, t: (b * tiles + t, 0)),
            pl.BlockSpec((4, c, c), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((4, c, c), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((tm, c), lambda b, t: (t, 0)),
            pl.BlockSpec((tm, c), lambda b, t: (t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((4, tm, c), lambda b, t: (0, b * tiles + t, 0)),
            pl.BlockSpec((1, 8, 128), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, bsz * n, c), x2.dtype),
            jax.ShapeDtypeStruct((bsz, 8, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(x2, h2, c2, wx3, wh3, ci, cf)


def _convlstm_raw_call(gates, c2, co, stats, gamma, beta, *, bsz, n, c,
                       tiles, forget_bias, interpret=False):
    """-> new_c_raw [B*N,C], o_raw [B*N,C], stats2 [B,8,128] (rows 0..3 =
    sum/ss of new_c_raw, sum/ss of o_raw).  gamma/beta [8, C]: rows 0..4 =
    j, i, f, o, c layer-norm parameters."""
    tm = n // tiles
    cnt = float(n * c)

    from jax.experimental.pallas import tpu as pltpu

    def kern2(g_ref, c_ref, co_ref, s_ref, gm_ref, bt_ref,
              nc_ref, or_ref, s2_ref, acc_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        def ln(v, row):
            return _ln_from_stats(v, s_ref[0, 2 * row], s_ref[0, 2 * row + 1],
                                  gm_ref[row], bt_ref[row], cnt)

        jn = jnp.tanh(ln(g_ref[0], 0)).astype(nc_ref.dtype)
        i_s = jax.nn.sigmoid(ln(g_ref[1], 1)).astype(nc_ref.dtype)
        f_s = jax.nn.sigmoid(ln(g_ref[2], 2) + forget_bias
                             ).astype(nc_ref.dtype)
        new_c_raw = c_ref[...] * f_s + i_s * jn
        o_raw = g_ref[3] + co_ref[...] * new_c_raw
        nc_ref[...] = new_c_raw
        or_ref[...] = o_raw
        _stats_rows(acc_ref, 0, new_c_raw.astype(jnp.float32))
        _stats_rows(acc_ref, 1, o_raw.astype(jnp.float32))

        @pl.when(t == tiles - 1)
        def _():
            s2_ref[0] = acc_ref[...]

    return pl.pallas_call(
        kern2,
        grid=(bsz, tiles),
        in_specs=[
            pl.BlockSpec((4, tm, c), lambda b, t: (0, b * tiles + t, 0)),
            pl.BlockSpec((tm, c), lambda b, t: (b * tiles + t, 0)),
            pl.BlockSpec((tm, c), lambda b, t: (t, 0)),
            pl.BlockSpec((1, 8, 128), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((8, c), lambda b, t: (0, 0)),
            pl.BlockSpec((8, c), lambda b, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tm, c), lambda b, t: (b * tiles + t, 0)),
            pl.BlockSpec((tm, c), lambda b, t: (b * tiles + t, 0)),
            pl.BlockSpec((1, 8, 128), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz * n, c), gates.dtype),
            jax.ShapeDtypeStruct((bsz * n, c), gates.dtype),
            jax.ShapeDtypeStruct((bsz, 8, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(gates, c2, co, stats, gamma, beta)


def convlstm_step_fused(p, x, c, h, *, forget_bias: float = 1.0,
                        interpret: bool = False):
    """Drop-in fused forward for cmpc.convlstm_step (inference path).

    x/c/h [B,H,W,C]; p carries 'kernel' [1,1,2C,4C], 'W_ci/W_cf/W_co'
    [H,W,C] and 'ln' (5 layer norms in j,i,f,o,c creation order).
    """
    bsz, hh, ww, cc = x.shape
    n = hh * ww
    dt = x.dtype
    tiles = 1
    for cand in (4, 2, 1):
        if n % cand == 0 and (n // cand) % 8 == 0:
            tiles = cand
            break

    x2 = x.reshape(bsz * n, cc)
    h2 = h.reshape(bsz * n, cc)
    c2 = c.reshape(bsz * n, cc)
    w = p["kernel"][0, 0].astype(dt)                      # [2C, 4C]
    wx3 = w[:cc].reshape(cc, 4, cc).transpose(1, 0, 2)
    wh3 = w[cc:].reshape(cc, 4, cc).transpose(1, 0, 2)
    ci = p["W_ci"].reshape(n, cc).astype(dt)
    cf = p["W_cf"].reshape(n, cc).astype(dt)
    co = p["W_co"].reshape(n, cc).astype(dt)
    ln = p["ln"]
    gamma = jnp.stack([ln[r]["gamma"].astype(jnp.float32) for r in range(5)]
                      + [jnp.zeros((cc,), jnp.float32)] * 3)
    beta = jnp.stack([ln[r]["beta"].astype(jnp.float32) for r in range(5)]
                     + [jnp.zeros((cc,), jnp.float32)] * 3)

    gates, stats = _convlstm_gates_call(x2, h2, c2, wx3, wh3, ci, cf,
                                        bsz=bsz, n=n, c=cc, tiles=tiles,
                                        interpret=interpret)
    nc_raw, o_raw, stats2 = _convlstm_raw_call(
        gates, c2, co, stats, gamma, beta, bsz=bsz, n=n, c=cc, tiles=tiles,
        forget_bias=forget_bias, interpret=interpret)

    # finalize (XLA, one fused pass): LN from stats2 + output gating
    cnt = float(n * cc)
    s = stats2[:, :, 0]                                  # [B, 8]
    m_c = s[:, 0] / cnt
    var_c = jnp.maximum(s[:, 1] / cnt - m_c * m_c, 0.0)
    m_o = s[:, 2] / cnt
    var_o = jnp.maximum(s[:, 3] / cnt - m_o * m_o, 0.0)

    def ln_apply(v2, m, var, g_row, b_row):
        inv = jax.lax.rsqrt(var + _LN_EPS)[:, None, None]
        vf = v2.reshape(bsz, n, cc).astype(jnp.float32)
        return (vf - m[:, None, None]) * inv * g_row + b_row

    new_c = ln_apply(nc_raw, m_c, var_c, gamma[4], beta[4]).astype(dt)
    o_n = jax.nn.sigmoid(ln_apply(o_raw, m_o, var_o, gamma[3], beta[3])
                         ).astype(dt)
    new_h = o_n * jnp.tanh(new_c)
    return (new_c.reshape(bsz, hh, ww, cc),
            new_h.reshape(bsz, hh, ww, cc))


# ---------------------------------------------------------------------------
# Fused graph convolution (CMPC_model.py:359-374; factored adjacency)
# ---------------------------------------------------------------------------
#
# XLA runs one graph conv as ~8 HBM passes over [B,HW,C]: the message
# matmul, whole-sample layer norm (reduce+apply), residual+relu, the update
# conv, a second layer norm, relu.  Two pallas calls (same shape as the
# fused ConvLSTM) cut the passes roughly in half:
#
#   kernel 1 "message": per (b, row-tile): msg = w_aff @ pooled (the
#     factored-adjacency message — `pooled` = v_aff^T x computed in XLA,
#     it is [B,T,C] tiny), bf16 store + LN statistics.
#   kernel 2 "update":  per (b, row-tile): y = relu(x + LN1(msg));
#     z = y @ W + b, accumulating LN2 statistics.
#   finalize (XLA):     relu(LN2(z)) — one fused elementwise pass.


def _graph_msg_call(w_aff, pooled, *, bsz, n, c, t, tiles, interpret=False):
    """w_aff [B*N, T] (x dtype), pooled [B, T, C] -> msg [B*N, C] +
    stats [B, 8, 128] (rows 0,1 = sum, sumsq)."""
    tm = n // tiles
    from jax.experimental.pallas import tpu as pltpu

    def kern(w_ref, p_ref, m_ref, s_ref, acc_ref):
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        msg = jnp.dot(w_ref[...], p_ref[0],
                      preferred_element_type=jnp.float32).astype(m_ref.dtype)
        m_ref[...] = msg
        _stats_rows(acc_ref, 0, msg.astype(jnp.float32))

        @pl.when(ti == tiles - 1)
        def _():
            s_ref[0] = acc_ref[...]

    return pl.pallas_call(
        kern,
        grid=(bsz, tiles),
        in_specs=[
            pl.BlockSpec((tm, t), lambda b, ti: (b * tiles + ti, 0)),
            pl.BlockSpec((1, t, c), lambda b, ti: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tm, c), lambda b, ti: (b * tiles + ti, 0)),
            pl.BlockSpec((1, 8, 128), lambda b, ti: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz * n, c), pooled.dtype),
            jax.ShapeDtypeStruct((bsz, 8, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(w_aff, pooled)


def _graph_update_call(x2, msg, stats, w, b, g1, b1, *, bsz, n, c, tiles,
                       interpret=False):
    """x2/msg [B*N, C]; stats [B,8,128] (LN1); w [C,C] or grouped [G,C,C]
    (row i uses group i // (B//G) — level packing); b [1,C] / [G,1,C] bias;
    g1/b1 LN1 affine likewise -> z [B*N, C] + stats2 [B, 8, 128]."""
    tm = n // tiles
    cnt = float(n * c)
    from jax.experimental.pallas import tpu as pltpu

    if w.ndim == 2:
        w = w[None]
        b = b.reshape(1, 1, c)
        g1 = g1.reshape(1, 1, c)
        b1 = b1.reshape(1, 1, c)
    groups = w.shape[0]
    bpg = bsz // groups

    def kern(x_ref, m_ref, s_ref, w_ref, b_ref, g_ref, be_ref,
             z_ref, s2_ref, acc_ref):
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        mln = _ln_from_stats(m_ref[...], s_ref[0, 0], s_ref[0, 1],
                             g_ref[0, 0], be_ref[0, 0], cnt
                             ).astype(x_ref.dtype)
        y = jax.nn.relu(x_ref[...] + mln)
        z = (jnp.dot(y, w_ref[0], preferred_element_type=jnp.float32)
             ).astype(z_ref.dtype) + b_ref[0, 0]
        z_ref[...] = z
        _stats_rows(acc_ref, 0, z.astype(jnp.float32))

        @pl.when(ti == tiles - 1)
        def _():
            s2_ref[0] = acc_ref[...]

    return pl.pallas_call(
        kern,
        grid=(bsz, tiles),
        in_specs=[
            pl.BlockSpec((tm, c), lambda bi, ti: (bi * tiles + ti, 0)),
            pl.BlockSpec((tm, c), lambda bi, ti: (bi * tiles + ti, 0)),
            pl.BlockSpec((1, 8, 128), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((1, c, c), lambda bi, ti: (bi // bpg, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi // bpg, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi // bpg, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi // bpg, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tm, c), lambda bi, ti: (bi * tiles + ti, 0)),
            pl.BlockSpec((1, 8, 128), lambda bi, ti: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz * n, c), x2.dtype),
            jax.ShapeDtypeStruct((bsz, 8, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(x2, msg, stats, w, b, g1, b1)


def graph_conv_fused(gp, x_nodes, w_aff, v_aff, *, interpret=False):
    """Fused forward for cmpc._graph_conv (inference path).

    x_nodes [B,N,C]; w_aff/v_aff [B,N,T] (f32 affinities).  Matches the XLA
    reference: msg = w_aff @ (v_aff^T @ x) -> LN -> relu(x+.) -> 1x1 conv
    -> LN -> relu, with whole-sample layer norms.

    `gp` is one param dict, or a LIST of G dicts for the level-packed path
    (VERDICT r3 #6): then B = G*rows and batch row i uses params
    i // (B//G).  Packing levels multiplies the grid (small-batch tiles run
    near-empty at the video path's internal b=1).
    """
    bsz, n, c = x_nodes.shape
    dt = x_nodes.dtype
    t = w_aff.shape[-1]
    tiles = 1
    for cand in (4, 2, 1):
        if n % cand == 0 and (n // cand) % 8 == 0:
            tiles = cand
            break

    wa = w_aff.astype(dt)
    va = v_aff.astype(dt)
    pooled = jnp.einsum("bnt,bnc->btc", va, x_nodes,
                        preferred_element_type=jnp.float32).astype(dt)
    msg, stats1 = _graph_msg_call(
        wa.reshape(bsz * n, t), pooled.reshape(bsz, t, c),
        bsz=bsz, n=n, c=c, t=t, tiles=tiles, interpret=interpret)

    gps = gp if isinstance(gp, (list, tuple)) else [gp]
    groups = len(gps)
    if bsz % groups:
        raise ValueError(f"graph_conv_fused: batch {bsz} not divisible by "
                         f"{groups} weight groups (group index would run "
                         "off the packed weight array)")
    w = jnp.stack([g["update"]["DW"][0, 0] for g in gps]).astype(dt)
    b = jnp.stack([g["update"]["biases"] for g in gps]
                  ).reshape(groups, 1, c).astype(dt)
    g1 = jnp.stack([g["feat_ln"]["gamma"] for g in gps]
                   ).reshape(groups, 1, c).astype(jnp.float32)
    b1 = jnp.stack([g["feat_ln"]["beta"] for g in gps]
                   ).reshape(groups, 1, c).astype(jnp.float32)
    z, stats2 = _graph_update_call(
        x_nodes.reshape(bsz * n, c), msg, stats1, w, b, g1, b1,
        bsz=bsz, n=n, c=c, tiles=tiles, interpret=interpret)

    # finalize: relu(LN2(z)) in one fused XLA pass (stats rows are
    # lane-replicated, so column 0 holds the full sums)
    cnt = float(n * c)
    s_sum = stats2[:, 0, 0]
    s_ss = stats2[:, 1, 0]
    m = s_sum / cnt
    var = jnp.maximum(s_ss / cnt - m * m, 0.0)
    inv = jax.lax.rsqrt(var + _LN_EPS)[:, None, None]
    zf = z.reshape(bsz, n, c).astype(jnp.float32)
    g2 = jnp.repeat(jnp.stack([g["update_ln"]["gamma"] for g in gps]),
                    bsz // groups, axis=0)[:, None, :]
    be2 = jnp.repeat(jnp.stack([g["update_ln"]["beta"] for g in gps]),
                     bsz // groups, axis=0)[:, None, :]
    out = (zf - m[:, None, None]) * inv * g2 + be2
    return jax.nn.relu(out).astype(dt)


# ---------------------------------------------------------------------------
# Fused spa-graph affinity epilogue (CMPC_model.py:380-399)
# ---------------------------------------------------------------------------
#
# XLA runs the affinity block as ~7 passes: the graph projection matmul
# (materializing [B,N,A] in HBM), optional l2norm, the word-affinity einsum,
# relation scaling, and TWO softmaxes (each a reduce+apply pair over
# [B,N,T]).  The fused kernel keeps the [tm,A] projection VMEM-resident per
# tile and does projection -> (l2norm) -> affinity -> relation scale -> row
# softmax (over T, row-local) in one pass, accumulating flash-style
# (running max, rescaled sum-exp) statistics for the column softmax over N;
# a single fused XLA pass finalizes v_aff from the stored affinity + stats.
# The [B,N,A] intermediate never reaches HBM.


def spa_affinity_fused(x2, wg, bg, wt, rel, mask, *, scale: float,
                       l2n: bool, masked_softmax: bool, interpret=False):
    """x2 [B,N,C] (compute dtype); wg [C,A] or GROUPED [G,C,A] (then B must
    be G*rows and row i uses weight group i // (B//G) — the level-packing
    path, VERDICT r3 #6); bg [A] / [G,A]; wt [B,T,A] (already
    l2-normalized when the config asks); rel/mask [B,1,T] f32.
    Returns (w_aff, v_aff) [B,N,T] f32 — cmpc._spa_affinity_xla parity."""
    bsz, n, c = x2.shape
    t = wt.shape[1]
    a = wg.shape[-1]
    dt = x2.dtype
    if wg.ndim == 2:
        wg = wg[None]
        bg = bg.reshape(1, a)
    groups = wg.shape[0]
    if bsz % groups:
        raise ValueError(f"spa_affinity_fused: batch {bsz} not divisible "
                         f"by {groups} weight groups (group index would "
                         "run off the packed weight array)")
    bpg = bsz // groups
    tiles = 1
    for cand in (4, 2, 1):
        if n % cand == 0 and (n // cand) % 8 == 0:
            tiles = cand
            break
    tm = n // tiles
    neg = float(jnp.finfo(jnp.float32).min)

    from jax.experimental.pallas import tpu as pltpu

    xf = x2.reshape(bsz * n, c)
    wgd = wg.astype(dt)
    bgd = bg.reshape(groups, 1, a).astype(dt)
    wtd = wt.astype(dt)
    relf = rel.astype(jnp.float32)
    maskf = mask.astype(jnp.float32)

    def kern(x_ref, wg_ref, bg_ref, wt_ref, r_ref, m_ref,
             w_ref, af_ref, s_ref, acc_ref):
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _():
            acc_ref[0:1, :] = jnp.full((1, t), neg, jnp.float32)
            acc_ref[1:2, :] = jnp.zeros((1, t), jnp.float32)

        gt = (jnp.dot(x_ref[...], wg_ref[0],
                      preferred_element_type=jnp.float32).astype(dt)
              + bg_ref[0, 0])
        if l2n:
            gf = gt.astype(jnp.float32)
            sq = jnp.sum(gf * gf, axis=-1, keepdims=True)
            gt = (gf * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))).astype(dt)
        affi = jax.lax.dot_general(
            gt, wt_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) / scale       # [tm, T]
        affi = r_ref[0] * affi                                 # rel scale
        af_ref[...] = affi

        mrow = m_ref[0]                                        # [1, T]
        if masked_softmax:
            z = mrow * affi + (1.0 - mrow) * neg
        else:
            z = affi
        zmax = jnp.max(z, axis=-1, keepdims=True)
        e = jnp.exp(z - zmax)
        wrow = e / jnp.sum(e, axis=-1, keepdims=True)
        if not masked_softmax:
            wrow = mrow * wrow
        w_ref[...] = wrow

        # flash-style column (over N) softmax statistics
        old_max = acc_ref[0:1, :]
        old_sum = acc_ref[1:2, :]
        tile_max = jnp.max(affi, axis=0, keepdims=True)        # [1, T]
        new_max = jnp.maximum(old_max, tile_max)
        new_sum = (old_sum * jnp.exp(old_max - new_max)
                   + jnp.sum(jnp.exp(affi - new_max), axis=0, keepdims=True))
        acc_ref[0:1, :] = new_max
        acc_ref[1:2, :] = new_sum

        @pl.when(ti == tiles - 1)
        def _():
            s_ref[0] = acc_ref[...]

    w_out, affi_out, stats = pl.pallas_call(
        kern,
        grid=(bsz, tiles),
        in_specs=[
            pl.BlockSpec((tm, c), lambda b, ti: (b * tiles + ti, 0)),
            pl.BlockSpec((1, c, a), lambda b, ti: (b // bpg, 0, 0)),
            pl.BlockSpec((1, 1, a), lambda b, ti: (b // bpg, 0, 0)),
            pl.BlockSpec((1, t, a), lambda b, ti: (b, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda b, ti: (b, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda b, ti: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tm, t), lambda b, ti: (b * tiles + ti, 0)),
            pl.BlockSpec((tm, t), lambda b, ti: (b * tiles + ti, 0)),
            pl.BlockSpec((1, 2, t), lambda b, ti: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz * n, t), jnp.float32),
            jax.ShapeDtypeStruct((bsz * n, t), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 2, t), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, t), jnp.float32)],
        interpret=interpret,
    )(xf, wgd, bgd, wtd, relf, maskf)

    # finalize v_aff in one fused XLA elementwise pass
    vmax = stats[:, 0][:, None, :]                             # [B,1,T]
    vsum = stats[:, 1][:, None, :]
    affi3 = affi_out.reshape(bsz, n, t)
    v_aff = maskf * (jnp.exp(affi3 - vmax) / vsum)
    return w_out.reshape(bsz, n, t), v_aff


# ---------------------------------------------------------------------------
# Fused gated-exchange SE sum (CMPC_model.py:245-259 + the l2norm epilogue)
# ---------------------------------------------------------------------------
#
# One exchange step is feat + sum_i relu(other_i @ W_i + b_i) * gate_i,
# l2-normalized PER ROW — row-local everywhere, so unlike the layer-norm
# kernels above it needs no statistics phase: one pallas call per target
# level fuses the SE convs, the gating, the residual sum and the row l2norm
# (XLA runs it as ~6 HBM passes; the gates themselves are [B,C]-tiny and
# stay in XLA).


def se_sum_fused(feat, others, gates, ws, bs_, *, interpret=False):
    """feat [B,N,C]; others: list of [B,N,C]; gates: list of [B,C]
    (sigmoid already applied); ws: list of [C,C]; bs_: list of [C].
    Returns l2norm(feat + sum_i relu(others_i @ ws_i + bs_i) * gates_i)."""
    bsz, n, c = feat.shape
    dt = feat.dtype
    k = len(others)
    tiles = 1
    for cand in (4, 2, 1):
        if n % cand == 0 and (n // cand) % 8 == 0:
            tiles = cand
            break
    tm = n // tiles

    f2 = feat.reshape(bsz * n, c)
    o2 = [o.reshape(bsz * n, c).astype(dt) for o in others]
    g2 = [g.reshape(bsz, 1, c).astype(dt) for g in gates]
    w2 = [w.astype(dt) for w in ws]
    b2 = [b.reshape(1, c).astype(dt) for b in bs_]

    def kern(*refs):
        f_ref = refs[0]
        o_refs = refs[1:1 + k]
        g_refs = refs[1 + k:1 + 2 * k]
        w_refs = refs[1 + 2 * k:1 + 3 * k]
        b_refs = refs[1 + 3 * k:1 + 4 * k]
        out_ref = refs[-1]
        acc = f_ref[...]
        for i in range(k):
            t = (jnp.dot(o_refs[i][...], w_refs[i][...],
                         preferred_element_type=jnp.float32)
                 ).astype(dt) + b_refs[i][0]
            acc = acc + jax.nn.relu(t) * g_refs[i][0]
        zf = acc.astype(jnp.float32)
        sq = jnp.sum(zf * zf, axis=-1, keepdims=True)
        out_ref[...] = (zf * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
                        ).astype(out_ref.dtype)

    row_spec = pl.BlockSpec((tm, c), lambda b, t: (b * tiles + t, 0))
    out = pl.pallas_call(
        kern,
        grid=(bsz, tiles),
        in_specs=([row_spec] + [row_spec] * k
                  + [pl.BlockSpec((1, 1, c), lambda b, t: (b, 0, 0))] * k
                  + [pl.BlockSpec((c, c), lambda b, t: (0, 0))] * k
                  + [pl.BlockSpec((1, c), lambda b, t: (0, 0))] * k),
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((bsz * n, c), dt),
        interpret=interpret,
    )(f2, *o2, *g2, *w2, *b2)
    return out.reshape(bsz, n, c)

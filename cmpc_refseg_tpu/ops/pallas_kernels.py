"""Pallas TPU kernels for the CMPC hot path.

The mutan bilinear fusion (reference CMPC_model.py:295-328) is the head's
FLOP/bandwidth hotspot: XLA computes ``tanh(x @ W + b)`` into a
[B,HW,5*C] intermediate (~128MB bf16 at the reference geometry), re-reads it
for the per-head language product, then reduces over heads.  The fused
kernel keeps each M-tile's head-partial in VMEM and never materializes the
5C intermediate in HBM:

    for h in heads:  acc += tanh(x @ W[:,h] + b[h]) * lang[h]
    out = l2norm(tanh(acc))          (f32 accumulator, bf16 in/out)

Grid: (B, M_tiles, heads) with heads innermost; the f32 accumulator lives in
a VMEM scratch that persists across the heads loop; the epilogue
(tanh + l2-normalize over C) runs on the last head step.

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
from jax.experimental.pallas import tpu as pltpu


def _mutan_kernel(x_ref, w_ref, b_ref, lang_ref, out_ref, acc_ref,
                  *, num_heads: int, epsilon: float):
    """Grid (m_tiles, heads), heads innermost; all refs FLAT 2-D blocks.
    (A leading unit block dim measurably deoptimizes Mosaic's matmul:
    2.1x slower at the reference geometry.)"""
    h = pl.program_id(1)

    part = jnp.dot(x_ref[:, :], w_ref[:, :],
                   preferred_element_type=jnp.float32)      # [TM, C] f32
    # b_ref [H, C] and lang_ref [1, H, C] ride along whole; select row h via
    # a one-hot reduce (Mosaic cannot prove dynamic sublane alignment)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (num_heads, 1), 0)
              == h).astype(jnp.float32)
    b_h = jnp.sum(b_ref[:, :] * onehot, axis=0)             # [C]
    lang_h = jnp.sum(lang_ref[0].astype(jnp.float32) * onehot, axis=0)
    part = jnp.tanh(part + b_h) * lang_h

    @pl.when(h == 0)
    def _():
        acc_ref[:, :] = part

    @pl.when(h > 0)
    def _():
        acc_ref[:, :] = acc_ref[:, :] + part

    @pl.when(h == num_heads - 1)
    def _():
        y = jnp.tanh(acc_ref[:, :])
        sq = jnp.sum(y * y, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(jnp.maximum(sq, epsilon))
        out_ref[:, :] = (y * inv).astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _mutan_fused_fwd(x, w, b, lang, *, num_heads: int = 5,
                     interpret: bool = False):
    """x [B,N,K] (bf16/f32), w [K, H*C], b [H*C] f32, lang [B,H*C] ->
    [B,N,C] l2-normalized fused feature (x dtype)."""
    bsz, n, k = x.shape
    c = w.shape[-1] // num_heads

    kp = _round_up(k, 128)
    if kp != k:  # pad contraction dim to the lane width
        x = jnp.pad(x, ((0, 0), (0, 0), (0, kp - k)))
        w = jnp.pad(w, ((0, kp - k), (0, 0)))

    # M tile: a divisor of per-batch rows (a tile must not straddle batch
    # elements — the lang block is selected per tile), multiple of 8,
    # capped so x + w + f32 acc + out fit VMEM (~16MB).
    tm = n
    for cand in (800, 512, 400, 256, 200, 128, 100, 64, 32, 16, 8):
        if n % cand == 0:
            tm = cand
            break
    m_tiles_total = bsz * (n // tm)

    x_flat = x.reshape(bsz * n, kp)
    w_heads = w.reshape(kp, num_heads, c).swapaxes(0, 1)     # [H, K, C]
    w_heads = w_heads.astype(x.dtype)
    b_heads = b.reshape(num_heads, c).astype(jnp.float32)
    lang_heads = lang.reshape(bsz, num_heads, c)
    rows_per_b = n

    out = pl.pallas_call(
        functools.partial(_mutan_kernel, num_heads=num_heads,
                          epsilon=1e-12),
        grid=(m_tiles_total, num_heads),
        in_specs=[
            pl.BlockSpec((tm, kp), lambda mi, hi: (mi, 0)),
            pl.BlockSpec((None, kp, c), lambda mi, hi: (hi, 0, 0)),
            pl.BlockSpec((num_heads, c), lambda mi, hi: (0, 0)),
            pl.BlockSpec((1, num_heads, c),
                         lambda mi, hi: (mi * tm // rows_per_b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, c), lambda mi, hi: (mi, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz * n, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((tm, c), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * kp * num_heads * c,
            bytes_accessed=(x.size * x.dtype.itemsize
                            + w.size * x.dtype.itemsize * m_tiles_total
                            + bsz * n * c * x.dtype.itemsize),
            transcendentals=bsz * n * c * (num_heads + 1),
        ),
    )(x_flat, w_heads, b_heads, lang_heads)
    return out.reshape(bsz, n, c)


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
    Pallas on TPU; plain XLA elsewhere (or under vmap/interpreters).
    """
    if jax.devices()[0].platform == "tpu":
        return _mutan_fused_fwd(x, w, b, lang, num_heads=num_heads)
    return _mutan_reference(x, w, b, lang, num_heads)


def _mutan_fwd(x, w, b, lang, num_heads):
    return mutan_fused(x, w, b, lang, num_heads), (x, w, b, lang)


def _mutan_bwd(num_heads, res, g):
    x, w, b, lang = res
    _, vjp = jax.vjp(
        lambda x_, w_, b_, l_: _mutan_reference(x_, w_, b_, l_, num_heads),
        x, w, b, lang)
    return vjp(g)


mutan_fused.defvjp(_mutan_fwd, _mutan_bwd)

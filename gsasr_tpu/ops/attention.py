"""Fused window attention for the Fea2GS decoder stack (Pallas, TPU).

The decoder is a stack of 38 window-attention layers (cross + self,
`/root/reference/utils/fea2gs.py:116-194,284-350`); its hot loop is
``softmax(q @ k^T * scale + bias) @ v`` over thousands of small static
windows (e.g. 225 windows x 6 heads x 144 tokens x 30 head-dim at the
180^2 -> 720^2 benchmark).

Measured reality (BENCH_NOTES "Round 3"): XLA's einsum composition was
*not* HBM-materialization-bound at these window sizes — the fused kernel
alone moved the decoder stage ~0% (131.5 vs 129.3 ms A/B). The op-level
trace showed the stage is dominated by *layout copies* (the
(B, T, nh, hd) <-> (B, nh, T, hd) head transposes around every attention
call, ~32 ms/fwd) and elementwise fusion chains, with the actual matmuls
at only ~13 ms. The packed-layout variant below
(`window_attention_packed`) is the response: it takes the projections'
natural (B, T, C) layout and splits heads inside the kernel, removing
the transpose copies from the HLO entirely.

This kernel keeps a whole window's attention in VMEM: one grid step loads
a block of windows for one head, computes logits + bias, takes a float32
softmax and applies it to V without ever writing the logits to HBM.
Windows are small (<= a few hundred tokens), so no flash-style online
softmax is needed — the full (Tq, Tk) tile fits comfortably.

Backward: ``jax.custom_vjp``. The packed variant's VJP is a second Pallas
kernel that recomputes the softmax per window in VMEM and applies the
attention backward (dq/dk/dv + accumulated dbias) without materializing
the (Tq, Tk) probabilities or their gradients in HBM — the
memory-for-FLOPs trade that suits TPU training. The 4D variants'
backward differentiates the einsum composition (one extra forward).

Layout notes (why this is TPU-first rather than a CUDA translation):
- grid = (head, window-blocks): the rel-pos bias block depends only on the
  head index, so it stays resident in VMEM across the whole window sweep;
- Tq/Tk land on the sublane/lane axes (144 -> 2 lane tiles); hd=30 rides
  the contraction where MXU padding is cheapest;
- dots are issued with ``preferred_element_type=float32`` and the softmax
  is computed in float32 regardless of the model dtype (matches the
  reference's fp32-softmax AMP behavior).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_block_b(n: int, target: int = 16) -> int:
    """Largest divisor of n that is <= target (avoids padding the window
    axis; window counts are composite in practice: b * h/ws * w/ws)."""
    for cand in range(min(target, n), 0, -1):
        if n % cand == 0:
            return cand
    return 1


def _block_b_with_pad(n: int, target: int) -> tuple[int, int]:
    """Window-axis blocking with a pad fallback: prefer an exact divisor
    <= target, but if the only divisor is 1 (prime n, e.g. an odd
    batch x window-count mix) pad the axis up to a multiple of `target`
    rather than degenerating to a (nh x n) grid of single-window steps.
    Returns (block, padded_n)."""
    wb = _pick_block_b(n, target)
    if wb == 1 and n > target:
        return target, ((n + target - 1) // target) * target
    return wb, n


def _pad_axis0(x, n_pad: int):
    if x.shape[0] == n_pad:
        return x
    pad = n_pad - x.shape[0]
    return jnp.concatenate(
        [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    # q_ref: (WB, 1, Tq, hd); k_ref/v_ref: (WB, 1, Tk, hd);
    # bias_ref: (1, Tq, Tk) f32; o_ref: (WB, 1, Tq, hd).
    bias = bias_ref[0]
    wb = q_ref.shape[0]
    for w in range(wb):
        q = q_ref[w, 0]
        k = k_ref[w, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s * scale + bias
        # float32 softmax, numerically-stable (row max subtracted).
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[w, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[w, 0] = o.astype(o_ref.dtype)


def _attn_kernel_bwd(q_ref, k_ref, v_ref, bias_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, dbias_ref, *, scale: float):
    """Recompute-in-VMEM backward for the 4D (B, nh, T, hd) layout: per
    window, rebuild the softmax and apply the attention VJP; dbias
    accumulates across the window sweep of each head (block revisits are
    consecutive — i is the fastest grid axis, the block depends on h)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    bias = bias_ref[0]
    wb = q_ref.shape[0]
    for w in range(wb):
        q = q_ref[w, 0]
        k = k_ref[w, 0]
        v = v_ref[w, 0]
        g = g_ref[w, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s * scale + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        dv = jax.lax.dot_general(
            p, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_ref[0] += ds
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dq_ref[w, 0] = dq.astype(dq_ref.dtype)
        dk_ref[w, 0] = dk.astype(dk_ref.dtype)
        dv_ref[w, 0] = dv.astype(dv_ref.dtype)


def _attention_pallas_bwd(q, k, v, bias, g, scale):
    b, nh, tq, hd = q.shape
    tk = k.shape[2]
    if bias is None:
        bias_arr = jnp.zeros((nh, tq, tk), jnp.float32)
    else:
        bias_arr = bias.astype(jnp.float32)

    wb, bp = _block_b_with_pad(b, 16)
    q, k, v, g = (_pad_axis0(x, bp) for x in (q, k, v, g))
    grid = (nh, bp // wb)
    qspec = pl.BlockSpec((wb, 1, tq, hd), lambda h, i: (i, h, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((wb, 1, tk, hd), lambda h, i: (i, h, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, tq, tk), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM)
    flops_step = 2 * tq * tk * hd * 5 * wb
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_attn_kernel_bwd, scale=scale),
        grid=grid,
        in_specs=[qspec, kspec, kspec, bspec, qspec],
        out_specs=[qspec, kspec, kspec, bspec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype),
                   jax.ShapeDtypeStruct((nh, tq, tk), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops_step * nh * (bp // wb),
            bytes_accessed=4 * (q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bp * nh * tq * tk),
        interpret=_interpret(),
    )(q, k, v, bias_arr, g)
    if bp != b:
        dq, dk, dv = dq[:b], dk[:b], dv[:b]
    dbias = None if bias is None else dbias.astype(bias.dtype)
    return dq, dk, dv, dbias


def _attention_reference(q, k, v, bias, scale):
    """Plain composition (the pre-kernel decoder path) — used for the
    backward pass and as the numeric oracle in tests."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if bias is not None:
        s = s + bias[None].astype(s.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _attention_pallas(q, k, v, bias, scale):
    b, nh, tq, hd = q.shape
    tk = k.shape[2]
    if bias is None:
        bias = jnp.zeros((nh, tq, tk), jnp.float32)
    bias = bias.astype(jnp.float32)

    wb, bp = _block_b_with_pad(b, 16)
    q, k, v = (_pad_axis0(x, bp) for x in (q, k, v))
    grid = (nh, bp // wb)
    qspec = pl.BlockSpec((wb, 1, tq, hd), lambda h, i: (i, h, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((wb, 1, tk, hd), lambda h, i: (i, h, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((wb, 1, tk, hd), lambda h, i: (i, h, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, tq, tk), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM)
    flops_step = 2 * tq * tk * hd * 2 * wb
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[qspec, kspec, vspec, bspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_step * nh * (bp // wb),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bp * nh * tq * tk),
        interpret=_interpret(),
    )(q, k, v, bias)
    return out[:b] if bp != b else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_window_attention(q, k, v, bias, scale: float):
    """softmax(q @ k^T * scale + bias) @ v without materializing logits.

    q: (B, nh, Tq, hd); k, v: (B, nh, Tk, hd); bias: (nh, Tq, Tk) or None
    (additive, broadcast over B — the rel-pos-bias shape of
    `fea2gs.py:147-153,320-326`). Returns (B, nh, Tq, hd) in q's dtype.
    """
    return _attention_pallas(q, k, v, bias, scale)


def _fwa_fwd(q, k, v, bias, scale):
    return _attention_pallas(q, k, v, bias, scale), (q, k, v, bias)


def _fwa_bwd(scale, res, g):
    q, k, v, bias = res
    return _attention_pallas_bwd(q, k, v, bias, g, scale)


fused_window_attention.defvjp(_fwa_fwd, _fwa_bwd)


def window_attention(q, k, v, bias: Optional[jax.Array] = None,
                     *, scale: Optional[float] = None,
                     window_mask: Optional[jax.Array] = None) -> jax.Array:
    """Public entry: fused on TPU, interpreter elsewhere (same kernel).

    window_mask: optional (nW, Tq, Tk) additive mask where window row
    ``i`` of the (B*nW, ...) operands receives ``window_mask[i % nW]`` —
    the Swin SW-MSA 9-region mask convention (`swinir.py:231-242`,
    applied per window class after the head bias). The masked 4D path is
    the XLA einsum composition (models use the packed masked kernel,
    `window_attention_packed(window_mask=...)`).

    Set GSASR_ATTN=reference to route through the plain einsum composition
    (used by the per-stage profiling harness to A/B the kernel; read at
    trace time, so set it before the first jit of a model).
    """
    import os

    if scale is None:
        scale = q.shape[-1] ** -0.5
    if window_mask is not None:
        if q.shape[0] % window_mask.shape[0] != 0:
            raise ValueError(
                f"window axis {q.shape[0]} not a multiple of mask period "
                f"{window_mask.shape[0]}")
        return _attention_reference_masked(q, k, v, bias, window_mask,
                                           float(scale))
    if os.environ.get("GSASR_ATTN", "fused") == "reference":
        return _attention_reference(q, k, v, bias, float(scale))
    return fused_window_attention(q, k, v, bias, float(scale))


# ---------------------------------------------------------------------------
# Masked variant: per-window-class additive mask (Swin SW-MSA / paper-HAT)
# ---------------------------------------------------------------------------
#
# The SW-MSA mask differs per *window class* with period nW along the
# window axis ((B*nW, nh, T, T) logits get mask[i % nW]); a (nh, Tq, Tk)
# bias cannot express it. The production path is the PACKED masked kernel
# below (`window_attention_packed(window_mask=...)`), which blocks the
# window axis in multiples that divide nW so each grid step's mask block
# is a static BlockSpec slice. The 4D `window_attention(window_mask=...)`
# entry stays on the XLA einsum composition — no model uses the 4D layout
# with masks anymore.


def _attention_reference_masked(q, k, v, bias, mask, scale):
    """Einsum composition with the per-window-class mask broadcast —
    backward path and numeric oracle (mirrors `swinir.py:236-241`)."""
    if mask is None:
        return _attention_reference(q, k, v, bias, scale)
    b, nh, tq, _ = q.shape
    tk = k.shape[2]
    nw = mask.shape[0]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if bias is not None:
        s = s + bias[None].astype(s.dtype)
    s = s.reshape(b // nw, nw, nh, tq, tk) + mask[None, :, None]
    s = s.reshape(b, nh, tq, tk)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)




# ---------------------------------------------------------------------------
# Packed-layout variant: (B, T, C) in/out, heads split inside the kernel
# ---------------------------------------------------------------------------
#
# Motivation (measured, BENCH_NOTES r3): at the 180^2 benchmark the decoder
# spends ~32 ms/fwd in XLA layout copies, a large share of which are the
# (B, T, nh, hd) <-> (B, nh, T, hd) transposes around every attention call
# (36 self-attn layers x q/k/v/out). Taking the projections' natural
# (B, T, C) layout straight into the kernel and slicing heads on the lane
# axis (static 30-column slices, in-VMEM relayout) removes those HBM
# round-trips entirely.


def _attn_kernel_packed(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                        scale: float, num_heads: int):
    # q_ref/o_ref: (WB, Tq, C); k_ref/v_ref: (WB, Tk, C);
    # bias_ref: (nh, Tq, Tk) f32 (whole table resident in VMEM).
    wb, tq, c = q_ref.shape
    hd = c // num_heads
    for w in range(wb):
        q = q_ref[w]
        k = k_ref[w]
        v = v_ref[w]
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * scale + bias_ref[h]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[w, :, sl] = o.astype(o_ref.dtype)


def _attention_packed_pallas(q, k, v, bias, scale, num_heads):
    b, tq, c = q.shape
    tk = k.shape[1]
    if bias is None:
        bias = jnp.zeros((num_heads, tq, tk), jnp.float32)
    bias = bias.astype(jnp.float32)

    wb, bp = _block_b_with_pad(b, 8)
    q, k, v = (_pad_axis0(x, bp) for x in (q, k, v))
    grid = (bp // wb,)
    qspec = pl.BlockSpec((wb, tq, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((wb, tk, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((num_heads, tq, tk), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    hd = c // num_heads
    flops_step = 2 * tq * tk * hd * 2 * wb * num_heads
    out = pl.pallas_call(
        functools.partial(_attn_kernel_packed, scale=scale,
                          num_heads=num_heads),
        grid=grid,
        in_specs=[qspec, kspec, kspec, bspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_step * (bp // wb),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bp * num_heads * tq * tk),
        interpret=_interpret(),
    )(q, k, v, bias)
    return out[:b] if bp != b else out


def _attn_kernel_packed_bwd(q_ref, k_ref, v_ref, bias_ref, g_ref,
                            dq_ref, dk_ref, dv_ref, dbias_ref, *,
                            scale: float, num_heads: int):
    """Recompute-in-VMEM backward: per window/head, rebuild the softmax and
    apply the standard attention VJP without ever writing the (Tq, Tk)
    probabilities or their gradients to HBM. dbias accumulates across the
    window grid (same-block revisiting, zero-initialized at step 0)."""
    wb, tq, c = q_ref.shape
    hd = c // num_heads
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for w in range(wb):
        q = q_ref[w]
        k = k_ref[w]
        v = v_ref[w]
        g = g_ref[w]
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * scale + bias_ref[h]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)  # (tq, tk) f32
            gh = g[:, sl]
            # dv = p^T g
            dv = jax.lax.dot_general(
                p, gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # dp = g v^T ; ds = p * (dp - rowsum(dp * p))
            dp = jax.lax.dot_general(
                gh, v[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dbias_ref[h] += ds
            dq = jax.lax.dot_general(
                ds, k[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(
                ds, q[:, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dq_ref[w, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[w, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[w, :, sl] = dv.astype(dv_ref.dtype)


def _attention_packed_pallas_bwd(q, k, v, bias, g, scale, num_heads):
    b, tq, c = q.shape
    tk = k.shape[1]
    if bias is None:
        bias_arr = jnp.zeros((num_heads, tq, tk), jnp.float32)
    else:
        bias_arr = bias.astype(jnp.float32)

    wb, bp = _block_b_with_pad(b, 8)
    q, k, v, g = (_pad_axis0(x, bp) for x in (q, k, v, g))
    grid = (bp // wb,)
    qspec = pl.BlockSpec((wb, tq, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((wb, tk, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((num_heads, tq, tk), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    hd = c // num_heads
    # fwd recompute + 4 bwd dots per head
    flops_step = 2 * tq * tk * hd * 5 * wb * num_heads
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_attn_kernel_packed_bwd, scale=scale,
                          num_heads=num_heads),
        grid=grid,
        in_specs=[qspec, kspec, kspec, bspec, qspec],
        out_specs=[qspec, kspec, kspec, bspec],
        out_shape=[jax.ShapeDtypeStruct((bp, tq, c), q.dtype),
                   jax.ShapeDtypeStruct((bp, tk, c), k.dtype),
                   jax.ShapeDtypeStruct((bp, tk, c), v.dtype),
                   jax.ShapeDtypeStruct((num_heads, tq, tk), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops_step * (bp // wb),
            bytes_accessed=4 * (q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bp * num_heads * tq * tk),
        interpret=_interpret(),
    )(q, k, v, bias_arr, g)
    if bp != b:
        dq, dk, dv = dq[:b], dk[:b], dv[:b]
    dbias = None if bias is None else dbias.astype(bias.dtype)
    return dq, dk, dv, dbias


def _attention_packed_reference(q, k, v, bias, scale, num_heads):
    """BTNH einsum composition (no explicit transposes) — backward path
    and numeric oracle for the packed kernel."""
    b, tq, c = q.shape
    tk = k.shape[1]
    hd = c // num_heads
    qh = q.reshape(b, tq, num_heads, hd)
    kh = k.reshape(b, tk, num_heads, hd)
    vh = v.reshape(b, tk, num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
    if bias is not None:
        s = s + bias[None].astype(s.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vh)
    return o.reshape(b, tq, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _packed_window_attention(q, k, v, bias, scale: float, num_heads: int):
    return _attention_packed_pallas(q, k, v, bias, scale, num_heads)


def _pwa_fwd(q, k, v, bias, scale, num_heads):
    return (_attention_packed_pallas(q, k, v, bias, scale, num_heads),
            (q, k, v, bias))


def _pwa_bwd(scale, num_heads, res, g):
    q, k, v, bias = res
    return _attention_packed_pallas_bwd(q, k, v, bias, g, scale, num_heads)


_packed_window_attention.defvjp(_pwa_fwd, _pwa_bwd)


def window_attention_packed(q, k, v, bias: Optional[jax.Array] = None,
                            *, num_heads: int,
                            scale: Optional[float] = None,
                            window_mask: Optional[jax.Array] = None
                            ) -> jax.Array:
    """Multi-head window attention on packed (B, T, C) operands.

    q: (B, Tq, C); k, v: (B, Tk, C); bias: (nh, Tq, Tk) or None. Heads are
    C split into `num_heads` contiguous slices (torch MultiheadAttention
    packing). window_mask: optional (nW, Tq, Tk) per-window-class additive
    mask, row ``i`` of the window axis receiving ``window_mask[i % nW]``
    (SW-MSA convention). Returns (B, Tq, C) in q's dtype — no
    (B, nh, T, hd) intermediate ever hits HBM.
    """
    import os

    if scale is None:
        scale = (q.shape[-1] // num_heads) ** -0.5
    if os.environ.get("GSASR_ATTN", "fused") == "reference":
        return _attention_packed_reference_masked(
            q, k, v, bias, window_mask, float(scale), num_heads)
    if window_mask is None:
        return _packed_window_attention(q, k, v, bias, float(scale),
                                        num_heads)
    return _masked_packed_window_attention(q, k, v, bias, window_mask,
                                           float(scale), num_heads)


def _attn_kernel_packed_masked(q_ref, k_ref, v_ref, bias_ref, mask_ref,
                               o_ref, *, scale: float, num_heads: int):
    # like _attn_kernel_packed plus a per-window mask block (WB, Tq, Tk).
    wb, tq, c = q_ref.shape
    hd = c // num_heads
    for w in range(wb):
        q = q_ref[w]
        k = k_ref[w]
        v = v_ref[w]
        m = mask_ref[w]
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * scale + bias_ref[h] + m
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[w, :, sl] = o.astype(o_ref.dtype)


def _pad_period(x, r: int, nw: int, nwp: int):
    """Pad the window-class period of a (r*nw, ...) tensor to (r*nwp, ...)
    with zeros inside each repeat (keeps `i % nwb` mask-block indexing
    valid after padding)."""
    if nwp == nw:
        return x
    xr = x.reshape(r, nw, *x.shape[1:])
    pad = jnp.zeros((r, nwp - nw, *x.shape[1:]), x.dtype)
    return jnp.concatenate([xr, pad], axis=1).reshape(r * nwp, *x.shape[1:])


def _attention_packed_pallas_masked(q, k, v, bias, mask, scale, num_heads):
    b, tq, c = q.shape
    tk = k.shape[1]
    nw = mask.shape[0]
    if b % nw != 0:
        raise ValueError(f"window axis {b} not a multiple of mask period "
                         f"{nw}")
    if bias is None:
        bias = jnp.zeros((num_heads, tq, tk), jnp.float32)
    bias = bias.astype(jnp.float32)
    mask = mask.astype(jnp.float32)

    # Pad fallback for non-composite window-class counts: pad the mask
    # period and the window axis together (zeros; padded windows are
    # sliced off below) instead of degenerating to a block-1 grid.
    r = b // nw
    wb, nwp = _block_b_with_pad(nw, 8)
    if nwp != nw:
        mask = _pad_axis0(mask, nwp)
        q, k, v = (_pad_period(x, r, nw, nwp) for x in (q, k, v))
    b_p = r * nwp
    grid = (b_p // wb,)
    qspec = pl.BlockSpec((wb, tq, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((wb, tk, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((num_heads, tq, tk), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    nwb = nwp // wb
    mspec = pl.BlockSpec((wb, tq, tk), lambda i: (i % nwb, 0, 0),
                         memory_space=pltpu.VMEM)
    hd = c // num_heads
    flops_step = 2 * tq * tk * hd * 2 * wb * num_heads
    out = pl.pallas_call(
        functools.partial(_attn_kernel_packed_masked, scale=scale,
                          num_heads=num_heads),
        grid=grid,
        in_specs=[qspec, kspec, kspec, bspec, mspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_step * (b_p // wb),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b_p * num_heads * tq * tk),
        interpret=_interpret(),
    )(q, k, v, bias, mask)
    if nwp != nw:
        out = out.reshape(r, nwp, tq, c)[:, :nw].reshape(b, tq, c)
    return out


def _attention_packed_reference_masked(q, k, v, bias, mask, scale,
                                       num_heads):
    if mask is None:
        return _attention_packed_reference(q, k, v, bias, scale, num_heads)
    b, tq, c = q.shape
    tk = k.shape[1]
    nw = mask.shape[0]
    hd = c // num_heads
    qh = q.reshape(b, tq, num_heads, hd)
    kh = k.reshape(b, tk, num_heads, hd)
    vh = v.reshape(b, tk, num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
    if bias is not None:
        s = s + bias[None].astype(s.dtype)
    s = s.reshape(b // nw, nw, num_heads, tq, tk) + mask[None, :, None]
    s = s.reshape(b, num_heads, tq, tk)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vh)
    return o.reshape(b, tq, c)


def _attn_kernel_packed_masked_bwd(q_ref, k_ref, v_ref, bias_ref, mask_ref,
                                   g_ref, dq_ref, dk_ref, dv_ref, dbias_ref,
                                   *, scale: float, num_heads: int):
    """Masked packed backward. Like `_attn_kernel_packed_bwd` plus the mask
    in the softmax recompute. No dmask is computed: at every call site the
    SW-MSA mask is a non-trainable roll-pattern constant, so its cotangent
    is zeros by construction (see `_mpwa_bwd`) and emitting per-window ds
    sums would be pure HBM traffic."""
    wb, tq, c = q_ref.shape
    hd = c // num_heads
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for w in range(wb):
        q = q_ref[w]
        k = k_ref[w]
        v = v_ref[w]
        g = g_ref[w]
        m = mask_ref[w]
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * scale + bias_ref[h] + m
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            gh = g[:, sl]
            dv = jax.lax.dot_general(
                p, gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                gh, v[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dbias_ref[h] += ds
            dq = jax.lax.dot_general(
                ds, k[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(
                ds, q[:, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dq_ref[w, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[w, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[w, :, sl] = dv.astype(dv_ref.dtype)


def _attention_packed_pallas_masked_bwd(q, k, v, bias, mask, g, scale,
                                        num_heads):
    b, tq, c = q.shape
    tk = k.shape[1]
    nw = mask.shape[0]
    if bias is None:
        bias_arr = jnp.zeros((num_heads, tq, tk), jnp.float32)
    else:
        bias_arr = bias.astype(jnp.float32)
    mask_f = mask.astype(jnp.float32)

    # Same pad fallback as the forward; padded windows have g = 0, so
    # every cotangent they produce (incl. the dbias accumulation) is 0.
    r = b // nw
    wb, nwp = _block_b_with_pad(nw, 8)
    if nwp != nw:
        mask_f = _pad_axis0(mask_f, nwp)
        q, k, v, g = (_pad_period(x, r, nw, nwp) for x in (q, k, v, g))
    b_p = r * nwp
    grid = (b_p // wb,)
    qspec = pl.BlockSpec((wb, tq, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((wb, tk, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((num_heads, tq, tk), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    nwb = nwp // wb
    mspec = pl.BlockSpec((wb, tq, tk), lambda i: (i % nwb, 0, 0),
                         memory_space=pltpu.VMEM)
    hd = c // num_heads
    flops_step = 2 * tq * tk * hd * 5 * wb * num_heads
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_attn_kernel_packed_masked_bwd, scale=scale,
                          num_heads=num_heads),
        grid=grid,
        in_specs=[qspec, kspec, kspec, bspec, mspec, qspec],
        out_specs=[qspec, kspec, kspec, bspec],
        out_shape=[jax.ShapeDtypeStruct((b_p, tq, c), q.dtype),
                   jax.ShapeDtypeStruct((b_p, tk, c), k.dtype),
                   jax.ShapeDtypeStruct((b_p, tk, c), v.dtype),
                   jax.ShapeDtypeStruct((num_heads, tq, tk), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops_step * (b_p // wb),
            bytes_accessed=4 * (q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b_p * num_heads * tq * tk),
        interpret=_interpret(),
    )(q, k, v, bias_arr, mask_f, g)
    if nwp != nw:
        unpad = lambda x, t: x.reshape(r, nwp, t, c)[:, :nw].reshape(
            b, t, c)
        dq, dk, dv = unpad(dq, tq), unpad(dk, tk), unpad(dv, tk)
    dbias = None if bias is None else dbias.astype(bias.dtype)
    # dmask: the SW-MSA mask is a non-trainable constant at every call
    # site (SwinIR/HAT shift patterns) — return a symbolic zero instead
    # of materializing a (B, Tq, Tk) ds-sum in HBM each step.
    return dq, dk, dv, dbias, jnp.zeros_like(mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _masked_packed_window_attention(q, k, v, bias, mask, scale: float,
                                    num_heads: int):
    return _attention_packed_pallas_masked(q, k, v, bias, mask, scale,
                                           num_heads)


def _mpwa_fwd(q, k, v, bias, mask, scale, num_heads):
    return (_attention_packed_pallas_masked(q, k, v, bias, mask, scale,
                                            num_heads),
            (q, k, v, bias, mask))


def _mpwa_bwd(scale, num_heads, res, g):
    q, k, v, bias, mask = res
    return _attention_packed_pallas_masked_bwd(q, k, v, bias, mask, g,
                                               scale, num_heads)


_masked_packed_window_attention.defvjp(_mpwa_fwd, _mpwa_bwd)

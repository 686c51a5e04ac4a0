"""Fused decoder-layer kernels (Pallas, TPU) — inference fast path.

The Fea2GS decoder stage is MEMORY-bound: 56 GB accessed / forward at the
180^2 benchmark = ~75% of v5e HBM bandwidth (BENCH_NOTES round 4). Its
per-window working set is tiny — a (144, 180) f32 token block is 104 KB
and a whole layer's weights ~1 MB — so whole sub-layer chains fit VMEM.
These kernels collapse the per-sublayer HBM round trips (LN read/write,
projection read/write, residual read) into one pass per sub-layer chain:

- `ln_mlp_residual`: out = resi + fc2(relu(fc1(LN(x + inj))))
  covering the decoder's [scale-inject -> pre-norm FFN] chains and the
  block-tail MLPs (LN optional, inj optional, resi defaults to x + inj).
- `ln_attn_proj`: out = proj(MHA(LN(x) (+pos) , kv, bias))
  the pre-norm windowed attention with its out-projection; the residual
  add stays outside because shifted layers un-permute the attention
  output before adding (LN commutes with the shift permutation, so the
  shift itself is a pure relayout between kernels).

Weights ride constant-index BlockSpecs (fetched once, resident across the
window sweep); softmax and LN statistics are computed in f32 regardless
of operand dtype. Inference-only: no custom VJP — training keeps the
unfused module path (`gsasr_tpu/models/fea2gs.py`), and
`gsasr_tpu/models/fea2gs_fast.py` asserts numerical parity between the
two on the same parameter tree.

Reference topology: `/root/reference/utils/fea2gs.py:197-448`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsasr_tpu.ops.attention import _block_b_with_pad, _pad_axis0


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln_f32(x, gamma, beta, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _k_ln_mlp(x_ref, resi_ref, inj_ref, ln_w_ref, ln_b_ref, w1_ref, b1_ref,
              w2_ref, b2_ref, o_ref, *, has_ln, has_inj, has_resi,
              zero_base):
    wb = x_ref.shape[0]
    for w in range(wb):
        t = x_ref[w].astype(jnp.float32)
        if has_inj:
            t = t + inj_ref[w].astype(jnp.float32)
        h = (_ln_f32(t, ln_w_ref[0], ln_b_ref[0]) if has_ln else t)
        h = h.astype(x_ref.dtype)
        z = _mm(h, w1_ref[...].astype(h.dtype)) + b1_ref[0].astype(
            jnp.float32)
        z = jnp.maximum(z, 0.0).astype(x_ref.dtype)
        z = _mm(z, w2_ref[...].astype(z.dtype)) + b2_ref[0].astype(
            jnp.float32)
        if zero_base:
            base = 0.0
        elif has_resi:
            base = resi_ref[w].astype(jnp.float32)
        else:
            base = t
        o_ref[w] = (base + z).astype(o_ref.dtype)


def ln_mlp_residual(x, *, w1, b1, w2, b2, ln_w=None, ln_b=None, inj=None,
                    resi=None, block_b: int = 8, zero_base: bool = False):
    """out = (0 | resi | x+inj) + fc2(relu(fc1(LN?(x + inj?)))).

    x: (B, T, C); inj: (B, C) broadcast over T; resi: (B, T, C) when the
    residual base differs from x+inj (decoder block tails); zero_base=True
    returns the bare MLP output (RoPE block tails, where a lattice conv
    sits between the MLP and the residual add).
    """
    b, t, c = x.shape
    hid = w1.shape[1]
    has_ln = ln_w is not None
    has_inj = inj is not None
    has_resi = resi is not None

    wb, bp = _block_b_with_pad(b, block_b)
    xp = _pad_axis0(x, bp)
    resip = _pad_axis0(resi, bp) if has_resi else jnp.zeros(
        (1, 1, 1), x.dtype)
    injp = (_pad_axis0(inj, bp)[:, None, :] if has_inj
            else jnp.zeros((1, 1, 1), x.dtype))
    ln_w2 = (ln_w.reshape(1, c) if has_ln else jnp.zeros((1, c), jnp.float32))
    ln_b2 = (ln_b.reshape(1, c) if has_ln else jnp.zeros((1, c), jnp.float32))

    grid = (bp // wb,)
    xspec = pl.BlockSpec((wb, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    rspec = (xspec if has_resi else
             pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM))
    ispec = (pl.BlockSpec((wb, 1, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM) if has_inj else
             pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM))
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    mat = lambda m, n: pl.BlockSpec((m, n), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_k_ln_mlp, has_ln=has_ln, has_inj=has_inj,
                          has_resi=has_resi, zero_base=zero_base),
        grid=grid,
        in_specs=[xspec, rspec, ispec, vec(c), vec(c), mat(c, hid),
                  vec(hid), mat(hid, c), vec(c)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((bp, t, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * t * c * hid * 2,
            bytes_accessed=(2 + has_resi) * bp * t * c * x.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(xp, resip, injp, ln_w2, ln_b2, w1, b1.reshape(1, hid), w2,
      b2.reshape(1, c))
    return out[:b]


def _rope_rotate(x, cos, sin):
    """Pair rotation on packed (t, c) f32 operands: even/odd lanes form the
    complex pairs; cos/sin are pair-duplicated (t, c) tables."""
    t, c = x.shape
    xr = x.reshape(t, c // 2, 2)
    xs = jnp.stack([-xr[..., 1], xr[..., 0]], axis=-1).reshape(t, c)
    return x * cos + xs * sin


def _k_ln_attn(x_ref, pos_ref, kv_ref, ln_w_ref, ln_b_ref, wq_ref, bq_ref,
               wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref, bias_ref,
               cosq_ref, sinq_ref, cosk_ref, sink_ref,
               o_ref, *, num_heads, scale, has_pos, has_kv, has_bias,
               has_rope):
    wb, t, c = x_ref.shape
    hd = c // num_heads
    for w in range(wb):
        xq = _ln_f32(x_ref[w].astype(jnp.float32), ln_w_ref[0], ln_b_ref[0])
        if has_pos:
            xq = xq + pos_ref[0].astype(jnp.float32)
        xq = xq.astype(x_ref.dtype)
        src = kv_ref[w] if has_kv else xq
        q = _mm(xq, wq_ref[...].astype(xq.dtype)) + bq_ref[0].astype(
            jnp.float32)
        k = _mm(src, wk_ref[...].astype(src.dtype)) + bk_ref[0].astype(
            jnp.float32)
        v = _mm(src, wv_ref[...].astype(src.dtype)) + bv_ref[0].astype(
            jnp.float32)
        if has_rope:
            # rotation in f32 (the reference disables autocast for RoPE)
            q = _rope_rotate(q, cosq_ref[0], sinq_ref[0])
            k = _rope_rotate(k, cosk_ref[0], sink_ref[0])
        q = q.astype(x_ref.dtype)
        k = k.astype(x_ref.dtype)
        v = v.astype(x_ref.dtype)
        outs = []
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * scale
            if has_bias:
                s = s + bias_ref[h]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append(o)
        att = jnp.concatenate(outs, axis=1)
        out = _mm(att.astype(x_ref.dtype),
                  wo_ref[...].astype(x_ref.dtype)) \
            + bo_ref[0].astype(jnp.float32)
        o_ref[w] = out.astype(o_ref.dtype)


def ln_attn_proj(x, *, wq, bq, wk, bk, wv, bv, wo, bo, ln_w, ln_b,
                 num_heads: int, bias=None, pos=None, kv=None, scale=None,
                 rope_cos_q=None, rope_sin_q=None, rope_cos_k=None,
                 rope_sin_k=None, block_b: int = 8):
    """out = proj(MHA(rope?(LN(x) (+pos)), kv | self, bias?)) — residual
    outside.

    x: (B, Tq, C); kv: (B, Tk, C) for cross-attention (un-normed, matching
    the decoder's feat windows) or None for self-attention; pos: (Tq, C)
    additive query positional embedding applied AFTER the LN (reference
    `fea2gs.py:217` x + query_pos); bias: (num_heads, Tq, Tk) f32 or None;
    rope_{cos,sin}_{q,k}: (T, C) pair-duplicated rotation tables f32 (the
    Enhanced family's mixed RoPE, `fea2gsropeamp.py:107-150`) applied to
    the projected q/k in-kernel.
    """
    b, tq, c = x.shape
    tk = kv.shape[1] if kv is not None else tq
    if scale is None:
        scale = (c // num_heads) ** -0.5
    has_pos = pos is not None
    has_kv = kv is not None
    has_bias = bias is not None
    has_rope = rope_cos_q is not None

    wb, bp = _block_b_with_pad(b, block_b)
    xp = _pad_axis0(x, bp)
    kvp = (_pad_axis0(kv, bp) if has_kv else jnp.zeros((1, 1, 1), x.dtype))
    posp = (pos[None].astype(x.dtype) if has_pos
            else jnp.zeros((1, 1, 1), x.dtype))

    grid = (bp // wb,)
    xspec = pl.BlockSpec((wb, tq, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = (pl.BlockSpec((wb, tk, c), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM) if has_kv else
              pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM))
    pspec = (pl.BlockSpec((1, tq, c), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM) if has_pos else
             pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM))
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    mat = lambda m, n: pl.BlockSpec((m, n), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    bspec = (pl.BlockSpec((num_heads, tq, tk), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM) if has_bias else
             pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM))
    bias_in = (bias.astype(jnp.float32) if has_bias
               else jnp.zeros((1, 1, 1), jnp.float32))
    if has_rope:
        ropes = [r.reshape(1, *r.shape).astype(jnp.float32)
                 for r in (rope_cos_q, rope_sin_q, rope_cos_k, rope_sin_k)]
        rspecs = [pl.BlockSpec((1, r.shape[1], c), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM) for r in ropes]
    else:
        ropes = [jnp.zeros((1, 1, 1), jnp.float32)] * 4
        rspecs = [pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)] * 4

    hd = c // num_heads
    out = pl.pallas_call(
        functools.partial(_k_ln_attn, num_heads=num_heads,
                          scale=float(scale), has_pos=has_pos,
                          has_kv=has_kv, has_bias=has_bias,
                          has_rope=has_rope),
        grid=grid,
        in_specs=[xspec, pspec, kvspec, vec(c), vec(c),
                  mat(c, c), vec(c), mat(c, c), vec(c), mat(c, c), vec(c),
                  mat(c, c), vec(c), bspec, *rspecs],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((bp, tq, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * (4 * tq * c * c + 2 * tq * tk * hd * num_heads),
            bytes_accessed=(2 + has_kv) * bp * tq * c * x.dtype.itemsize,
            transcendentals=bp * num_heads * tq * tk),
        interpret=_interpret(),
    )(xp, posp, kvp, ln_w.reshape(1, c), ln_b.reshape(1, c),
      wq, bq.reshape(1, c), wk, bk.reshape(1, c), wv, bv.reshape(1, c),
      wo, bo.reshape(1, c), bias_in, *ropes)
    return out[:b]

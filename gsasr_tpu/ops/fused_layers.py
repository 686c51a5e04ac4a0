"""Fused decoder-layer kernels (Pallas, TPU) — inference AND training.

The Fea2GS decoder stage is MEMORY-bound: 56 GB accessed / forward at the
180^2 benchmark = ~75% of v5e HBM bandwidth (BENCH_NOTES round 4). Its
per-window working set is tiny — a (144, 180) f32 token block is 104 KB
and a whole layer's weights ~1 MB — so whole sub-layer chains fit VMEM.
These kernels collapse the per-sublayer HBM round trips (LN read/write,
projection read/write, residual read) into one pass per sub-layer chain:

- `ln_mlp_residual`: out = (0 | resi | x+inj) + fc2(relu(fc1(LN?(x+inj))))
  covering the decoder's [scale-inject -> pre-norm FFN] chains and the
  block-tail MLPs (LN optional, inj optional, resi defaults to x + inj).
- `ln_attn_proj`: out = proj(MHA(rope?(LN(x) (+pos)), kv, bias?))
  the pre-norm windowed attention with its out-projection; the residual
  add stays outside because shifted layers un-permute the attention
  output before adding (LN commutes with the shift permutation, so the
  shift itself is a pure relayout between kernels). RoPE rotations (the
  Enhanced family) run in-kernel on the projected q/k.

Weights ride constant-index BlockSpecs (fetched once, resident across the
window sweep); softmax, LN statistics and RoPE rotations are computed in
f32 regardless of operand dtype.

Training (r5, VERDICT r4 #2): both layers carry `jax.custom_vjp` with
recompute-in-VMEM backward kernels — the forward intermediates (LN
output, relu pre-activation, attention probabilities) are rebuilt
per-window in VMEM and never hit HBM, mirroring the attention kernels in
`gsasr_tpu/ops/attention.py`. Weight/bias/bias-table/RoPE-table gradients
accumulate across the grid in constant-index output blocks (zeroed at
step 0). Gradient parity vs the unfused module path is asserted by
`tests/test_fused_backward.py`.

Reference topology: `/root/reference/utils/fea2gs.py:197-448` and the
training hot loop it serves,
`/root/reference/TrainTestGSASR/basicsr/models/gsasr_model.py:175-280`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsasr_tpu.ops.attention import _block_b_with_pad, _pad_axis0

_EPS = 1e-5


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln_f32(x, gamma, beta, eps=_EPS):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)


def _ln_stats(t, eps=_EPS):
    """LN forward pieces for recompute: (y, inv_sigma), f32."""
    mu = jnp.mean(t, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(t - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (t - mu) * inv, inv


def _ln_bwd(dh, y, inv, gamma):
    """d(LN_in) given d(LN_out); returns (dt, dgamma_row, dbeta_row)."""
    dg = jnp.sum(dh * y, axis=0, keepdims=True)
    db = jnp.sum(dh, axis=0, keepdims=True)
    dyh = dh * gamma.astype(jnp.float32)
    dt = inv * (dyh - jnp.mean(dyh, axis=-1, keepdims=True)
                - y * jnp.mean(dyh * y, axis=-1, keepdims=True))
    return dt, dg, db


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_tt(a, b):
    """a (m, k) x b (n, k) -> (m, n): contract the trailing dims."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_ll(a, b):
    """a (k, m) x b (k, n) -> (m, n): contract the leading dims."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _rope_shuffle(x):
    """Pairwise (even, odd) -> (-odd, even) on the lane axis, expressed as
    lane rolls + an even-lane select (reshape/stack on the minor dims does
    not lower through Mosaic)."""
    t, c = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, c), 1)
    even = (lane % 2) == 0
    return jnp.where(even, -jnp.roll(x, -1, axis=1), jnp.roll(x, 1, axis=1))


def _rope_rotate(x, cos, sin):
    """Pair rotation on packed (t, c) f32 operands: even/odd lanes form the
    complex pairs; cos/sin MUST be pair-duplicated (t, c) tables (constant
    within each pair) — the backward treats the map as a true rotation and
    transposes it by negating sin, which only holds under that layout."""
    return x * cos + _rope_shuffle(x) * sin


# ---------------------------------------------------------------------------
# ln_mlp_residual
# ---------------------------------------------------------------------------


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


def _k_ln_mlp_bwd(x_ref, inj_ref, ln_w_ref, ln_b_ref, w1_ref, b1_ref,
                  w2_ref, b2_ref, g_ref,
                  dx_ref, dinj_ref, dlnw_ref, dlnb_ref, dw1_ref, db1_ref,
                  dw2_ref, db2_ref, *, has_ln, has_inj, base_is_t):
    """Recompute-in-VMEM backward of `_k_ln_mlp` (resi branch handled
    outside: d(resi) = g). Weight/LN grads accumulate across the grid."""
    wb = x_ref.shape[0]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dlnw_ref[...] = jnp.zeros_like(dlnw_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    for w in range(wb):
        t = x_ref[w].astype(jnp.float32)
        if has_inj:
            t = t + inj_ref[w].astype(jnp.float32)
        if has_ln:
            y, inv = _ln_stats(t)
            h_f = y * ln_w_ref[0].astype(jnp.float32) + \
                ln_b_ref[0].astype(jnp.float32)
        else:
            h_f = t
        h = h_f.astype(x_ref.dtype)
        z1p = _mm(h, w1_ref[...].astype(h.dtype)) + b1_ref[0].astype(
            jnp.float32)
        z1 = jnp.maximum(z1p, 0.0).astype(x_ref.dtype)

        g = g_ref[w].astype(jnp.float32)
        gd = g.astype(x_ref.dtype)
        dw2_ref[...] += _mm_ll(z1, gd)
        db2_ref[...] += jnp.sum(g, axis=0, keepdims=True)
        dz1 = _mm_tt(gd, w2_ref[...].astype(gd.dtype))
        dz1 = jnp.where(z1p > 0.0, dz1, 0.0)
        dz1d = dz1.astype(x_ref.dtype)
        dw1_ref[...] += _mm_ll(h, dz1d)
        db1_ref[...] += jnp.sum(dz1, axis=0, keepdims=True)
        dh = _mm_tt(dz1d, w1_ref[...].astype(dz1d.dtype))
        if has_ln:
            dt, dgam, dbet = _ln_bwd(dh, y, inv, ln_w_ref[0])
            dlnw_ref[...] += dgam
            dlnb_ref[...] += dbet
        else:
            dt = dh
        if base_is_t:
            dt = dt + g
        dx_ref[w] = dt.astype(dx_ref.dtype)
        if has_inj:
            dinj_ref[w] = jnp.sum(dt, axis=0, keepdims=True).astype(
                dinj_ref.dtype)


def _mlp_specs(st):
    (has_ln, has_inj, has_resi, zero_base, wb, t, c, hid) = st
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
    return xspec, rspec, ispec, vec, mat


def _ln_mlp_fwd_call(st, xp, resip, injp, ln_w2, ln_b2, w1, b1r, w2, b2r):
    (has_ln, has_inj, has_resi, zero_base, wb, t, c, hid) = st
    bp = xp.shape[0]
    xspec, rspec, ispec, vec, mat = _mlp_specs(st)
    return pl.pallas_call(
        functools.partial(_k_ln_mlp, has_ln=has_ln, has_inj=has_inj,
                          has_resi=has_resi, zero_base=zero_base),
        grid=(bp // wb,),
        in_specs=[xspec, rspec, ispec, vec(c), vec(c), mat(c, hid),
                  vec(hid), mat(hid, c), vec(c)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((bp, t, c), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * t * c * hid * 2,
            bytes_accessed=(2 + has_resi) * bp * t * c * xp.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(xp, resip, injp, ln_w2, ln_b2, w1, b1r, w2, b2r)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ln_mlp_core(st, xp, resip, injp, ln_w2, ln_b2, w1, b1r, w2, b2r):
    return _ln_mlp_fwd_call(st, xp, resip, injp, ln_w2, ln_b2, w1, b1r, w2,
                            b2r)


def _ln_mlp_core_fwd(st, *args):
    return _ln_mlp_fwd_call(st, *args), args


def _ln_mlp_core_bwd(st, res, g):
    (has_ln, has_inj, has_resi, zero_base, wb, t, c, hid) = st
    xp, resip, injp, ln_w2, ln_b2, w1, b1r, w2, b2r = res
    bp = xp.shape[0]
    wbb = 2 if bp % 2 == 0 else 1  # smaller block: bwd holds ~3x the temps
    stb = (has_ln, has_inj, has_resi, zero_base, wbb, t, c, hid)
    xspec, _, ispec, vec, mat = _mlp_specs(stb)
    dinj_spec = (ispec if has_inj else
                 pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM))
    dinj_shape = ((bp, 1, c) if has_inj else (1, 1, 1))
    outs = pl.pallas_call(
        functools.partial(_k_ln_mlp_bwd, has_ln=has_ln, has_inj=has_inj,
                          base_is_t=not (zero_base or has_resi)),
        grid=(bp // wbb,),
        in_specs=[xspec, ispec, vec(c), vec(c), mat(c, hid), vec(hid),
                  mat(hid, c), vec(c), xspec],
        out_specs=[xspec, dinj_spec, vec(c), vec(c), mat(c, hid), vec(hid),
                   mat(hid, c), vec(c)],
        out_shape=[jax.ShapeDtypeStruct((bp, t, c), xp.dtype),
                   jax.ShapeDtypeStruct(dinj_shape, xp.dtype),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((c, hid), jnp.float32),
                   jax.ShapeDtypeStruct((1, hid), jnp.float32),
                   jax.ShapeDtypeStruct((hid, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * t * c * hid * 6,
            bytes_accessed=4 * bp * t * c * xp.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(xp, injp, ln_w2, ln_b2, w1, b1r, w2, b2r, g)
    dxp, dinjp, dlnw, dlnb, dw1, db1, dw2, db2 = outs
    dresip = (g.astype(resip.dtype) if has_resi
              else jnp.zeros_like(resip))
    if not has_inj:
        dinjp = jnp.zeros_like(injp)
    if not has_ln:
        dlnw = jnp.zeros_like(ln_w2)
        dlnb = jnp.zeros_like(ln_b2)
    return (dxp, dresip, dinjp, dlnw, dlnb, dw1.astype(w1.dtype),
            db1.astype(b1r.dtype), dw2.astype(w2.dtype),
            db2.astype(b2r.dtype))


_ln_mlp_core.defvjp(_ln_mlp_core_fwd, _ln_mlp_core_bwd)


def ln_mlp_residual(x, *, w1, b1, w2, b2, ln_w=None, ln_b=None, inj=None,
                    resi=None, block_b: int = 8, zero_base: bool = False):
    """out = (0 | resi | x+inj) + fc2(relu(fc1(LN?(x + inj?)))).

    x: (B, T, C); inj: (B, C) broadcast over T; resi: (B, T, C) when the
    residual base differs from x+inj (decoder block tails); zero_base=True
    returns the bare MLP output (RoPE block tails, where a lattice conv
    sits between the MLP and the residual add). Differentiable in all
    array arguments (recompute-in-VMEM custom VJP).
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

    st = (has_ln, has_inj, has_resi, zero_base, wb, t, c, hid)
    out = _ln_mlp_core(st, xp, resip, injp, ln_w2, ln_b2, w1,
                       b1.reshape(1, hid), w2, b2.reshape(1, c))
    return out[:b]


# ---------------------------------------------------------------------------
# ln_attn_proj
# ---------------------------------------------------------------------------


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
            s = _mm_tt(q[:, sl], k[:, sl])
            s = s * scale
            if has_bias:
                s = s + bias_ref[h]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = _mm(p.astype(v.dtype), v[:, sl])
            outs.append(o)
        att = jnp.concatenate(outs, axis=1)
        out = _mm(att.astype(x_ref.dtype),
                  wo_ref[...].astype(x_ref.dtype)) \
            + bo_ref[0].astype(jnp.float32)
        o_ref[w] = out.astype(o_ref.dtype)


def _k_ln_attn_bwd(x_ref, pos_ref, kv_ref, ln_w_ref, ln_b_ref, wq_ref,
                   bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                   bias_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref, g_ref,
                   dx_ref, dkv_ref, dpos_ref, dlnw_ref, dlnb_ref,
                   dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                   dwo_ref, dbo_ref, dbias_ref,
                   dcq_ref, dsq_ref, dck_ref, dsk_ref, *,
                   num_heads, scale, has_pos, has_kv, has_bias, has_rope):
    """Recompute-in-VMEM backward of `_k_ln_attn`: per window rebuild
    LN -> projections -> (RoPE) -> per-head softmax, then run the standard
    attention/projection/LN VJP chain. Shared-parameter grads (weights,
    biases, LN, attention-bias table, RoPE tables, pos) accumulate across
    the grid in constant-index blocks."""
    wb, t, c = x_ref.shape
    hd = c // num_heads
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for r in (dpos_ref, dlnw_ref, dlnb_ref, dwq_ref, dbq_ref, dwk_ref,
                  dbk_ref, dwv_ref, dbv_ref, dwo_ref, dbo_ref, dbias_ref,
                  dcq_ref, dsq_ref, dck_ref, dsk_ref):
            r[...] = jnp.zeros_like(r)

    dt_ = x_ref.dtype
    for w in range(wb):
        # ---- forward recompute -----------------------------------------
        tf = x_ref[w].astype(jnp.float32)
        y, inv = _ln_stats(tf)
        xq_f = y * ln_w_ref[0].astype(jnp.float32) + \
            ln_b_ref[0].astype(jnp.float32)
        if has_pos:
            xq_f = xq_f + pos_ref[0].astype(jnp.float32)
        xq = xq_f.astype(dt_)
        src = kv_ref[w] if has_kv else xq
        q0 = _mm(xq, wq_ref[...].astype(xq.dtype)) + bq_ref[0].astype(
            jnp.float32)
        k0 = _mm(src, wk_ref[...].astype(src.dtype)) + bk_ref[0].astype(
            jnp.float32)
        v0 = _mm(src, wv_ref[...].astype(src.dtype)) + bv_ref[0].astype(
            jnp.float32)
        if has_rope:
            q = _rope_rotate(q0, cosq_ref[0], sinq_ref[0])
            k = _rope_rotate(k0, cosk_ref[0], sink_ref[0])
        else:
            q, k = q0, k0
        qd = q.astype(dt_)
        kd = k.astype(dt_)
        vd = v0.astype(dt_)
        ps, outs = [], []
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = _mm_tt(qd[:, sl], kd[:, sl]) * scale
            if has_bias:
                s = s + bias_ref[h]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            ps.append(p)
            outs.append(_mm(p.astype(vd.dtype), vd[:, sl]))
        att = jnp.concatenate(outs, axis=1).astype(dt_)

        # ---- backward ---------------------------------------------------
        g = g_ref[w].astype(jnp.float32)
        gd = g.astype(dt_)
        dwo_ref[...] += _mm_ll(att, gd)
        dbo_ref[...] += jnp.sum(g, axis=0, keepdims=True)
        datt = _mm_tt(gd, wo_ref[...].astype(gd.dtype))
        dq_parts, dk_parts, dv_parts = [], [], []
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            p = ps[h]
            gh = datt[:, sl].astype(dt_)
            dv_parts.append(_mm_ll(p.astype(dt_), gh))
            dp = _mm_tt(gh, vd[:, sl])
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            if has_bias:
                dbias_ref[h] += ds
            dsd = ds.astype(dt_)
            dq_parts.append(_mm(dsd, kd[:, sl]) * scale)
            dk_parts.append(_mm_ll(dsd, qd[:, sl]) * scale)
        dq = jnp.concatenate(dq_parts, axis=1)
        dk = jnp.concatenate(dk_parts, axis=1)
        dv = jnp.concatenate(dv_parts, axis=1)
        if has_rope:
            dcq_ref[...] += dq * q0
            dsq_ref[...] += dq * _rope_shuffle(q0)
            dck_ref[...] += dk * k0
            dsk_ref[...] += dk * _rope_shuffle(k0)
            dq0 = _rope_rotate(dq, cosq_ref[0], -sinq_ref[0])
            dk0 = _rope_rotate(dk, cosk_ref[0], -sink_ref[0])
        else:
            dq0, dk0 = dq, dk
        dq0d = dq0.astype(dt_)
        dk0d = dk0.astype(dt_)
        dvd = dv.astype(dt_)
        dwq_ref[...] += _mm_ll(xq, dq0d)
        dbq_ref[...] += jnp.sum(dq0, axis=0, keepdims=True)
        dwk_ref[...] += _mm_ll(src, dk0d)
        dbk_ref[...] += jnp.sum(dk0, axis=0, keepdims=True)
        dwv_ref[...] += _mm_ll(src, dvd)
        dbv_ref[...] += jnp.sum(dv, axis=0, keepdims=True)
        dxq = _mm_tt(dq0d, wq_ref[...].astype(dt_))
        dsrc = _mm_tt(dk0d, wk_ref[...].astype(dt_)) + \
            _mm_tt(dvd, wv_ref[...].astype(dt_))
        if has_kv:
            dkv_ref[w] = dsrc.astype(dkv_ref.dtype)
        else:
            dxq = dxq + dsrc
        if has_pos:
            dpos_ref[...] += dxq[None]
        dt_ln, dgam, dbet = _ln_bwd(dxq, y, inv, ln_w_ref[0])
        dlnw_ref[...] += dgam
        dlnb_ref[...] += dbet
        dx_ref[w] = dt_ln.astype(dx_ref.dtype)


def _attn_specs(st):
    (num_heads, scale, has_pos, has_kv, has_bias, has_rope, wb, tq, tk,
     c) = st
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
    if has_rope:
        rq = pl.BlockSpec((1, tq, c), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
        rk = pl.BlockSpec((1, tk, c), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
        rspecs = [rq, rq, rk, rk]
    else:
        rspecs = [pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)] * 4
    return xspec, kvspec, pspec, vec, mat, bspec, rspecs


def _ln_attn_fwd_call(st, xp, posp, kvp, ln_w2, ln_b2, wq, bq2, wk, bk2, wv,
                      bv2, wo, bo2, bias_in, cq, sq, ck, sk):
    (num_heads, scale, has_pos, has_kv, has_bias, has_rope, wb, tq, tk,
     c) = st
    bp = xp.shape[0]
    xspec, kvspec, pspec, vec, mat, bspec, rspecs = _attn_specs(st)
    hd = c // num_heads
    return pl.pallas_call(
        functools.partial(_k_ln_attn, num_heads=num_heads, scale=scale,
                          has_pos=has_pos, has_kv=has_kv, has_bias=has_bias,
                          has_rope=has_rope),
        grid=(bp // wb,),
        in_specs=[xspec, pspec, kvspec, vec(c), vec(c),
                  mat(c, c), vec(c), mat(c, c), vec(c), mat(c, c), vec(c),
                  mat(c, c), vec(c), bspec, *rspecs],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((bp, tq, c), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * (4 * tq * c * c + 2 * tq * tk * hd * num_heads),
            bytes_accessed=(2 + has_kv) * bp * tq * c * xp.dtype.itemsize,
            transcendentals=bp * num_heads * tq * tk),
        interpret=_interpret(),
    )(xp, posp, kvp, ln_w2, ln_b2, wq, bq2, wk, bk2, wv, bv2, wo, bo2,
      bias_in, cq, sq, ck, sk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ln_attn_core(st, xp, posp, kvp, ln_w2, ln_b2, wq, bq2, wk, bk2, wv,
                  bv2, wo, bo2, bias_in, cq, sq, ck, sk):
    return _ln_attn_fwd_call(st, xp, posp, kvp, ln_w2, ln_b2, wq, bq2, wk,
                             bk2, wv, bv2, wo, bo2, bias_in, cq, sq, ck, sk)


def _ln_attn_core_fwd(st, *args):
    return _ln_attn_fwd_call(st, *args), args


def _ln_attn_core_bwd(st, res, g):
    (num_heads, scale, has_pos, has_kv, has_bias, has_rope, wb, tq, tk,
     c) = st
    (xp, posp, kvp, ln_w2, ln_b2, wq, bq2, wk, bk2, wv, bv2, wo, bo2,
     bias_in, cq, sq, ck, sk) = res
    bp = xp.shape[0]
    wbb = 2 if bp % 2 == 0 else 1
    stb = (num_heads, scale, has_pos, has_kv, has_bias, has_rope, wbb, tq,
           tk, c)
    xspec, kvspec, pspec, vec, mat, bspec, rspecs = _attn_specs(stb)
    dpos_spec = (pl.BlockSpec((1, tq, c), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM) if has_pos else
                 pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM))
    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((bp, tq, c), xp.dtype),            # dx
        jax.ShapeDtypeStruct(kvp.shape if has_kv else (1, 1, 1),
                             kvp.dtype),                        # dkv
        jax.ShapeDtypeStruct((1, tq, c) if has_pos else (1, 1, 1), f32),
        jax.ShapeDtypeStruct((1, c), f32),                      # dlnw
        jax.ShapeDtypeStruct((1, c), f32),                      # dlnb
        jax.ShapeDtypeStruct((c, c), f32),                      # dwq
        jax.ShapeDtypeStruct((1, c), f32),
        jax.ShapeDtypeStruct((c, c), f32),                      # dwk
        jax.ShapeDtypeStruct((1, c), f32),
        jax.ShapeDtypeStruct((c, c), f32),                      # dwv
        jax.ShapeDtypeStruct((1, c), f32),
        jax.ShapeDtypeStruct((c, c), f32),                      # dwo
        jax.ShapeDtypeStruct((1, c), f32),
        jax.ShapeDtypeStruct((num_heads, tq, tk) if has_bias else (1, 1, 1),
                             f32),                              # dbias
        jax.ShapeDtypeStruct((1, tq, c) if has_rope else (1, 1, 1), f32),
        jax.ShapeDtypeStruct((1, tq, c) if has_rope else (1, 1, 1), f32),
        jax.ShapeDtypeStruct((1, tk, c) if has_rope else (1, 1, 1), f32),
        jax.ShapeDtypeStruct((1, tk, c) if has_rope else (1, 1, 1), f32),
    ]
    dposb = (pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM))
    out_specs = [
        xspec, kvspec, (dpos_spec if has_pos else dposb), vec(c), vec(c),
        mat(c, c), vec(c), mat(c, c), vec(c), mat(c, c), vec(c), mat(c, c),
        vec(c), bspec, *rspecs,
    ]
    hd = c // num_heads
    outs = pl.pallas_call(
        functools.partial(_k_ln_attn_bwd, num_heads=num_heads, scale=scale,
                          has_pos=has_pos, has_kv=has_kv, has_bias=has_bias,
                          has_rope=has_rope),
        grid=(bp // wbb,),
        in_specs=[xspec, pspec, kvspec, vec(c), vec(c),
                  mat(c, c), vec(c), mat(c, c), vec(c), mat(c, c), vec(c),
                  mat(c, c), vec(c), bspec, *rspecs, xspec],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * (12 * tq * c * c
                            + 5 * tq * tk * hd * num_heads),
            bytes_accessed=5 * bp * tq * c * xp.dtype.itemsize,
            transcendentals=bp * num_heads * tq * tk),
        interpret=_interpret(),
    )(xp, posp, kvp, ln_w2, ln_b2, wq, bq2, wk, bk2, wv, bv2, wo, bo2,
      bias_in, cq, sq, ck, sk, g)
    (dxp, dkvp, dposp, dlnw, dlnb, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo,
     dbias, dcq, dsq, dck, dsk) = outs
    if not has_kv:
        dkvp = jnp.zeros_like(kvp)
    if has_pos:
        dposp = dposp.astype(posp.dtype)
    else:
        dposp = jnp.zeros_like(posp)
    if not has_bias:
        dbias = jnp.zeros_like(bias_in)
    if not has_rope:
        dcq, dsq, dck, dsk = (jnp.zeros_like(a) for a in (cq, sq, ck, sk))
    else:
        dcq, dsq, dck, dsk = (a.astype(b.dtype) for a, b in
                              ((dcq, cq), (dsq, sq), (dck, ck), (dsk, sk)))
    return (dxp, dposp, dkvp, dlnw, dlnb, dwq.astype(wq.dtype), dbq, dwk,
            dbk, dwv, dbv, dwo, dbo, dbias.astype(bias_in.dtype), dcq, dsq,
            dck, dsk)


_ln_attn_core.defvjp(_ln_attn_core_fwd, _ln_attn_core_bwd)


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
    the projected q/k in-kernel. Differentiable in all array arguments
    (recompute-in-VMEM custom VJP).
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
    bias_in = (bias.astype(jnp.float32) if has_bias
               else jnp.zeros((1, 1, 1), jnp.float32))
    if has_rope:
        cq, sq, ck, sk = (r.reshape(1, *r.shape).astype(jnp.float32)
                          for r in (rope_cos_q, rope_sin_q, rope_cos_k,
                                    rope_sin_k))
    else:
        cq = sq = ck = sk = jnp.zeros((1, 1, 1), jnp.float32)

    st = (num_heads, float(scale), has_pos, has_kv, has_bias, has_rope, wb,
          tq, tk, c)
    out = _ln_attn_core(st, xp, posp, kvp, ln_w.reshape(1, c),
                        ln_b.reshape(1, c), wq, bq.reshape(1, c), wk,
                        bk.reshape(1, c), wv, bv.reshape(1, c), wo,
                        bo.reshape(1, c), bias_in, cq, sq, ck, sk)
    return out[:b]

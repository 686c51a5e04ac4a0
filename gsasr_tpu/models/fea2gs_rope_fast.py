"""Fused inference fast-path for the Enhanced `Fea2GSRopeAMP` decoder.

Functional re-expression of `Fea2GSRopeAMP.__call__` over the SAME
parameter tree, with every [scale-inject -> FFN], [pre-norm RoPE attention
-> proj] and block-tail MLP running as one fused Pallas kernel
(`gsasr_tpu/ops/fused_layers.py`) — the same memory-bound argument as the
paper fast path (`fea2gs_fast.py`), applied to the family the reference
actually recommends (`/root/reference/README.md:206-209`).

RoPE rotations run in-kernel on the projected q/k (f32, matching the
reference's autocast-disabled RoPE, `fea2gsropeamp.py:107-150`); the
pair-duplicated cos/sin tables are precomputed per layer from the
learnable frequencies. The 3x3 lattice convs (block tails + conv_final)
stay XLA — convs are MXU-native and already fuse their neighbours.

dtype=jnp.bfloat16 runs the trunk in bf16 with f32 LN/softmax/RoPE
in-kernel and fp32 UPNet + Gaussian-parameter heads (the fp32-heads
recipe; BENCH_NOTES r4) — this IS the reference AMP semantics for the
Enhanced/Ultra families (`gsasr_amp_model.py:208`, heads leaving autocast
at the render boundary).

Numerical parity with `Fea2GSRopeAMP.apply` (fp32) is asserted by
`tests/test_fea2gs_rope_fast.py` on the same random parameters.

Reference topology: `/root/reference/utils/fea2gsropeamp.py:518-719`.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gsasr_tpu.models.fea2gs import reference_points, window_partition
from gsasr_tpu.models.fea2gs_fast import (_dense, _inject, _ln_plain,
                                          _mlp_kernels, _attn_kernels,
                                          _ln_args, _to_lattice,
                                          _from_lattice)
from gsasr_tpu.models.fea2gs_rope import Fea2GSRopeAMP, rope_phases, rope_t_xy
from gsasr_tpu.models.common import pixel_shuffle
from gsasr_tpu.ops.fused_layers import ln_attn_proj, ln_mlp_residual


def _convd(p, x, dtype):
    """3x3 conv in the trunk dtype (flax Conv(dtype=...) semantics)."""
    k = p["kernel"].astype(dtype)
    b = p["bias"].astype(dtype)
    return jax.lax.conv_general_dilated(
        x.astype(dtype), k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def _rope_tables(freqs, end: int, n: int, num_heads: int):
    """Learnable freqs (2, nh, hd/2) -> pair-duplicated (n, C) cos/sin."""
    t_x, t_y = rope_t_xy(end, end)
    ph = rope_phases(freqs, jnp.asarray(t_x), jnp.asarray(t_y))  # (nh,N,hdh)
    ph = ph[:, :n]

    def expand(t):
        t = jnp.repeat(t[..., None], 2, axis=-1)      # (nh, n, hdh, 2)
        return t.transpose(1, 0, 2, 3).reshape(n, -1)  # (n, nh*hd)

    return expand(jnp.cos(ph)), expand(jnp.sin(ph))


def fea2gs_rope_apply_fused(m: Fea2GSRopeAMP, variables, srcs, scale,
                            dtype=None):
    """Fused-kernel equivalent of `m.apply(variables, srcs, scale)`.

    dtype=None runs fp32 end-to-end (bitwise-comparable to the module
    path); dtype=jnp.bfloat16 = bf16 trunk + fp32 UPNet/heads.
    """
    params = variables["params"] if "params" in variables else variables
    b, h, w, _ = srcs.shape
    ws = m.window_size
    ch = m.channel
    nh = m.num_heads
    nsq = int(math.sqrt(m.num_gs_seed))
    h_count, w_count = h // ws, w // ws
    nwin = h_count * w_count
    dt = jnp.float32 if dtype is None else dtype
    end_cross = max(nsq, ws)

    query = jnp.tile(params["gs_embedding"][None].astype(dt),
                     (b * nwin, 1, 1))
    query_pos = params["pos_embedding"].astype(dt)  # (T, C), same all wins

    inv_scale = (1.0 / scale)[:, None].astype(dt)
    se = jnp.maximum(_dense(params["scale_mlp_0"],
                            inv_scale.astype(dt)).astype(dt), 0)
    se = _dense(params["scale_mlp_2"], se).astype(dt)
    scale_embedding = jnp.repeat(se, nwin, axis=0)  # (B_, C)

    feat = jnp.maximum(_convd(params["img_feat_proj_0"], srcs.astype(dt),
                              dt), 0)
    feat = _convd(params["img_feat_proj_2"], feat, dt)

    # -- window cross-attn blocks ----------------------------------------
    for bi in range(m.num_crossattn_blocks):
        bp = params[f"window_crossattn_blocks_{bi}"]
        resi_block = query
        x = _ln_plain(bp["norm"], query)
        for li in range(m.num_crossattn_layers):
            lp = bp[f"blocks_{li}"]
            shift = 0 if li % 2 == 0 else ws // 2
            inj = _inject(lp["gs_cross_attn_scale"], scale_embedding)
            # norm1 is dead compute (resi + inj); sublayers 1+2 fuse
            x = ln_mlp_residual(x, inj=inj.astype(dt),
                                **_mlp_kernels(lp["mlp_crossattn_scale"]),
                                **_ln_args(lp["norm2"]))
            f = feat
            if shift > 0:
                f = jnp.roll(f, (-shift, -shift), axis=(1, 2))
            feat_w = window_partition(f, ws)
            cos, sin = _rope_tables(
                lp["window_cross_attn"]["rope_freqs"], end_cross,
                m.num_gs_seed, nh)
            a = ln_attn_proj(x, pos=query_pos, kv=feat_w, num_heads=nh,
                             rope_cos_q=cos, rope_sin_q=sin,
                             rope_cos_k=cos[:ws * ws],
                             rope_sin_k=sin[:ws * ws],
                             **_attn_kernels(lp["window_cross_attn"]),
                             **_ln_args(lp["norm3"]))
            x = x + a
            x = ln_mlp_residual(x,
                                **_mlp_kernels(lp["mlp_crossattn_feature"]),
                                **_ln_args(lp["norm4"]))
        tail = dict(w1=bp["mlp_0"]["kernel"], b1=bp["mlp_0"]["bias"],
                    w2=bp["mlp_2"]["kernel"], b2=bp["mlp_2"]["bias"])
        t = ln_mlp_residual(x, zero_base=True, **tail)
        lat = _to_lattice(t, b, h_count, w_count, nsq, ch)
        lat = _convd(bp["conv"], lat, dt)
        query = resi_block + _from_lattice(lat, nsq)

    # -- gs self-attn blocks ---------------------------------------------
    resi_outer = query
    for bi in range(m.num_selfattn_blocks):
        bp = params[f"gs_selfattn_blocks_{bi}"]
        resi_block = query
        x = _ln_plain(bp["norm"], query)
        for li in range(m.num_selfattn_layers):
            lp = bp[f"blocks_{li}"]
            shift = 0 if li % 2 == 0 else nsq // 2
            inj = _inject(lp["gs_cross_attn_scale"], scale_embedding)
            # norm3 is dead compute (resi + inj)
            x = ln_mlp_residual(x, inj=inj.astype(dt),
                                **_mlp_kernels(lp["mlp_crossattn"]),
                                **_ln_args(lp["norm4"]))
            cos, sin = _rope_tables(lp["gs_self_attn"]["rope_freqs"], nsq,
                                    m.num_gs_seed, nh)
            rope = dict(rope_cos_q=cos, rope_sin_q=sin, rope_cos_k=cos,
                        rope_sin_k=sin)
            if shift > 0:
                # LN commutes with the lattice roll (see fea2gs_fast.py)
                full = _to_lattice(x, b, h_count, w_count, nsq, ch)
                full = jnp.roll(full, (-shift, -shift), axis=(1, 2))
                u = _from_lattice(full, nsq)
                a = ln_attn_proj(u, num_heads=nh, **rope,
                                 **_attn_kernels(lp["gs_self_attn"]),
                                 **_ln_args(lp["norm1"]))
                full = _to_lattice(a, b, h_count, w_count, nsq, ch)
                full = jnp.roll(full, (shift, shift), axis=(1, 2))
                a = _from_lattice(full, nsq)
            else:
                a = ln_attn_proj(x, num_heads=nh, **rope,
                                 **_attn_kernels(lp["gs_self_attn"]),
                                 **_ln_args(lp["norm1"]))
            x = x + a
            x = ln_mlp_residual(x, **_mlp_kernels(lp["mlp_selfattn"]),
                                **_ln_args(lp["norm2"]))
        tail = dict(w1=bp["mlp_0"]["kernel"], b1=bp["mlp_0"]["bias"],
                    w2=bp["mlp_2"]["kernel"], b2=bp["mlp_2"]["bias"])
        t = ln_mlp_residual(x, zero_base=True, **tail)
        lat = _to_lattice(t, b, h_count, w_count, nsq, ch)
        lat = _convd(bp["conv"], lat, dt)
        query = resi_block + _from_lattice(lat, nsq)

    # -- conv_final + long residual, UPNet, heads (fp32) -----------------
    lat = _to_lattice(query, b, h_count, w_count, nsq, ch)
    lat = _convd(params["conv_final"], lat, dt)
    resi_lat = _to_lattice(resi_outer, b, h_count, w_count, nsq, ch)
    query = (lat + resi_lat).astype(jnp.float32)

    query = _convd(params["upnet_0"], query, jnp.float32)
    query = pixel_shuffle(query, m.shuffle_scale1)
    query = _convd(params["upnet_2"], query, jnp.float32)
    query = pixel_shuffle(query, m.shuffle_scale2)

    def head(p, out_dim):
        x = jnp.maximum(_dense(p["fc0"], query), 0.0)
        x = jnp.maximum(_dense(p["fc2"], x), 0.0)
        return _dense(p["fc4"], x).reshape(b, -1, out_dim)

    guf = int(m.gs_up_factor)
    q_sigma = head(params["mlp_block_sigma"], 2 * guf)
    q_rho = head(params["mlp_block_rho"], 1 * guf)
    q_alpha = head(params["mlp_block_alpha"], 1 * guf)
    q_rgb = head(params["mlp_block_rgb"], 3 * guf)
    q_mean = head(params["mlp_block_mean"], 2 * guf)

    lat_h = nsq * h_count * m.shuffle_scale1 * m.shuffle_scale2
    lat_w = nsq * w_count * m.shuffle_scale1 * m.shuffle_scale2
    q_mean = q_mean / jnp.array([[lat_w, lat_h]], q_mean.dtype)
    q_mean = q_mean + reference_points(lat_h, lat_w, q_mean.dtype)[None]

    return jnp.concatenate([q_sigma, q_rho, q_alpha, q_rgb, q_mean],
                           axis=-1)

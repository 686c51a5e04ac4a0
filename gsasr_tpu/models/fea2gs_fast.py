"""Fused inference fast-path for the paper Fea2GS decoder.

A functional re-expression of `Fea2GS.__call__` over the SAME parameter
tree (checkpoints, converters and training are untouched), with every
[scale-inject -> FFN], [pre-norm attention -> proj] and block-tail chain
running as one fused Pallas kernel (`gsasr_tpu/ops/fused_layers.py`)
instead of a string of HBM round trips — the decoder stage is memory-
bound at ~75% of v5e HBM bandwidth (56 GB/forward, BENCH_NOTES round 4),
so collapsing sublayer traffic is the remaining lever at fixed dtype.

Shifted layers stay exact: LN commutes with the lattice roll, so the
shift becomes a pure relayout between kernels and the attention output is
un-rolled before its residual add, exactly like the module path
(reference `/root/reference/utils/fea2gs.py:197-448`).

Numerical parity with `Fea2GS.apply` is asserted by
`tests/test_fea2gs_fast.py` on the same random parameters.

Usage: `gs = fea2gs_apply_fused(module, {"params": params}, srcs, scale)`
— a drop-in for `module.apply(...)` at inference.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gsasr_tpu.models.fea2gs import (Fea2GS, cross_attn_rel_pos_index,
                                     reference_points,
                                     self_attn_rel_pos_index,
                                     window_partition)
from gsasr_tpu.models.common import pixel_shuffle
from gsasr_tpu.ops.fused_layers import ln_attn_proj, ln_mlp_residual


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _conv3(p, x):
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]


def _inject(p, scale_embedding):
    """ScaleInject: out_proj(v_proj(scale)) — (B_, C)."""
    v = _dense(p["v_proj"], scale_embedding)
    return _dense(p["out_proj"], v)


def _mlp_kernels(p):
    return dict(w1=p["fc1"]["kernel"], b1=p["fc1"]["bias"],
                w2=p["fc2"]["kernel"], b2=p["fc2"]["bias"])


def _attn_kernels(p):
    return dict(wq=p["qhead"]["kernel"], bq=p["qhead"]["bias"],
                wk=p["khead"]["kernel"], bk=p["khead"]["bias"],
                wv=p["vhead"]["kernel"], bv=p["vhead"]["bias"],
                wo=p["proj"]["kernel"], bo=p["proj"]["bias"])


def _ln_args(p):
    return dict(ln_w=p["scale"], ln_b=p["bias"])


def _to_lattice(gs, b, h_count, w_count, nsq, ch):
    full = gs.reshape(b, h_count, w_count, nsq, nsq, ch)
    return full.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h_count * nsq, w_count * nsq, ch)


def _from_lattice(full, nsq):
    return window_partition(full, nsq)


def fea2gs_apply_fused(m: Fea2GS, variables, srcs, scale, dtype=None):
    """Fused-kernel equivalent of `m.apply(variables, srcs, scale)`.

    dtype=jnp.bfloat16 runs the TRUNK (attention/FFN layer stack) in bf16
    while LN/softmax statistics stay f32 in-kernel and the UPNet + the
    five Gaussian-parameter heads stay fp32 (the fp32_heads recipe — bf16
    head outputs measured -1.1 to -1.4 dB, BENCH_NOTES r4). Trunk
    activations are the decoder's HBM traffic, so this halves the
    memory-bound floor without touching parameter precision."""
    params = variables["params"] if "params" in variables else variables
    b, h, w, _ = srcs.shape
    ws = m.window_size
    ch = m.channel
    nh = m.num_heads
    nsq = int(math.sqrt(m.num_gs_seed))
    h_count, w_count = h // ws, w // ws
    nwin = h_count * w_count

    query = jnp.tile(params["gs_embedding"][None], (b * nwin, 1, 1))
    query_pos = params["pos_embedding"]

    inv_scale = (1.0 / scale)[:, None]
    se = jnp.maximum(_dense(params["scale_mlp_0"], inv_scale), 0.0)
    se = _dense(params["scale_mlp_2"], se)
    scale_embedding = jnp.repeat(se, nwin, axis=0)  # (B_, C)

    feat = jnp.maximum(_conv3(params["img_feat_proj_0"], srcs), 0.0)
    feat = _conv3(params["img_feat_proj_2"], feat)

    if dtype is not None:
        query = query.astype(dtype)
        feat = feat.astype(dtype)

    # -- window cross-attn blocks ---------------------------------------
    idx_cross = cross_attn_rel_pos_index(nsq, ws)
    for bi in range(m.num_crossattn_blocks):
        bp = params[f"window_crossattn_blocks_{bi}"]
        resi_block = query
        x = _ln_plain(bp["norm"], query)
        for li in range(m.num_crossattn_layers):
            lp = bp[f"blocks_{li}"]
            shift = 0 if li % 2 == 0 else ws // 2
            inj = _inject(lp["gs_cross_attn_scale"], scale_embedding)
            # norm1 is dead compute in the reference topology; sublayers
            # 1+2 fuse into one kernel: x = t + MLP(LN2(t)), t = x + inj
            x = ln_mlp_residual(x, inj=inj,
                                **_mlp_kernels(lp["mlp_crossattn_scale"]),
                                **_ln_args(lp["norm2"]))
            f = feat
            if shift > 0:
                f = jnp.roll(f, (-shift, -shift), axis=(1, 2))
            feat_w = window_partition(f, ws)
            table = lp["window_cross_attn"]["relative_position_bias_table"]
            bias = table[idx_cross.reshape(-1)].reshape(
                m.num_gs_seed, ws * ws, nh).transpose(2, 0, 1)
            a = ln_attn_proj(x, pos=query_pos, kv=feat_w, bias=bias,
                             num_heads=nh,
                             **_attn_kernels(lp["window_cross_attn"]),
                             **_ln_args(lp["norm3"]))
            x = x + a
            x = ln_mlp_residual(x,
                                **_mlp_kernels(lp["mlp_crossattn_feature"]),
                                **_ln_args(lp["norm4"]))
        tail = dict(w1=bp["mlp_0"]["kernel"], b1=bp["mlp_0"]["bias"],
                    w2=bp["mlp_2"]["kernel"], b2=bp["mlp_2"]["bias"])
        query = ln_mlp_residual(x, resi=resi_block, **tail)

    # -- gs self-attn blocks --------------------------------------------
    idx_self = self_attn_rel_pos_index(nsq)
    resi_outer = query
    for bi in range(m.num_selfattn_blocks):
        bp = params[f"gs_selfattn_blocks_{bi}"]
        resi_block = query
        x = _ln_plain(bp["norm"], query)
        for li in range(m.num_selfattn_layers):
            lp = bp[f"blocks_{li}"]
            shift = 0 if li % 2 == 0 else nsq // 2
            inj = _inject(lp["gs_cross_attn_scale"], scale_embedding)
            x = ln_mlp_residual(x, inj=inj,
                                **_mlp_kernels(lp["mlp_crossattn"]),
                                **_ln_args(lp["norm4"]))
            table = lp["gs_self_attn"]["relative_position_bias_table"]
            bias = table[idx_self.reshape(-1)].reshape(
                m.num_gs_seed, m.num_gs_seed, nh).transpose(2, 0, 1)
            if shift > 0:
                # LN commutes with the roll: shift x, run the uniform
                # LN+attn+proj kernel, un-shift the output, then add the
                # (unshifted) residual — exact vs the module path.
                full = _to_lattice(x, b, h_count, w_count, nsq, ch)
                full = jnp.roll(full, (-shift, -shift), axis=(1, 2))
                u = _from_lattice(full, nsq)
                a = ln_attn_proj(u, bias=bias, num_heads=nh,
                                 **_attn_kernels(lp["gs_self_attn"]),
                                 **_ln_args(lp["norm1"]))
                full = _to_lattice(a, b, h_count, w_count, nsq, ch)
                full = jnp.roll(full, (shift, shift), axis=(1, 2))
                a = _from_lattice(full, nsq)
            else:
                a = ln_attn_proj(x, bias=bias, num_heads=nh,
                                 **_attn_kernels(lp["gs_self_attn"]),
                                 **_ln_args(lp["norm1"]))
            x = x + a
            x = ln_mlp_residual(x, **_mlp_kernels(lp["mlp_selfattn"]),
                                **_ln_args(lp["norm2"]))
        tail = dict(w1=bp["mlp_0"]["kernel"], b1=bp["mlp_0"]["bias"],
                    w2=bp["mlp_2"]["kernel"], b2=bp["mlp_2"]["bias"])
        query = ln_mlp_residual(x, resi=resi_block, **tail)
    query = query + resi_outer

    # -- lattice, UPNet, heads (fp32 regardless of trunk dtype) ---------
    query = query.astype(jnp.float32)
    query = _to_lattice(query, b, h_count, w_count, nsq, ch)
    query = _conv3(params["upnet_0"], query)
    query = pixel_shuffle(query, m.shuffle_scale1)
    query = _conv3(params["upnet_2"], query)
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


def _ln_plain(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(x.dtype)

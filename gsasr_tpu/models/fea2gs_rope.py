"""Fea2GS_ROPE_AMP decoder ("Enhanced" model family).

Mirrors `/root/reference/utils/fea2gsropeamp.py:518-719`. Differences from
the paper decoder (gsasr_tpu/models/fea2gs.py):

- relative-position bias tables are replaced by **mixed RoPE**: learnable
  per-head 2D frequencies (`init_random_2d_freqs`, :91-105) rotate Q/K by
  ``angle = t_x freq_x + t_y freq_y`` over the (row-major flattened) token
  lattice (`compute_cis`/`apply_rotary_emb`, :107-150);
- attention is plain scaled-dot-product (the reference uses
  F.scaled_dot_product_attention / FlashAttention; XLA fuses the same math);
- each cross/self block ends with a 3x3 conv on the re-assembled lattice
  (:332-345, :503-515);
- `conv_final` + long residual from the post-cross-attention query
  (:628, :686-694);
- default channel 192.

bf16 AMP: pass dtype=jnp.bfloat16; RoPE phases are always computed in fp32
(the reference disables autocast there, :110-114).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gsasr_tpu.models.common import MLP, pixel_shuffle
from gsasr_tpu.models.fea2gs import (HeadMLP, ScaleInject, reference_points,
                                     window_partition)


def rope_t_xy(end_x: int, end_y: int):
    """Row-major lattice coordinates (`fea2gsropeamp.py:84-89`)."""
    t = np.arange(end_x * end_y, dtype=np.float32)
    return t % end_x, np.floor(t / end_x)


def rope_freqs_init(head_dim: int, num_heads: int, theta: float = 10.0):
    """Learnable mixed-RoPE frequency init (`fea2gsropeamp.py:91-105`).

    Returns (2, num_heads, head_dim // 2) float32 [freqs_x, freqs_y].
    """
    def init(key, shape, dtype=jnp.float32):
        mag = 1.0 / (theta ** (np.arange(0, head_dim, 4)[: head_dim // 4]
                               .astype(np.float32) / head_dim))
        angles = jax.random.uniform(key, (num_heads, 1)) * 2 * jnp.pi
        mag_j = jnp.asarray(mag)[None]  # (1, hd//4)
        fx = jnp.concatenate([mag_j * jnp.cos(angles),
                              mag_j * jnp.cos(jnp.pi / 2 + angles)], axis=-1)
        fy = jnp.concatenate([mag_j * jnp.sin(angles),
                              mag_j * jnp.sin(jnp.pi / 2 + angles)], axis=-1)
        return jnp.stack([fx, fy], axis=0).astype(dtype)

    return init


def rope_phases(freqs, t_x, t_y):
    """(2, nh, hd/2) x (N,) -> (nh, N, hd/2) rotation angles, fp32."""
    fx = freqs[0].astype(jnp.float32)  # (nh, hd/2)
    fy = freqs[1].astype(jnp.float32)
    return (t_x[None, :, None] * fx[:, None, :]
            + t_y[None, :, None] * fy[:, None, :])


def apply_rope(x, phases):
    """Rotate feature pairs: x (B, nh, N, hd); phases (nh, N', hd/2) with
    N' >= N (sliced). Complex multiply as real rotation, fp32, cast back.
    (Numeric oracle for `apply_rope_packed`, which the models use.)"""
    b, nh, n, hd = x.shape
    dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(b, nh, n, hd // 2, 2)
    cos = jnp.cos(phases[:, :n])[None, :, :, :]
    sin = jnp.sin(phases[:, :n])[None, :, :, :]
    real = xf[..., 0] * cos - xf[..., 1] * sin
    imag = xf[..., 0] * sin + xf[..., 1] * cos
    return jnp.stack([real, imag], axis=-1).reshape(b, nh, n, hd).astype(dtype)


def apply_rope_packed(x, phases, num_heads: int):
    """RoPE on packed (B, N, C) operands, C = nh * hd in torch
    MultiheadAttention head packing. Pure reshapes (no transposes) so the
    rotation fuses into the surrounding elementwise chain and the packed
    attention kernel's layout is preserved end-to-end."""
    b, n, c = x.shape
    hdh = phases.shape[2]  # hd // 2
    dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(b, n, num_heads, hdh, 2)
    ph = phases[:, :n].transpose(1, 0, 2)[None]  # (1, n, nh, hdh)
    cos = jnp.cos(ph)
    sin = jnp.sin(ph)
    real = xf[..., 0] * cos - xf[..., 1] * sin
    imag = xf[..., 0] * sin + xf[..., 1] * cos
    return jnp.stack([real, imag], axis=-1).reshape(b, n, c).astype(dtype)


def _sdpa_packed(q, k, v, num_heads: int):
    """Packed-layout SDPA (the reference's F.scaled_dot_product_attention /
    FlashAttention): heads split inside the kernel — no (B, nh, N, hd)
    intermediates in HBM (see ops/attention.py)."""
    from gsasr_tpu.ops.attention import window_attention_packed
    return window_attention_packed(q, k, v, None, num_heads=num_heads)


class RopeWindowCrossAttn(nn.Module):
    """`fea2gsropeamp.py:185-250`."""
    dim: int
    num_heads: int
    window_size: int
    num_gs_seed: int
    rope_theta: float = 10.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, gs, feat):
        nh = self.num_heads
        nsq = int(math.sqrt(self.num_gs_seed))
        end = max(nsq, self.window_size)
        t_x, t_y = rope_t_xy(end, end)

        freqs = self.param("rope_freqs",
                           rope_freqs_init(self.dim // nh, nh,
                                           self.rope_theta),
                           (2, nh, self.dim // nh // 2))
        phases = rope_phases(freqs, jnp.asarray(t_x), jnp.asarray(t_y))

        q = nn.Dense(self.dim, dtype=self.dtype, name="qhead")(gs)
        k = nn.Dense(self.dim, dtype=self.dtype, name="khead")(feat)
        v = nn.Dense(self.dim, dtype=self.dtype, name="vhead")(feat)
        q = apply_rope_packed(q, phases, nh)
        k = apply_rope_packed(k, phases, nh)
        out = _sdpa_packed(q, k, v, nh)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class RopeGSSelfAttn(nn.Module):
    """`fea2gsropeamp.py:352-417`."""
    dim: int
    num_heads: int
    num_gs_seed_sqrt: int
    rope_theta: float = 10.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, gs):
        nh = self.num_heads
        t_x, t_y = rope_t_xy(self.num_gs_seed_sqrt, self.num_gs_seed_sqrt)
        freqs = self.param("rope_freqs",
                           rope_freqs_init(self.dim // nh, nh,
                                           self.rope_theta),
                           (2, nh, self.dim // nh // 2))
        phases = rope_phases(freqs, jnp.asarray(t_x), jnp.asarray(t_y))

        q = nn.Dense(self.dim, dtype=self.dtype, name="qhead")(gs)
        k = nn.Dense(self.dim, dtype=self.dtype, name="khead")(gs)
        v = nn.Dense(self.dim, dtype=self.dtype, name="vhead")(gs)
        q = apply_rope_packed(q, phases, nh)
        k = apply_rope_packed(k, phases, nh)
        out = _sdpa_packed(q, k, v, nh)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


def _ln(name, dtype):
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=name)


def _to_lattice(x, b, h_count, w_count, nsq, ch):
    x = x.reshape(b, h_count, w_count, nsq, nsq, ch)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h_count * nsq, w_count * nsq, ch)


def _from_lattice(x, b, h_count, w_count, nsq, ch):
    x = x.reshape(b, h_count, nsq, w_count, nsq, ch)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * h_count * w_count, nsq * nsq, ch)


class RopeWindowCrossAttnLayer(nn.Module):
    """`fea2gsropeamp.py:253-309`."""
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    num_gs_seed: int
    rope_theta: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, query_pos, feat, scale_embedding):
        resi = x
        x = _ln("norm1", self.dtype)(x)
        inj = ScaleInject(self.dim, dtype=self.dtype,
                          name="gs_cross_attn_scale")(scale_embedding)
        x = resi + inj[:, None, :]

        resi = x
        x = _ln("norm2", self.dtype)(x)
        x = MLP(self.dim, self.dim, dtype=self.dtype,
                name="mlp_crossattn_scale")(x)
        x = resi + x

        resi = x
        x = _ln("norm3", self.dtype)(x)
        if self.shift_size > 0:
            feat = jnp.roll(feat, (-self.shift_size, -self.shift_size),
                            axis=(1, 2))
        feat_w = window_partition(feat, self.window_size)
        x = RopeWindowCrossAttn(self.dim, self.num_heads, self.window_size,
                                self.num_gs_seed, self.rope_theta,
                                dtype=self.dtype,
                                name="window_cross_attn")(x + query_pos,
                                                          feat_w)
        x = resi + x

        resi = x
        x = _ln("norm4", self.dtype)(x)
        x = MLP(self.dim, self.dim, dtype=self.dtype,
                name="mlp_crossattn_feature")(x)
        return resi + x


class RopeWindowCrossAttnBlock(nn.Module):
    """`fea2gsropeamp.py:312-348` — layers + MLP + lattice conv residual."""
    dim: int
    window_size: int
    num_heads: int
    num_layers: int
    num_gs_seed: int
    rope_theta: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, query_pos, feat, scale_embedding, h_count, w_count):
        nsq = int(math.sqrt(self.num_gs_seed))
        b = x.shape[0] // (h_count * w_count)
        resi = x
        x = _ln("norm", self.dtype)(x)
        for i in range(self.num_layers):
            x = RopeWindowCrossAttnLayer(
                self.dim, self.num_heads, self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                num_gs_seed=self.num_gs_seed, rope_theta=self.rope_theta,
                dtype=self.dtype, name=f"blocks_{i}")(
                    x, query_pos, feat, scale_embedding)
        x = nn.Dense(self.dim, dtype=self.dtype, name="mlp_0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="mlp_2")(x)
        lat = _to_lattice(x, b, h_count, w_count, nsq, self.dim)
        lat = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                      name="conv")(lat)
        x = _from_lattice(lat, b, h_count, w_count, nsq, self.dim)
        return resi + x


class RopeGSSelfAttnLayer(nn.Module):
    """`fea2gsropeamp.py:420-478`."""
    dim: int
    num_heads: int
    num_gs_seed_sqrt: int
    shift_size: int
    rope_theta: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, gs, pos, h_count, w_count, scale_embedding):
        nsq = self.num_gs_seed_sqrt
        b = gs.shape[0] // (h_count * w_count)

        resi = gs
        gs = _ln("norm3", self.dtype)(gs)
        inj = ScaleInject(self.dim, dtype=self.dtype,
                          name="gs_cross_attn_scale")(scale_embedding)
        gs = resi + inj[:, None, :]

        resi = gs
        gs = _ln("norm4", self.dtype)(gs)
        gs = MLP(self.dim, self.dim, dtype=self.dtype,
                 name="mlp_crossattn")(gs)
        gs = resi + gs

        resi = gs
        gs = _ln("norm1", self.dtype)(gs)
        if self.shift_size > 0:
            full = _to_lattice(gs, b, h_count, w_count, nsq, self.dim)
            full = jnp.roll(full, (-self.shift_size, -self.shift_size),
                            axis=(1, 2))
            gs = _from_lattice(full, b, h_count, w_count, nsq, self.dim)
        gs = RopeGSSelfAttn(self.dim, self.num_heads, nsq, self.rope_theta,
                            dtype=self.dtype, name="gs_self_attn")(gs)
        if self.shift_size > 0:
            full = _to_lattice(gs, b, h_count, w_count, nsq, self.dim)
            full = jnp.roll(full, (self.shift_size, self.shift_size),
                            axis=(1, 2))
            gs = _from_lattice(full, b, h_count, w_count, nsq, self.dim)
        gs = gs + resi

        resi = gs
        gs = _ln("norm2", self.dtype)(gs)
        gs = MLP(self.dim, self.dim, dtype=self.dtype, name="mlp_selfattn")(gs)
        return resi + gs


class RopeGSSelfAttnBlock(nn.Module):
    """`fea2gsropeamp.py:481-515`."""
    dim: int
    num_heads: int
    num_selfattn_layers: int
    num_gs_seed_sqrt: int
    rope_theta: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, gs, pos, h_count, w_count, scale_embedding):
        nsq = self.num_gs_seed_sqrt
        b = gs.shape[0] // (h_count * w_count)
        resi = gs
        gs = _ln("norm", self.dtype)(gs)
        for i in range(self.num_selfattn_layers):
            gs = RopeGSSelfAttnLayer(
                self.dim, self.num_heads, nsq,
                shift_size=0 if i % 2 == 0 else nsq // 2,
                rope_theta=self.rope_theta, dtype=self.dtype,
                name=f"blocks_{i}")(gs, pos, h_count, w_count,
                                    scale_embedding)
        gs = nn.Dense(self.dim, dtype=self.dtype, name="mlp_0")(gs)
        gs = nn.relu(gs)
        gs = nn.Dense(self.dim, dtype=self.dtype, name="mlp_2")(gs)
        lat = _to_lattice(gs, b, h_count, w_count, nsq, self.dim)
        lat = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                      name="conv")(lat)
        gs = _from_lattice(lat, b, h_count, w_count, nsq, self.dim)
        return gs + resi


class Fea2GSRopeAMP(nn.Module):
    """Enhanced decoder (`fea2gsropeamp.py:518-719`)."""
    inchannel: int = 64
    channel: int = 192
    num_heads: int = 6
    num_crossattn_blocks: int = 1
    num_crossattn_layers: int = 2
    num_selfattn_blocks: int = 6
    num_selfattn_layers: int = 6
    num_gs_seed: int = 144
    gs_up_factor: float = 1.0
    window_size: int = 12
    shuffle_scale1: int = 2
    shuffle_scale2: int = 2
    rope_theta: float = 10.0
    dtype: Any = jnp.float32
    # fp32 Gaussian-parameter heads under a bf16 trunk (see Fea2GS) —
    # measured -1.1 to -1.4 dB when the heads emit bf16.
    fp32_heads: bool = True

    @nn.compact
    def __call__(self, srcs, scale):
        b, h, w, _ = srcs.shape
        ws = self.window_size
        ch = self.channel
        nsq = int(math.sqrt(self.num_gs_seed))
        h_count, w_count = h // ws, w // ws
        nwin = h_count * w_count

        gs_embedding = self.param("gs_embedding", nn.initializers.normal(1.0),
                                  (self.num_gs_seed, ch))
        pos_embedding = self.param("pos_embedding",
                                   nn.initializers.normal(1.0),
                                   (self.num_gs_seed, ch))
        query = jnp.tile(gs_embedding[None].astype(self.dtype),
                         (b * nwin, 1, 1))
        query_pos = jnp.tile(pos_embedding[None].astype(self.dtype),
                             (b * nwin, 1, 1))

        inv_scale = (1.0 / scale)[:, None].astype(self.dtype)
        se = nn.Dense(ch * 4, dtype=self.dtype, name="scale_mlp_0")(inv_scale)
        se = nn.relu(se)
        se = nn.Dense(ch, dtype=self.dtype, name="scale_mlp_2")(se)
        scale_embedding = jnp.repeat(se, nwin, axis=0)

        feat = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                       name="img_feat_proj_0")(srcs)
        feat = nn.relu(feat)
        feat = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                       name="img_feat_proj_2")(feat)

        for i in range(self.num_crossattn_blocks):
            query = RopeWindowCrossAttnBlock(
                ch, ws, self.num_heads, self.num_crossattn_layers,
                self.num_gs_seed, self.rope_theta, dtype=self.dtype,
                name=f"window_crossattn_blocks_{i}")(
                    query, query_pos, feat, scale_embedding, h_count, w_count)

        resi = query
        for i in range(self.num_selfattn_blocks):
            query = RopeGSSelfAttnBlock(
                ch, self.num_heads, self.num_selfattn_layers, nsq,
                self.rope_theta, dtype=self.dtype,
                name=f"gs_selfattn_blocks_{i}")(
                    query, query_pos, h_count, w_count, scale_embedding)

        # conv_final on the lattice + long residual (:680-694)
        lat = _to_lattice(query, b, h_count, w_count, nsq, ch)
        lat = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                      name="conv_final")(lat)
        resi_lat = _to_lattice(resi, b, h_count, w_count, nsq, ch)
        query = lat + resi_lat

        query = nn.Conv(ch * self.shuffle_scale1 ** 2, (3, 3), padding=1,
                        dtype=self.dtype, name="upnet_0")(query)
        query = pixel_shuffle(query, self.shuffle_scale1)
        query = nn.Conv(ch * self.shuffle_scale2 ** 2, (3, 3), padding=1,
                        dtype=self.dtype, name="upnet_2")(query)
        query = pixel_shuffle(query, self.shuffle_scale2)

        guf = int(self.gs_up_factor)
        hdt = jnp.float32 if self.fp32_heads else self.dtype
        q_sigma = HeadMLP(ch, 2 * guf, dtype=hdt,
                          name="mlp_block_sigma")(query).reshape(b, -1, 2)
        q_rho = HeadMLP(ch, 1 * guf, dtype=hdt,
                        name="mlp_block_rho")(query).reshape(b, -1, 1)
        q_alpha = HeadMLP(ch, 1 * guf, dtype=hdt,
                          name="mlp_block_alpha")(query).reshape(b, -1, 1)
        q_rgb = HeadMLP(ch, 3 * guf, dtype=hdt,
                        name="mlp_block_rgb")(query).reshape(b, -1, 3)
        q_mean = HeadMLP(ch, 2 * guf, dtype=hdt,
                         name="mlp_block_mean")(query).reshape(b, -1, 2)

        lat_h = nsq * h_count * self.shuffle_scale1 * self.shuffle_scale2
        lat_w = nsq * w_count * self.shuffle_scale1 * self.shuffle_scale2
        q_mean = q_mean.astype(jnp.float32) / jnp.array([[lat_w, lat_h]],
                                                        jnp.float32)
        q_mean = q_mean + reference_points(lat_h, lat_w)[None]

        return jnp.concatenate(
            [q_sigma.astype(jnp.float32), q_rho.astype(jnp.float32),
             q_alpha.astype(jnp.float32), q_rgb.astype(jnp.float32),
             q_mean], axis=-1)

"""Fea2GS decoder (paper version): LR features -> per-Gaussian parameters.

Mirrors `/root/reference/utils/fea2gs.py:451-635`:

  features (B, h, w, 64)
    -> img_feat_proj (conv-relu-conv, :473-477)
    -> window cross-attn blocks (Q = learned Gaussian seeds per 12x12 window,
       K/V = feature window; rectified relative-position bias, :116-281)
    -> GS self-attn blocks (windowed MSA over the seed lattice with shifted
       windows rolled across the *full* lattice, :284-448)
    -> UPNet pixel-shuffle x2x2 of the seed lattice (:546-551)
    -> 5 head MLPs (sigma/rho/alpha/rgb/mean, :496-538)
    -> mean normalized by lattice size + pixel-center reference grid
       (:553-563, 623-630)
    -> (B, N, 9) raw Gaussian parameters.

TPU-first notes:
- NHWC layout; all attention is batched windows (static shapes, MXU-friendly).
- The reference's "scale cross-attention" (`gs_cross_attn_scale`,
  :201,225,369,381) attends to `num_gs_seed` *identical* scale-embedding
  tokens: softmax over equal logits is uniform and the average of identical
  values is the value itself, so the layer's output is exactly
  ``out_proj(v_proj(scale_embedding))`` independent of the query. We compute
  that directly (one dense matmul instead of a full attention) while keeping
  q/k projection parameters for checkpoint compatibility.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gsasr_tpu.models.common import MLP, pixel_shuffle
from gsasr_tpu.ops.attention import window_attention_packed


# ---------------------------------------------------------------------------
# Relative-position index construction (static, numpy at module build time)
# ---------------------------------------------------------------------------


def cross_attn_rel_pos_index(gs_sqrt: int, window_size: int) -> np.ndarray:
    """Rectified relative-position index between the gs seed lattice and the
    feature window lattice (`fea2gs.py:134-144`).

    Both lattices are scaled to a common resolution (seed positions times
    window_size, feature positions times gs_sqrt); the pairwise coordinate
    deltas are ranked into a dense index, and the two axes are combined as
    ``idx = rank_y * max_rank + rank_x``.
    """
    src = (np.stack(np.indices((gs_sqrt, gs_sqrt))) + 0.5) * window_size
    tgt = (np.stack(np.indices((window_size, window_size))) + 0.5) * gs_sqrt
    delta = (src.reshape(2, -1)[:, :, None]
             - tgt.reshape(2, -1)[:, None, :])  # (2, S, T)
    uniq = np.unique(delta)  # sorted unique values over BOTH axes
    ranks = np.searchsorted(uniq, delta)  # dense rank per element
    ranks[0] *= ranks.max()
    return ranks.sum(0)  # (S, T)


def self_attn_rel_pos_index(n_sqrt: int) -> np.ndarray:
    """Standard Swin-style relative position index on an n_sqrt^2 lattice
    (`fea2gs.py:300-311`)."""
    coords = np.stack(np.indices((n_sqrt, n_sqrt))).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (n_sqrt - 1)
    rel[:, :, 0] *= 2 * n_sqrt - 1
    return rel.sum(-1)  # (n, n)


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B * H/ws * W/ws, ws*ws, C), row-major windows
    (`fea2gs.py:82-95`)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * (h // ws) * (w // ws), ws * ws, c)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class ScaleInject(nn.Module):
    """Checkpoint-compatible replacement for the reference's
    `nn.MultiheadAttention(dim, heads)` over identical scale tokens
    (`fea2gs.py:201,225`). Output == out_proj(v_proj(scale)); q/k projections
    are dead weights kept for conversion parity.
    """
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, scale_embedding):
        # scale_embedding: (B, C) one token per (batch-window).
        self.param("q_proj_dead", nn.initializers.xavier_uniform(),
                   (self.dim, self.dim))
        self.param("k_proj_dead", nn.initializers.xavier_uniform(),
                   (self.dim, self.dim))
        v = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(scale_embedding)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(v)


class WindowCrossAttn(nn.Module):
    """Q = gs seeds, K/V = feature window, rectified rel-pos bias
    (`fea2gs.py:116-194`)."""
    dim: int
    num_heads: int
    window_size: int
    num_gs_seed: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, gs, feat):
        b_, num_gs, c = gs.shape
        n = feat.shape[1]
        nh = self.num_heads
        hd = c // nh
        gs_sqrt = int(math.sqrt(self.num_gs_seed))

        idx = cross_attn_rel_pos_index(gs_sqrt, self.window_size)
        table_rows = ((2 * max(gs_sqrt, self.window_size) - 1) ** 2)
        assert idx.max() < table_rows
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02 / 0.87962566103423978),
            (table_rows, nh))

        q = nn.Dense(c, dtype=self.dtype, name="qhead")(gs)
        k = nn.Dense(c, dtype=self.dtype, name="khead")(feat)
        v = nn.Dense(c, dtype=self.dtype, name="vhead")(feat)

        # packed (B_, T, C) layout — heads split inside the kernel; no
        # (B, nh, T, hd) transpose copies (measured 32 ms/fwd of the
        # decoder stage at the 180^2 bench, BENCH_NOTES r3).
        bias = bias_table[idx.reshape(-1)].reshape(num_gs, n, nh)
        out = window_attention_packed(q, k, v, bias.transpose(2, 0, 1),
                                      num_heads=nh, scale=hd ** -0.5)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class GSSelfAttn(nn.Module):
    """Windowed MSA over the gs seed lattice with Swin rel-pos bias
    (`fea2gs.py:284-350`)."""
    dim: int
    num_heads: int
    num_gs_seed_sqrt: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, gs):
        b_, num_gs, c = gs.shape
        nh = self.num_heads
        hd = c // nh
        nsq = self.num_gs_seed_sqrt

        idx = self_attn_rel_pos_index(nsq)
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02 / 0.87962566103423978),
            ((2 * nsq - 1) ** 2, nh))

        q = nn.Dense(c, dtype=self.dtype, name="qhead")(gs)
        k = nn.Dense(c, dtype=self.dtype, name="khead")(gs)
        v = nn.Dense(c, dtype=self.dtype, name="vhead")(gs)

        bias = bias_table[idx.reshape(-1)].reshape(num_gs, num_gs, nh)
        out = window_attention_packed(q, k, v, bias.transpose(2, 0, 1),
                                      num_heads=nh, scale=hd ** -0.5)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


def _ln(name, dtype):
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=name)


class WindowCrossAttnLayer(nn.Module):
    """`fea2gs.py:197-252`: scale-inject -> FFN -> (shifted) window
    cross-attn -> FFN, all pre-norm residual."""
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    num_gs_seed: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, query_pos, feat, scale_embedding):
        # x/query_pos: (B_, num_gs, C); feat: (B, H, W, C) pre-window;
        # scale_embedding: (B_, C).
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
        x = WindowCrossAttn(self.dim, self.num_heads, self.window_size,
                            self.num_gs_seed, dtype=self.dtype,
                            name="window_cross_attn")(x + query_pos, feat_w)
        x = resi + x

        resi = x
        x = _ln("norm4", self.dtype)(x)
        x = MLP(self.dim, self.dim, dtype=self.dtype,
                name="mlp_crossattn_feature")(x)
        return resi + x


class WindowCrossAttnBlock(nn.Module):
    """`fea2gs.py:255-281`: norm -> layers -> mlp -> +residual."""
    dim: int
    window_size: int
    num_heads: int
    num_layers: int
    num_gs_seed: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, query_pos, feat, scale_embedding):
        resi = x
        x = _ln("norm", self.dtype)(x)
        for i in range(self.num_layers):
            x = WindowCrossAttnLayer(
                self.dim, self.num_heads, self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                num_gs_seed=self.num_gs_seed, dtype=self.dtype,
                name=f"blocks_{i}")(x, query_pos, feat, scale_embedding)
        x = nn.Dense(self.dim, dtype=self.dtype, name="mlp_0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="mlp_2")(x)
        return resi + x


class GSSelfAttnLayer(nn.Module):
    """`fea2gs.py:353-419`: scale-inject -> FFN -> (lattice-shifted) windowed
    self-attn -> FFN."""
    dim: int
    num_heads: int
    num_gs_seed_sqrt: int
    shift_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, gs, pos, h_count, w_count, scale_embedding):
        nsq = self.num_gs_seed_sqrt

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
            # Reassemble the full lattice, roll across window boundaries,
            # re-window (`fea2gs.py:393-411`).
            b_ = gs.shape[0]
            b = b_ // (h_count * w_count)
            full = gs.reshape(b, h_count, w_count, nsq, nsq, self.dim)
            full = full.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h_count * nsq, w_count * nsq, self.dim)
            full = jnp.roll(full, (-self.shift_size, -self.shift_size),
                            axis=(1, 2))
            gs = window_partition(full, nsq)
        gs = GSSelfAttn(self.dim, self.num_heads, nsq, dtype=self.dtype,
                        name="gs_self_attn")(gs)
        if self.shift_size > 0:
            b_ = resi.shape[0]
            b = b_ // (h_count * w_count)
            full = gs.reshape(b, h_count, w_count, nsq, nsq, self.dim)
            full = full.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h_count * nsq, w_count * nsq, self.dim)
            full = jnp.roll(full, (self.shift_size, self.shift_size),
                            axis=(1, 2))
            gs = window_partition(full, nsq)
        gs = gs + resi

        resi = gs
        gs = _ln("norm2", self.dtype)(gs)
        gs = MLP(self.dim, self.dim, dtype=self.dtype, name="mlp_selfattn")(gs)
        return resi + gs


class GSSelfAttnBlock(nn.Module):
    """`fea2gs.py:422-448`."""
    dim: int
    num_heads: int
    num_selfattn_layers: int
    num_gs_seed_sqrt: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, gs, pos, h_count, w_count, scale_embedding):
        resi = gs
        gs = _ln("norm", self.dtype)(gs)
        for i in range(self.num_selfattn_layers):
            gs = GSSelfAttnLayer(
                self.dim, self.num_heads, self.num_gs_seed_sqrt,
                shift_size=0 if i % 2 == 0 else self.num_gs_seed_sqrt // 2,
                dtype=self.dtype, name=f"blocks_{i}")(
                    gs, pos, h_count, w_count, scale_embedding)
        gs = nn.Dense(self.dim, dtype=self.dtype, name="mlp_0")(gs)
        gs = nn.relu(gs)
        gs = nn.Dense(self.dim, dtype=self.dtype, name="mlp_2")(gs)
        return resi + gs


class HeadMLP(nn.Module):
    """ch -> ch -> 4ch -> out head (`fea2gs.py:496-538`)."""
    dim: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.dim * 4, dtype=self.dtype, name="fc2")(x)
        x = nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc4")(x)


def reference_points(h: int, w: int, dtype=jnp.float32):
    """Pixel-center anchor grid (`fea2gs.py:553-563`): (h*w, 2) as (x, y)."""
    step_y = 1.0 / h
    step_x = 1.0 / w
    ys = jnp.linspace(step_y / 2, 1 - step_y / 2, h, dtype=dtype)
    xs = jnp.linspace(step_x / 2, 1 - step_x / 2, w, dtype=dtype)
    ref_y = jnp.repeat(ys[:, None], w, axis=1)
    ref_x = jnp.repeat(xs[None, :], h, axis=0)
    return jnp.stack([ref_x.reshape(-1), ref_y.reshape(-1)], axis=-1)


class Fea2GS(nn.Module):
    """Paper decoder (`fea2gs.py:451-635`).

    Input: (B, h, w, inchannel) NHWC features, h/w divisible by window_size;
    scale: (B,) scale factors. Output: (B, N, 9) raw Gaussian parameters,
    N = (h//ws * ws_gs * s1 * s2) * (w//ws * ...) lattice points.
    """
    inchannel: int = 64
    channel: int = 180
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
    dtype: Any = jnp.float32
    # Keep the five Gaussian-parameter heads in fp32 even when the trunk
    # runs bf16: head outputs (mu especially) quantize at bf16's ~2^-8
    # relative step BEFORE the fp32 render boundary, which measured
    # -1.1 to -1.4 dB at x4 (BENCH_NOTES round 4). The heads are tiny
    # (5 x ch->4ch->out MLPs on the lattice), so the cost is noise.
    # False reproduces the reference autocast's all-bf16 behavior.
    fp32_heads: bool = True

    @nn.compact
    def __call__(self, srcs, scale):
        b, h, w, _ = srcs.shape
        ws = self.window_size
        ch = self.channel
        nsq = int(math.sqrt(self.num_gs_seed))
        h_count, w_count = h // ws, w // ws
        nwin = h_count * w_count

        gs_embedding = self.param(
            "gs_embedding", nn.initializers.normal(1.0),
            (self.num_gs_seed, ch))
        pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(1.0),
            (self.num_gs_seed, ch))

        query = jnp.tile(gs_embedding[None], (b * nwin, 1, 1))
        query_pos = jnp.tile(pos_embedding[None], (b * nwin, 1, 1))

        inv_scale = (1.0 / scale)[:, None]  # (B, 1)
        se = nn.Dense(ch * 4, dtype=self.dtype, name="scale_mlp_0")(inv_scale)
        se = nn.relu(se)
        se = nn.Dense(ch, dtype=self.dtype, name="scale_mlp_2")(se)
        # one token per (batch, window): (B*nwin, C)
        scale_embedding = jnp.repeat(se, nwin, axis=0)

        feat = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                       name="img_feat_proj_0")(srcs)
        feat = nn.relu(feat)
        feat = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                       name="img_feat_proj_2")(feat)

        for i in range(self.num_crossattn_blocks):
            query = WindowCrossAttnBlock(
                ch, ws, self.num_heads, self.num_crossattn_layers,
                self.num_gs_seed, dtype=self.dtype,
                name=f"window_crossattn_blocks_{i}")(
                    query, query_pos, feat, scale_embedding)

        resi = query
        for i in range(self.num_selfattn_blocks):
            query = GSSelfAttnBlock(
                ch, self.num_heads, self.num_selfattn_layers, nsq,
                dtype=self.dtype, name=f"gs_selfattn_blocks_{i}")(
                    query, query_pos, h_count, w_count, scale_embedding)
        query = query + resi

        # (B_, nsq*nsq, C) -> full lattice (B, m*nsq, n*nsq, C)
        query = query.reshape(b, h_count, w_count, nsq, nsq, ch)
        query = query.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h_count * nsq, w_count * nsq, ch)

        # UPNet: conv + pixel-shuffle x shuffle_scale1, then x shuffle_scale2.
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
        q_mean = q_mean / jnp.array([[lat_w, lat_h]], q_mean.dtype)
        q_mean = q_mean + reference_points(lat_h, lat_w, q_mean.dtype)[None]

        return jnp.concatenate(
            [q_sigma, q_rho, q_alpha, q_rgb, q_mean], axis=-1)

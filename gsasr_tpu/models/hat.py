"""HAT-L encoder with RoPE + SDPA, without upsampler ("NOUP ROPE AMP").

Mirrors `/root/reference/utils/hatropeamp.py:886-1155` (HATNOUP_ROPE_AMP):
conv_first -> 12x RHAG -> norm -> conv_after_body + residual ->
conv_before_upsample (embed_dim -> 64 + LeakyReLU). Each RHAG = depth x HAB
(window attention with RoPE + CAB channel-attention conv branch scaled by
conv_scale) + one OCAB (overlapping cross attention) + conv + residual.

Reference quirks preserved:
- `WindowAttention.forward` *ignores* the shifted-window attention mask and
  the relative-position index (hatropeamp.py:344-349: SDPA called without
  attn_mask) — shifted windows attend across boundaries unmasked;
- OCAB's RoPE coordinate grid spans max(ws, overlap_ws)^2 row-major, and q/k
  take the first nq/n positions of it (`apply_rotary_emb_single` slice,
  :154-160);
- DropPath is identity (deterministic eval).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gsasr_tpu.models.common import DropPath
from gsasr_tpu.models.fea2gs_rope import (apply_rope_packed, rope_freqs_init,
                                          rope_phases, rope_t_xy,
                                          _sdpa_packed)
from gsasr_tpu.models.swinir import window_partition, window_reverse


class ChannelAttention(nn.Module):
    """RCAN channel attention (`hatropeamp.py:191-209`), NHWC."""
    num_feat: int
    squeeze_factor: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.Conv(self.num_feat // self.squeeze_factor, (1, 1),
                    dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.num_feat, (1, 1), dtype=self.dtype, name="fc2")(y)
        return x * jax.nn.sigmoid(y)


class CAB(nn.Module):
    """Conv attention branch (`hatropeamp.py:212-225`)."""
    num_feat: int
    compress_ratio: int = 3
    squeeze_factor: int = 30
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.num_feat // self.compress_ratio, (3, 3), padding=1,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(y)
        return ChannelAttention(self.num_feat, self.squeeze_factor,
                                dtype=self.dtype, name="ca")(y)


class HATWindowAttention(nn.Module):
    """RoPE window attention (`hatropeamp.py:280-349`) — no mask, no bias."""
    dim: int
    window_size: int
    num_heads: int
    rope_theta: float = 10.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b_, n, c = x.shape
        nh = self.num_heads
        t_x, t_y = rope_t_xy(self.window_size, self.window_size)
        freqs = self.param("rope_freqs",
                           rope_freqs_init(c // nh, nh, self.rope_theta),
                           (2, nh, c // nh // 2))
        phases = rope_phases(freqs, jnp.asarray(t_x), jnp.asarray(t_y))

        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # (b_, n, c) each, no copies
        q = apply_rope_packed(q, phases, nh)
        k = apply_rope_packed(k, phases, nh)
        out = _sdpa_packed(q, k, v, nh)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class HAB(nn.Module):
    """Hybrid Attention Block (`hatropeamp.py:352-464`)."""
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    mlp_ratio: float
    rope_theta: float
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, C) NHWC
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift_size if ws == self.window_size else 0
        if min(h, w) <= self.window_size:
            shift = 0

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        conv_x = CAB(self.dim, self.compress_ratio, self.squeeze_factor,
                     dtype=self.dtype, name="conv_block")(x)

        if shift > 0:
            xs = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        else:
            xs = x
        xw = window_partition(xs, ws)
        xw = HATWindowAttention(self.dim, ws, self.num_heads,
                                self.rope_theta, dtype=self.dtype,
                                name="attn")(xw)
        xs = window_reverse(xw, ws, h, w)
        if shift > 0:
            xs = jnp.roll(xs, (shift, shift), axis=(1, 2))

        # DropPath gates the attention and MLP branches but NOT the CAB
        # conv branch (`hatropeamp.py:461-462`).
        dp = DropPath(self.drop_path, name="drop_path")
        x = (shortcut + dp(xs, deterministic=not train)
             + conv_x * self.conv_scale)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + dp(y, deterministic=not train)


class OCAB(nn.Module):
    """Overlapping cross-attention block (`hatropeamp.py:507-606`)."""
    dim: int
    window_size: int
    overlap_ratio: float
    num_heads: int
    mlp_ratio: float
    rope_theta: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = self.window_size
        ows = int(ws * self.overlap_ratio) + ws
        pad = (ows - ws) // 2
        nh = self.num_heads

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # (b, h, w, c) each

        q_w = window_partition(q, ws)  # (b*nw, ws*ws, c)

        def unfold(t):
            # overlapping (ows x ows) patches at stride ws, zero-padded —
            # equivalent of nn.Unfold (hatropeamp.py:534). Output
            # (b*nw, ows*ows, c) with row-major patch interior.
            tp = jnp.pad(t, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            patches = []
            for dy in range(ows):
                for dx in range(ows):
                    patches.append(
                        tp[:, dy:dy + h + 2 * pad - ows + 1:ws,
                           dx:dx + w + 2 * pad - ows + 1:ws, :])
            # each entry: (b, nw_h, nw_w, c)
            st = jnp.stack(patches, axis=3)  # (b, nw_h, nw_w, ows*ows, c)
            return st.reshape(-1, ows * ows, c)

        k_w = unfold(k)
        v_w = unfold(v)

        end = max(ws, ows)
        t_x, t_y = rope_t_xy(end, end)
        freqs = self.param("rope_freqs",
                           rope_freqs_init(c // nh, nh, self.rope_theta),
                           (2, nh, c // nh // 2))
        phases = rope_phases(freqs, jnp.asarray(t_x), jnp.asarray(t_y))

        qh = apply_rope_packed(q_w, phases, nh)
        kh = apply_rope_packed(k_w, phases, nh)
        out = _sdpa_packed(qh, kh, v_w, nh)  # (b*nw, ws*ws, c)
        out = window_reverse(out, ws, h, w)
        x = nn.Dense(c, dtype=self.dtype, name="proj")(out) + shortcut

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class RHAG(nn.Module):
    """Residual Hybrid Attention Group (`hatropeamp.py:710-795`)."""
    dim: int
    depth: int
    num_heads: int
    window_size: int
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    overlap_ratio: float
    mlp_ratio: float
    rope_theta: float
    drop_path: Tuple[float, ...] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        resi = x
        for i in range(self.depth):
            x = HAB(self.dim, self.num_heads, self.window_size,
                    shift_size=0 if i % 2 == 0 else self.window_size // 2,
                    compress_ratio=self.compress_ratio,
                    squeeze_factor=self.squeeze_factor,
                    conv_scale=self.conv_scale, mlp_ratio=self.mlp_ratio,
                    rope_theta=self.rope_theta,
                    drop_path=self.drop_path[i] if self.drop_path else 0.0,
                    dtype=self.dtype,
                    name=f"block_{i}")(x, train=train)
        x = OCAB(self.dim, self.window_size, self.overlap_ratio,
                 self.num_heads, self.mlp_ratio, self.rope_theta,
                 dtype=self.dtype, name="overlap_attn")(x)
        x = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x)
        return x + resi


class HATNOUP(nn.Module):
    """HAT-L trunk: (B, H, W, 3) -> (B, H, W, 64) NHWC."""
    embed_dim: int = 192
    depths: Tuple[int, ...] = (6,) * 12
    num_heads: Tuple[int, ...] = (6,) * 12
    window_size: int = 16
    compress_ratio: int = 3
    squeeze_factor: int = 32
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    mlp_ratio: float = 2.0
    num_feat: int = 64
    rope_theta: float = 10.0
    drop_path_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_first")(x)
        resi = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="patch_embed_norm")(x)
        # stochastic depth decay rule (`hatropeamp.py:978`)
        dpr = np.linspace(0, self.drop_path_rate,
                          sum(self.depths)).tolist()
        off = 0
        for i, depth in enumerate(self.depths):
            x = RHAG(self.embed_dim, depth, self.num_heads[i],
                     self.window_size, self.compress_ratio,
                     self.squeeze_factor, self.conv_scale,
                     self.overlap_ratio, self.mlp_ratio, self.rope_theta,
                     drop_path=tuple(dpr[off:off + depth]),
                     dtype=self.dtype, name=f"layer_{i}")(x, train=train)
            off += depth
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_after_body")(x)
        x = x + resi
        x = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_before_upsample_0")(x)
        return nn.leaky_relu(x, negative_slope=0.01)

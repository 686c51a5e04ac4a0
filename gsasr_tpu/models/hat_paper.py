"""HAT encoder, paper version (relative-position-bias attention, no RoPE).

Mirrors `TrainTestGSASR/basicsr/archs/hat_arch.py` (`HATNOUP`,
:987-1280-ish): identical topology to gsasr_tpu/models/hat.py but window
attention carries Swin-style relative position bias *and* the shifted-window
mask (:165-196, applied — unlike the ROPE/AMP variant), and OCAB uses a
rectangular ws^2 x ows^2 bias table indexed by `calculate_rpi_oca`
(:896-919).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gsasr_tpu.models.fea2gs import self_attn_rel_pos_index
from gsasr_tpu.models.hat import CAB
from gsasr_tpu.models.swinir import (swin_attn_mask, window_partition,
                                     window_reverse)


def oca_rel_pos_index(ws: int, ows: int) -> np.ndarray:
    """`hat_arch.py:896-919`: (ws*ws, ows*ows) index into a
    (ws+ows-1)^2-row table."""
    co = np.stack(np.indices((ws, ws))).reshape(2, -1)     # ori
    ce = np.stack(np.indices((ows, ows))).reshape(2, -1)   # ext
    rel = ce[:, None, :] - co[:, :, None]                  # 2, ws^2, ows^2
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - ows + 1
    rel[:, :, 1] += ws - ows + 1
    rel[:, :, 0] *= ws + ows - 1
    return rel.sum(-1)


class PaperWindowAttention(nn.Module):
    """W-MSA with rel-pos bias + shift mask (`hat_arch.py:120-196`)."""
    dim: int
    window_size: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b_, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        ws = self.window_size
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02 / 0.87962566103423978),
            ((2 * ws - 1) ** 2, nh))
        idx = self_attn_rel_pos_index(ws)

        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # (b_, n, c), no copies
        bias = bias_table[idx.reshape(-1)].reshape(n, n, nh)
        # packed fused kernel (heads split in-VMEM); shifted blocks pass
        # the 9-region mask as the per-window-class window_mask.
        from gsasr_tpu.ops.attention import window_attention_packed
        out = window_attention_packed(q, k, v, bias.transpose(2, 0, 1),
                                      num_heads=nh, window_mask=mask)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class PaperHAB(nn.Module):
    """`hat_arch.py:199-313` — like hat.HAB but masked+biased attention."""
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    mlp_ratio: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
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
            mask = jnp.asarray(swin_attn_mask(h, w, ws, shift))
        else:
            xs, mask = x, None
        xw = window_partition(xs, ws)
        xw = PaperWindowAttention(self.dim, ws, self.num_heads,
                                  dtype=self.dtype, name="attn")(xw, mask)
        xs = window_reverse(xw, ws, h, w)
        if shift > 0:
            xs = jnp.roll(xs, (shift, shift), axis=(1, 2))

        x = shortcut + xs + conv_x * self.conv_scale
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class PaperOCAB(nn.Module):
    """`hat_arch.py:352-438` — overlapping cross attention with the
    rectangular bias table."""
    dim: int
    window_size: int
    overlap_ratio: float
    num_heads: int
    mlp_ratio: float
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
        q, k, v = jnp.split(qkv, 3, axis=-1)

        q_w = window_partition(q, ws)

        def unfold(t):
            tp = jnp.pad(t, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            patches = []
            for dy in range(ows):
                for dx in range(ows):
                    patches.append(
                        tp[:, dy:dy + h + 2 * pad - ows + 1:ws,
                           dx:dx + w + 2 * pad - ows + 1:ws, :])
            st = jnp.stack(patches, axis=3)
            return st.reshape(-1, ows * ows, c)

        k_w, v_w = unfold(k), unfold(v)

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02 / 0.87962566103423978),
            ((ws + ows - 1) ** 2, nh))
        idx = oca_rel_pos_index(ws, ows)

        bias = bias_table[idx.reshape(-1)].reshape(ws * ws, ows * ows, nh)
        # rectangular (Tq=ws^2, Tk=ows^2) cross-window attention on the
        # packed fused kernel — q_w/k_w/v_w are already (b*nW, T, C).
        from gsasr_tpu.ops.attention import window_attention_packed
        out = window_attention_packed(q_w, k_w, v_w,
                                      bias.transpose(2, 0, 1), num_heads=nh)
        out = window_reverse(out, ws, h, w)
        x = nn.Dense(c, dtype=self.dtype, name="proj")(out) + shortcut

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class PaperRHAG(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    overlap_ratio: float
    mlp_ratio: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        resi = x
        for i in range(self.depth):
            x = PaperHAB(self.dim, self.num_heads, self.window_size,
                         shift_size=0 if i % 2 == 0 else self.window_size // 2,
                         compress_ratio=self.compress_ratio,
                         squeeze_factor=self.squeeze_factor,
                         conv_scale=self.conv_scale,
                         mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                         name=f"block_{i}")(x)
        x = PaperOCAB(self.dim, self.window_size, self.overlap_ratio,
                      self.num_heads, self.mlp_ratio, dtype=self.dtype,
                      name="overlap_attn")(x)
        x = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x)
        return x + resi


class HATNOUPPaper(nn.Module):
    """Paper-style HAT trunk (`hat_arch.py` HATNOUP registry variant)."""
    embed_dim: int = 180
    depths: Tuple[int, ...] = (6,) * 6
    num_heads: Tuple[int, ...] = (6,) * 6
    window_size: int = 16
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    mlp_ratio: float = 2.0
    num_feat: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_first")(x)
        resi = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="patch_embed_norm")(x)
        for i, depth in enumerate(self.depths):
            x = PaperRHAG(self.embed_dim, depth, self.num_heads[i],
                          self.window_size, self.compress_ratio,
                          self.squeeze_factor, self.conv_scale,
                          self.overlap_ratio, self.mlp_ratio,
                          dtype=self.dtype, name=f"layer_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_after_body")(x)
        x = x + resi
        x = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_before_upsample_0")(x)
        return nn.leaky_relu(x, negative_slope=0.01)

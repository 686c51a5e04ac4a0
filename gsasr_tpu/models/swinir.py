"""SwinIR encoder without upsampler ("NOUP").

Mirrors `/root/reference/utils/swinir.py:1018-1243` (SwinIRNOUP with
upsampler='pixelshuffle', upsampling layers removed): conv_first ->
6x RSTB (each 6 SwinTransformerBlocks + conv + residual) -> norm ->
conv_after_body + long residual -> conv_before_upsample (embed_dim -> 64 +
LeakyReLU), so the encoder emits 64 channels like EDSR/RDN.

Swin details preserved exactly:
- window 8 W-MSA with relative position bias (`swinir.py:177-259`);
- shifted windows on odd blocks with the 9-region attention mask computed
  for the *actual* input size (`swinir.py:344-365, 388-392`);
- pre-norm residual blocks, GELU MLP with mlp_ratio 2;
- patch_norm LayerNorm after flatten, final norm before unembed.

DropPath (stochastic depth, linspace 0 -> drop_path_rate over all blocks,
`swinir.py:877, 1088`; default 0.1) is active when called with train=True
and an rng stream named 'droppath'; identity at eval, so inference parity
with converted weights is unchanged.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gsasr_tpu.models.common import DropPath
from gsasr_tpu.models.fea2gs import self_attn_rel_pos_index


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows, ws: int, h: int, w: int):
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def swin_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """SW-MSA 9-region mask (`swinir.py:344-365`): (nW, ws*ws, ws*ws) with
    0 / -100 entries. Static per (h, w, ws, shift)."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    m = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    m = m.reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (`swinir.py:177-259`)."""
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

        # W-MSA and SW-MSA both ride the packed fused kernel (heads split
        # in-VMEM, no (B, nh, T, hd) transposes in HBM); the shifted
        # blocks' 9-region mask is the per-window-class `window_mask`
        # (period nW along the window axis).
        from gsasr_tpu.ops.attention import window_attention_packed
        out = window_attention_packed(q, k, v, bias.transpose(2, 0, 1),
                                      num_heads=nh, window_mask=mask)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    """SwinTransformerBlock (`swinir.py:276-434`), NHWC in/out."""
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift_size if ws == self.window_size else 0
        if min(h, w) <= self.window_size:
            shift = 0

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        xw = window_partition(x, ws)
        mask = None
        if shift > 0:
            mask = jnp.asarray(swin_attn_mask(h, w, ws, shift))
        xw = WindowAttention(self.dim, ws, self.num_heads, dtype=self.dtype,
                             name="attn")(xw, mask)
        x = window_reverse(xw, ws, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        # Same DropPath instance gates both residual branches
        # (`swinir.py:402-403`).
        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(x, deterministic=not train)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + dp(y, deterministic=not train)


class RSTB(nn.Module):
    """Residual Swin Transformer Block (`swinir.py:562-652`)."""
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    drop_path: Tuple[float, ...] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        resi = x
        for i in range(self.depth):
            dp = self.drop_path[i] if self.drop_path else 0.0
            x = SwinBlock(self.dim, self.num_heads, self.window_size,
                          shift_size=0 if i % 2 == 0 else self.window_size // 2,
                          mlp_ratio=self.mlp_ratio, drop_path=dp,
                          dtype=self.dtype,
                          name=f"block_{i}")(x, train=train)
        x = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x)
        return x + resi


class SwinIRNOUP(nn.Module):
    """(B, H, W, 3) -> (B, H, W, 64) NHWC; H, W divisible by window_size."""
    embed_dim: int = 180
    depths: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    num_feat: int = 64
    img_range: float = 1.0
    drop_path_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x * self.img_range
        x = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_first")(x)
        resi = x

        # stochastic depth decay rule: linspace over all blocks
        # (`swinir.py:877, 1088`)
        dpr = np.linspace(0, self.drop_path_rate,
                          sum(self.depths)).tolist()

        # patch_embed norm (patch_norm=True)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="patch_embed_norm")(x)
        off = 0
        for i, depth in enumerate(self.depths):
            x = RSTB(self.embed_dim, depth, self.num_heads[i],
                     self.window_size, self.mlp_ratio,
                     drop_path=tuple(dpr[off:off + depth]),
                     dtype=self.dtype,
                     name=f"layer_{i}")(x, train=train)
            off += depth
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)

        x = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_after_body")(x)
        x = x + resi
        x = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_before_upsample_0")(x)
        return nn.leaky_relu(x, negative_slope=0.01)

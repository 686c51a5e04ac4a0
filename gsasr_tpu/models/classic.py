"""Classic (non-NOUP) single-scale SR architectures.

The reference registry files carry full SR networks alongside the NOUP
encoder variants GSASR actually uses:

- `EDSR` / `EDSRx3` / `EDSRx4`  (`basicsr/archs/edsr_arch.py:8-174`) —
  identical topology, fixed upscale, differing only in the torch attribute
  name of the upsample head (`upsample` / `upsamplex3` / `upsamplex4`).
- `RDNNOUP(no_upsampling=False)` (`basicsr/archs/rdn_arch.py:39-120`) —
  RDN with the pixel-shuffle UPNet head.
- `SwinIR` (`basicsr/archs/swinir_arch.py:699-938`) — classical /
  lightweight / real-world SR heads.
- `HAT` (`basicsr/archs/hat_arch.py:709-984`) — classical SR head.

These are re-implemented here TPU-first (NHWC, flax.linen, static shapes)
reusing the NOUP trunks; `gsasr_tpu.utils.torch_convert` maps reference
state_dicts onto them 1:1 for oracle parity testing.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from gsasr_tpu.models.common import pixel_shuffle
from gsasr_tpu.models.edsr import ResidualBlockNoBN
from gsasr_tpu.models.hat_paper import PaperRHAG
from gsasr_tpu.models.rdn import _CONFIGS, RDB
from gsasr_tpu.models.swinir import RSTB

DIV2K_RGB_MEAN = (0.4488, 0.4371, 0.4040)


class Upsample(nn.Module):
    """arch_util.py:91-110 Upsample: [conv(4f)+shuffle2]*log2(s) or
    conv(9f)+shuffle3. Conv submodules are named ``conv_{torch_index}`` so
    the converter maps ``upsample.{i}.weight`` directly."""
    scale: int
    num_feat: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = self.scale
        if (s & (s - 1)) == 0:  # 2^n
            for step in range(int(math.log2(s))):
                x = nn.Conv(4 * self.num_feat, (3, 3), padding=1,
                            dtype=self.dtype, name=f"conv_{2 * step}")(x)
                x = pixel_shuffle(x, 2)
        elif s == 3:
            x = nn.Conv(9 * self.num_feat, (3, 3), padding=1,
                        dtype=self.dtype, name="conv_0")(x)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError(f"scale {s} not supported (2^n or 3)")
        return x


class UpsampleOneStep(nn.Module):
    """swinir_arch.py:664-682: single conv(out*r^2) + shuffle(r)."""
    scale: int
    num_out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.num_out_ch * self.scale ** 2, (3, 3), padding=1,
                    dtype=self.dtype, name="conv_0")(x)
        return pixel_shuffle(x, self.scale)


class EDSR(nn.Module):
    """Full EDSR (`edsr_arch.py:8-61`); covers EDSRx3/EDSRx4 via `upscale`.

    (B, H, W, 3) -> (B, sH, sW, 3) NHWC.
    """
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 16
    upscale: int = 4
    res_scale: float = 1.0
    img_range: float = 255.0
    rgb_mean: Tuple[float, ...] = DIV2K_RGB_MEAN
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.rgb_mean, dtype=x.dtype)
        x = (x - mean) * self.img_range
        x = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_first")(x)
        res = x
        for i in range(self.num_block):
            res = ResidualBlockNoBN(self.num_feat, self.res_scale,
                                    dtype=self.dtype, name=f"body_{i}")(res)
        res = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                      name="conv_after_body")(res)
        res = res + x
        res = Upsample(self.upscale, self.num_feat, dtype=self.dtype,
                       name="upsample")(res)
        out = nn.Conv(self.num_out_ch, (3, 3), padding=1, dtype=self.dtype,
                      name="conv_last")(res)
        return out / self.img_range + mean


class RDN(nn.Module):
    """Full RDN (`rdn_arch.py:39-120`, no_upsampling=False path).

    Note the reference forward scales by img_range on input and does NOT
    unscale the output (rdn_arch.py:96-110) — kept faithfully.
    """
    g0: int = 64
    upscale: int = 4
    n_colors: int = 3
    config: str = "B"
    img_range: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, c, g = _CONFIGS[self.config]
        x = x * self.img_range
        f1 = nn.Conv(self.g0, (3, 3), padding=1, dtype=self.dtype,
                     name="sfenet1")(x)
        x = nn.Conv(self.g0, (3, 3), padding=1, dtype=self.dtype,
                    name="sfenet2")(f1)
        outs = []
        for i in range(d):
            x = RDB(self.g0, g, c, dtype=self.dtype, name=f"rdb_{i}")(x)
            outs.append(x)
        x = jnp.concatenate(outs, axis=-1)
        x = nn.Conv(self.g0, (1, 1), dtype=self.dtype, name="gff_0")(x)
        x = nn.Conv(self.g0, (3, 3), padding=1, dtype=self.dtype,
                    name="gff_1")(x)
        x = x + f1
        # UPNet (rdn_arch.py:77-93): r∈{2,3}: conv(G r²)+shuffle+conv;
        # r=4: two conv(4G)+shuffle(2) stages + conv.
        r = self.upscale
        if r in (2, 3):
            x = nn.Conv(g * r * r, (3, 3), padding=1, dtype=self.dtype,
                        name="upnet_0")(x)
            x = pixel_shuffle(x, r)
            x = nn.Conv(self.n_colors, (3, 3), padding=1, dtype=self.dtype,
                        name="upnet_2")(x)
        elif r == 4:
            x = nn.Conv(g * 4, (3, 3), padding=1, dtype=self.dtype,
                        name="upnet_0")(x)
            x = pixel_shuffle(x, 2)
            x = nn.Conv(g * 4, (3, 3), padding=1, dtype=self.dtype,
                        name="upnet_2")(x)
            x = pixel_shuffle(x, 2)
            x = nn.Conv(self.n_colors, (3, 3), padding=1, dtype=self.dtype,
                        name="upnet_4")(x)
        else:
            raise ValueError("RDN upscale must be 2, 3 or 4")
        return x


class SwinIR(nn.Module):
    """Full SwinIR (`swinir_arch.py:699-938`), upsampler modes:
    'pixelshuffle' (classical), 'pixelshuffledirect' (lightweight),
    'nearest+conv' (real-world, x4 only), '' (denoise/CAR: image residual).

    (B, H, W, C) -> (B, sH, sW, C); H, W divisible by window_size.
    """
    upscale: int = 4
    in_chans: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6)
    window_size: int = 7
    mlp_ratio: float = 4.0
    num_feat: int = 64
    img_range: float = 1.0
    upsampler: str = ""
    rgb_mean: Tuple[float, ...] = DIV2K_RGB_MEAN
    dtype: Any = jnp.float32

    def _features(self, x):
        """forward_features (swinir_arch.py:878-890): patch norm, RSTBs,
        final norm."""
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="patch_embed_norm")(x)
        for i, depth in enumerate(self.depths):
            x = RSTB(self.embed_dim, depth, self.num_heads[i],
                     self.window_size, self.mlp_ratio, dtype=self.dtype,
                     name=f"layer_{i}")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)

    @nn.compact
    def __call__(self, x):
        mean = (jnp.asarray(self.rgb_mean, dtype=x.dtype)
                if self.in_chans == 3 else jnp.zeros((1,), dtype=x.dtype))
        x = (x - mean) * self.img_range

        conv_first = nn.Conv(self.embed_dim, (3, 3), padding=1,
                             dtype=self.dtype, name="conv_first")
        conv_after_body = nn.Conv(self.embed_dim, (3, 3), padding=1,
                                  dtype=self.dtype, name="conv_after_body")

        if self.upsampler == "pixelshuffle":
            x = conv_first(x)
            x = conv_after_body(self._features(x)) + x
            x = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                        name="conv_before_upsample_0")(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
            x = Upsample(self.upscale, self.num_feat, dtype=self.dtype,
                         name="upsample")(x)
            x = nn.Conv(self.in_chans, (3, 3), padding=1, dtype=self.dtype,
                        name="conv_last")(x)
        elif self.upsampler == "pixelshuffledirect":
            x = conv_first(x)
            x = conv_after_body(self._features(x)) + x
            x = UpsampleOneStep(self.upscale, self.in_chans,
                                dtype=self.dtype, name="upsample")(x)
        elif self.upsampler == "nearest+conv":
            if self.upscale != 4:
                raise ValueError("nearest+conv supports x4 only")
            x = conv_first(x)
            x = conv_after_body(self._features(x)) + x
            x = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                        name="conv_before_upsample_0")(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
            for name in ("conv_up1", "conv_up2"):
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(self.num_feat, (3, 3), padding=1,
                            dtype=self.dtype, name=name)(x)
                x = nn.leaky_relu(x, negative_slope=0.2)
            x = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                        name="conv_hr")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
            x = nn.Conv(self.in_chans, (3, 3), padding=1, dtype=self.dtype,
                        name="conv_last")(x)
        else:  # denoising / CAR: image-space residual
            x_first = conv_first(x)
            res = conv_after_body(self._features(x_first)) + x_first
            x = x + nn.Conv(self.in_chans, (3, 3), padding=1,
                            dtype=self.dtype, name="conv_last")(res)

        return x / self.img_range + mean


class HAT(nn.Module):
    """Full HAT classical SR (`hat_arch.py:709-984`, upsampler
    'pixelshuffle'): paper-style RHAG trunk + pixel-shuffle head."""
    upscale: int = 4
    in_chans: int = 3
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
    img_range: float = 1.0
    rgb_mean: Tuple[float, ...] = DIV2K_RGB_MEAN
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mean = (jnp.asarray(self.rgb_mean, dtype=x.dtype)
                if self.in_chans == 3 else jnp.zeros((1,), dtype=x.dtype))
        x = (x - mean) * self.img_range

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
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = Upsample(self.upscale, self.num_feat, dtype=self.dtype,
                     name="upsample")(x)
        x = nn.Conv(self.in_chans, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_last")(x)
        return x / self.img_range + mean

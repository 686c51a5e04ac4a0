"""Shared model building blocks (flax.linen, NHWC layout).

TPU-first conventions used across all models:
- images/features are NHWC (XLA's preferred conv layout on TPU);
- parameters are fp32; compute dtype is configurable (bf16 for the
  "enhanced/AMP" model family, matching the reference's autocast usage);
- torch-checkpoint compatibility is maintained by keeping the same
  module/parameter topology as the reference so a converter can map
  state_dicts 1:1 (see gsasr_tpu/utils/torch_convert.py).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def pixel_shuffle(x, factor: int):
    """NHWC pixel shuffle, equivalent to torch.nn.PixelShuffle on NCHW.

    torch PixelShuffle maps channel index (c_out * r^2) with layout
    (C, r, r) -> spatial; we replicate that exact channel ordering so
    converted weights produce identical outputs.
    """
    b, h, w, c = x.shape
    r = factor
    c_out = c // (r * r)
    # torch layout: channels ordered as (c_out, r_h, r_w)
    x = x.reshape(b, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r_h, w, r_w, c_out
    return x.reshape(b, h * r, w * r, c_out)


class Conv3x3(nn.Module):
    """3x3 same-padded conv (bias=True), the workhorse of every arch."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class MLP(nn.Module):
    """fc1 -> act -> fc2 (reference `utils/fea2gs.py:102-113`)."""
    hidden: int
    out: int
    act: Callable = nn.relu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


def layer_norm(name: str, dtype=jnp.float32) -> nn.LayerNorm:
    """LayerNorm with torch-compatible eps (1e-5; flax default is 1e-6)."""
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=name)


class DropPath(nn.Module):
    """Stochastic depth (timm-style, reference `utils/swinir.py:96-122`):
    at train time each sample's residual branch is dropped with
    probability `rate` and survivors are scaled by 1/keep; identity at
    eval. Parameter-free (checkpoint-topology neutral); consumes the
    'droppath' rng stream when active."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))

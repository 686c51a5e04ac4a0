"""EDSR-baseline encoder without upsampler ("NOUP").

Mirrors `/root/reference/utils/edsrbaseline.py:86-107`: conv_first ->
16x ResidualBlockNoBN -> conv_after_body, returning the *residual branch*
(`return res`, not `res + x` — edsrbaseline.py:104-107; this quirk is
load-bearing for checkpoint parity).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class ResidualBlockNoBN(nn.Module):
    """conv-relu-conv residual block (`edsrbaseline.py:58-82`)."""
    num_feat: int = 64
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(out)
        out = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                      name="conv2")(out)
        return identity + out * self.res_scale


class EDSRNOUP(nn.Module):
    """EDSR trunk, NHWC in/out: (B, H, W, 3) -> (B, H, W, num_feat)."""
    num_in_ch: int = 3
    num_feat: int = 64
    num_block: int = 16
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_first")(x)
        res = x
        for i in range(self.num_block):
            res = ResidualBlockNoBN(self.num_feat, self.res_scale,
                                    dtype=self.dtype, name=f"body_{i}")(res)
        res = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                      name="conv_after_body")(res)
        # Reference returns the residual branch only (edsrbaseline.py:104-107).
        return res

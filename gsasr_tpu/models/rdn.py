"""RDN encoder without upsampler ("NOUP").

Mirrors `/root/reference/utils/rdn.py:45-114`: config 'B' (16 RDBs x 8 dense
conv layers, growth 64), shallow feature extraction (SFENet1/2), local
feature fusion per RDB, global feature fusion over all RDB outputs, long
residual to the first shallow feature; upsampler omitted (out = 64ch).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

_CONFIGS = {"A": (20, 6, 32), "B": (16, 8, 64)}


class RDB(nn.Module):
    """Residual dense block (`rdn.py:27-43`)."""
    g0: int
    growth: int
    n_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        for c in range(self.n_layers):
            out = nn.Conv(self.growth, (3, 3), padding=1, dtype=self.dtype,
                          name=f"conv_{c}")(x)
            out = nn.relu(out)
            x = jnp.concatenate([x, out], axis=-1)
        # Local feature fusion: 1x1 back to G0, + residual.
        x = nn.Conv(self.g0, (1, 1), dtype=self.dtype, name="lff")(x)
        return x + inp


class RDNNOUP(nn.Module):
    """(B, H, W, 3) -> (B, H, W, G0) NHWC."""
    g0: int = 64
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
        return x + f1

"""Device mesh / sharding helpers.

The reference scales with PyTorch DDP over NCCL (`basicsr/models/
base_model.py:88-102`, `basicsr/utils/dist_util.py:11-64`). TPU-native
equivalent: a `jax.sharding.Mesh` over all devices with a 'data' axis;
parameters replicated, batches sharded on 'data'. Under `jax.jit` XLA inserts
the gradient all-reduce (psum) over ICI automatically — no process groups,
no explicit collectives.

Multi-host: `jax.distributed.initialize()` + the same mesh over
`jax.devices()` spans hosts; each host feeds its local shard
(`EnlargedSampler`-style per-host data sharding lives in gsasr_tpu.data).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(n_data: int, n_band: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """(data, band) mesh for spatial x data-parallel training: gradients
    all-reduce over both axes (XLA psum over ICI), the training canvas is
    sharded P('data', 'band') along (batch, rows). The Trainer switches to
    the banded rasterizer when it sees a 'band' axis."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= n_data * n_band, (len(devices), n_data, n_band)
    arr = np.asarray(devices[:n_data * n_band]).reshape(n_data, n_band)
    return Mesh(arr, ("data", "band"))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

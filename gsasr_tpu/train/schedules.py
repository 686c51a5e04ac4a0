"""LR schedules matching the reference trainers.

- MultiStepRestartLR (`basicsr/models/lr_scheduler.py:6-46`): lr *= gamma at
  each milestone (restarts unused by GSASR configs).
- CosineAnnealingRestartLR (`lr_scheduler.py:49-96`): cosine within periods.
- Linear warmup over warmup_iter steps multiplies the base schedule
  (`base_model.py:182-203`: init_lr * current_iter / warmup_iter).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def multistep_warmup_schedule(base_lr: float, milestones: Sequence[int],
                              gamma: float = 0.5, warmup_iter: int = -1):
    """MultiStepLR x linear warmup, as an optax-style schedule fn."""
    ms = jnp.asarray(sorted(milestones), jnp.int32)

    def schedule(step):
        step = jnp.asarray(step, jnp.int32)
        decays = jnp.sum(step >= ms)
        lr = base_lr * (gamma ** decays)
        if warmup_iter > 0:
            warm = jnp.minimum(
                (step.astype(jnp.float32) + 1.0) / warmup_iter, 1.0)
            lr = lr * warm
        return lr

    return schedule


def cosine_restart_schedule(base_lr: float, periods: Sequence[int],
                            restart_weights: Sequence[float] = None,
                            eta_min: float = 0.0, warmup_iter: int = -1):
    """CosineAnnealingRestartLR (`lr_scheduler.py:49-96`)."""
    restart_weights = list(restart_weights or [1.0] * len(periods))
    assert len(periods) == len(restart_weights)
    cum = [0]
    for p in periods:
        cum.append(cum[-1] + p)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.asarray(eta_min, jnp.float32)
        for i, period in enumerate(periods):
            in_period = (step >= cum[i]) & (step < cum[i + 1])
            frac = (step - cum[i]) / period
            val = eta_min + restart_weights[i] * 0.5 * (base_lr - eta_min) * (
                1 + jnp.cos(jnp.pi * frac))
            lr = jnp.where(in_period, val, lr)
        if warmup_iter > 0:
            lr = lr * jnp.minimum((step + 1.0) / warmup_iter, 1.0)
        return lr

    return schedule

"""GAN losses — equivalent of `basicsr/losses/gan_loss.py` (vanilla / lsgan
/ wgan / wgan_softplus / hinge GANLoss + R1/path-length/gradient penalties).
Unused by the GSASR configs but part of the framework surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gan_loss(pred, target_is_real: bool, gan_type: str = "vanilla",
             is_disc: bool = False, real_label: float = 1.0,
             fake_label: float = 0.0, loss_weight: float = 1.0):
    """`gan_loss.py:11-105` semantics."""
    if gan_type == "vanilla":
        label = real_label if target_is_real else fake_label
        loss = jnp.mean(
            jnp.maximum(pred, 0) - pred * label
            + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    elif gan_type == "lsgan":
        label = real_label if target_is_real else fake_label
        loss = jnp.mean((pred - label) ** 2)
    elif gan_type == "wgan":
        loss = -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    elif gan_type == "wgan_softplus":
        loss = jnp.mean(jax.nn.softplus(-pred) if target_is_real
                        else jax.nn.softplus(pred))
    elif gan_type == "hinge":
        if is_disc:
            p = -pred if target_is_real else pred
            loss = jnp.mean(jax.nn.relu(1 + p))
        else:
            loss = -jnp.mean(pred)
    else:
        raise NotImplementedError(gan_type)
    return loss if is_disc else loss * loss_weight


def r1_penalty(disc_fn, real):
    """R1 gradient penalty (`gan_loss.py:150-168`)."""
    grads = jax.grad(lambda x: disc_fn(x).sum())(real)
    return jnp.sum(grads ** 2) / real.shape[0]


def gradient_penalty(disc_fn, real, fake, key):
    """WGAN-GP interpolate penalty (`gan_loss.py:188-207`)."""
    alpha = jax.random.uniform(key, (real.shape[0],) + (1,) * (real.ndim - 1))
    interp = real * alpha + fake * (1 - alpha)
    grads = jax.grad(lambda x: disc_fn(x).sum())(interp)
    norms = jnp.sqrt(jnp.sum(grads.reshape(real.shape[0], -1) ** 2, axis=1)
                     + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)

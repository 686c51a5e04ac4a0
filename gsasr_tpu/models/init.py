"""Torch-faithful parameter (re-)initialization for training from scratch.

The reference trains from PyTorch default initializers plus a few explicit
schemes; flax's defaults (lecun_normal kernels, zero biases) are materially
different — at the production decoder width they leave the raw Gaussian-head
outputs with std ~7, saturating the sigmoid/tanh activations of
`generate_2D_gaussian_splatting_step` (reference `utils/gaussian_splatting.py:
174-180`) and making from-scratch training brutally ill-conditioned. With the
torch scheme the raw head std at init is ~0.05.

Reference init rules reproduced here:

- torch ``nn.Linear``/``nn.Conv2d`` default (`torch/nn/modules/linear.py`):
  weight ~ kaiming_uniform(a=sqrt(5)) = U(+-1/sqrt(fan_in)),
  bias ~ U(+-1/sqrt(fan_in)).  Used by EDSR*/RDN* (all GSASR configs pass
  ``pytorch_init=True``, `basicsr/archs/edsr_arch.py:45`) and by every
  Fea2GS linear/conv.
- SwinIR/HAT `_init_weights` (`utils/swinir.py:940-947`,
  `utils/hatropeamp.py:1025-1032`): nn.Linear weights ~ trunc_normal(0.02),
  biases 0; LayerNorm 1/0; convs keep the torch default.
- ``nn.MultiheadAttention`` (`gs_cross_attn_scale`): in_proj_weight (3E, E)
  ~ xavier_uniform over the stacked matrix = U(+-sqrt(1.5/E)); in_proj and
  out_proj biases 0; out_proj weight keeps the Linear default
  (torch ``MultiheadAttention._reset_parameters``).
- Parameters whose flax param-definition already matches the reference are
  left untouched: relative position bias tables (trunc_normal 0.02,
  `utils/fea2gs.py:151,313`), gs/pos embeddings (randn,
  `utils/fea2gs.py:470-471`), RoPE frequencies (`init_random_2d_freqs`),
  absolute_pos_embed, LayerNorm scale/bias.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import traverse_util

# Model classes whose torch counterparts apply the SwinIR-style
# `_init_weights` (trunc_normal Linear weights, zero Linear biases).
SWINLIKE = ("SwinIR", "HAT")

# Leaves never redrawn (their flax initializers already match torch).
_PRESERVE = (
    "relative_position_bias_table", "gs_embedding", "pos_embedding",
    "rope_freqs", "absolute_pos_embed", "relative_position_index",
)


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def torch_linear_kernel(key, shape):
    """kaiming_uniform(a=sqrt(5)): U(+-1/sqrt(fan_in)); flax kernels are
    (..., in, out) for Dense / (kh, kw, in, out) for Conv, fan_in =
    prod(shape[:-1]) in both cases (matches torch's _calculate_fan_in)."""
    fan_in = int(math.prod(shape[:-1]))
    return _uniform(key, shape, 1.0 / math.sqrt(fan_in))


def torch_init(module, params, rng):
    """Redraw `params` of a flax `module` with torch-faithful initializers.

    Parameter paths are unchanged (safe for the torch checkpoint converter);
    only values are redrawn. Returns a new params tree.
    """
    swinlike = any(k in type(module).__name__ for k in SWINLIKE)
    flat = traverse_util.flatten_dict(params)
    out = {}
    keys = sorted(flat.keys())
    rngs = jax.random.split(rng, max(len(keys), 1))
    for key_path, leaf_rng in zip(keys, rngs):
        leaf = flat[key_path]
        name = key_path[-1]
        path = "/".join(key_path)
        if name in _PRESERVE:
            out[key_path] = leaf
            continue
        in_scale_attn = "gs_cross_attn_scale" in key_path
        if in_scale_attn:
            # nn.MultiheadAttention parameterization (see module docstring).
            dim = leaf.shape[0]
            if name in ("q_proj_dead", "k_proj_dead"):
                out[key_path] = _uniform(leaf_rng, leaf.shape,
                                         math.sqrt(1.5 / dim))
            elif key_path[-2] == "v_proj" and name == "kernel":
                out[key_path] = _uniform(leaf_rng, leaf.shape,
                                         math.sqrt(1.5 / dim))
            elif name == "bias":
                out[key_path] = jnp.zeros_like(leaf)
            elif name == "kernel":  # out_proj: Linear default weight
                out[key_path] = torch_linear_kernel(leaf_rng, leaf.shape)
            else:
                out[key_path] = leaf
            continue
        if name == "kernel":
            if swinlike and leaf.ndim == 2:
                out[key_path] = 0.02 * jax.random.truncated_normal(
                    leaf_rng, -2 / 0.02, 2 / 0.02, leaf.shape, jnp.float32)
            else:
                out[key_path] = torch_linear_kernel(leaf_rng, leaf.shape)
        elif name == "bias":
            parent = key_path[:-1]
            kernel = flat.get(parent + ("kernel",))
            if kernel is None:
                out[key_path] = leaf  # LayerNorm bias et al: keep zeros
            elif swinlike and kernel.ndim == 2:
                out[key_path] = jnp.zeros_like(leaf)
            else:
                fan_in = int(math.prod(kernel.shape[:-1]))
                out[key_path] = _uniform(leaf_rng, leaf.shape,
                                         1.0 / math.sqrt(fan_in))
        else:
            out[key_path] = leaf
    new = traverse_util.unflatten_dict(out)
    return jax.tree_util.tree_map(
        lambda a, b: a.astype(b.dtype), new, params)


def init_with_torch_defaults(module, rng, *example_args):
    """`module.init` followed by `torch_init` (one-call convenience)."""
    rng_shapes, rng_vals = jax.random.split(rng)
    params = module.init(rng_shapes, *example_args)["params"]
    return torch_init(module, params, rng_vals)

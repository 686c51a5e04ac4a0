"""Torch-faithful initialization (gsasr_tpu/models/init.py).

The reference trains from torch default init (kaiming_uniform a=sqrt(5) for
Linear/Conv, SwinIR-style trunc_normal(0.02) for Swin/HAT Linears,
xavier-uniform MHA in_proj). These tests check both the drawn distributions
and the end effect: raw Gaussian-head outputs at init must sit in the linear
region of the sigmoid/tanh activations, like the reference's
(std ~0.05, see reference `utils/gaussian_splatting.py:174-180`).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsasr_tpu.models import (EDSRNOUP, Fea2GS, SwinIRNOUP,
                              init_with_torch_defaults)
from gsasr_tpu.models.init import torch_init


@pytest.fixture(scope="module")
def fea2gs_small():
    dec = Fea2GS(inchannel=64, channel=60, num_selfattn_blocks=2,
                 num_selfattn_layers=2)
    params = init_with_torch_defaults(
        dec, jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 64)),
        jnp.ones((1,)))
    return dec, params


def test_linear_default_distribution(fea2gs_small):
    _, params = fea2gs_small
    w = params["mlp_block_sigma"]["fc0"]["kernel"]
    b = params["mlp_block_sigma"]["fc0"]["bias"]
    fan_in = w.shape[0]
    bound = 1 / math.sqrt(fan_in)
    assert float(jnp.abs(w).max()) <= bound
    assert float(jnp.abs(b).max()) <= bound
    # uniform(+-bound) has std bound/sqrt(3)
    assert float(w.std()) == pytest.approx(bound / math.sqrt(3), rel=0.1)
    assert float(jnp.abs(b).max()) > 0  # torch biases are NOT zero


def test_conv_default_distribution(fea2gs_small):
    _, params = fea2gs_small
    w = params["img_feat_proj_0"]["kernel"]  # (3, 3, 64, 60)
    fan_in = 3 * 3 * 64
    bound = 1 / math.sqrt(fan_in)
    assert float(jnp.abs(w).max()) <= bound
    assert float(w.std()) == pytest.approx(bound / math.sqrt(3), rel=0.1)


def test_preserved_leaves(fea2gs_small):
    _, params = fea2gs_small
    # embeddings stay randn-like
    assert float(params["gs_embedding"].std()) == pytest.approx(1.0, rel=0.1)
    # rel-pos bias tables stay trunc_normal(0.02)
    t = params["window_crossattn_blocks_0"]["blocks_0"]["window_cross_attn"][
        "relative_position_bias_table"]
    assert float(t.std()) == pytest.approx(0.02, rel=0.2)
    # LayerNorm untouched (scale ones, bias zeros)
    ln = params["window_crossattn_blocks_0"]["norm"]
    assert float(jnp.abs(ln["scale"] - 1).max()) == 0
    assert float(jnp.abs(ln["bias"]).max()) == 0


def test_scale_attn_mha_init(fea2gs_small):
    _, params = fea2gs_small
    sa = params["window_crossattn_blocks_0"]["blocks_0"]["gs_cross_attn_scale"]
    dim = sa["v_proj"]["kernel"].shape[0]
    bound = math.sqrt(1.5 / dim)  # xavier over the stacked (3E, E) in_proj
    assert float(jnp.abs(sa["v_proj"]["kernel"]).max()) <= bound
    assert float(sa["v_proj"]["kernel"].std()) == pytest.approx(
        bound / math.sqrt(3), rel=0.15)
    assert float(jnp.abs(sa["v_proj"]["bias"]).max()) == 0
    assert float(jnp.abs(sa["out_proj"]["bias"]).max()) == 0
    # out_proj weight keeps the Linear default
    ob = 1 / math.sqrt(dim)
    assert float(jnp.abs(sa["out_proj"]["kernel"]).max()) <= ob


def test_swinlike_trunc_normal():
    enc = SwinIRNOUP(embed_dim=24, depths=(2,), num_heads=(2,), window_size=4)
    params = init_with_torch_defaults(
        enc, jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
    from flax import traverse_util
    fd = traverse_util.flatten_dict(params)
    found_dense = found_conv = False
    for kp, v in fd.items():
        if kp[-1] == "kernel" and v.ndim == 2:
            found_dense = True
            assert float(v.std()) == pytest.approx(0.02, rel=0.25), kp
            b = fd.get(kp[:-1] + ("bias",))
            if b is not None:
                assert float(jnp.abs(b).max()) == 0, kp
        if kp[-1] == "kernel" and v.ndim == 4:
            found_conv = True
            fan_in = int(np.prod(v.shape[:-1]))
            assert float(jnp.abs(v).max()) <= 1 / math.sqrt(fan_in), kp
    assert found_dense and found_conv


def test_head_outputs_unsaturated(fea2gs_small):
    """The actual point: raw head outputs at init must not saturate the
    activations. Torch reference measures std ~0.05 at this config."""
    dec, params = fea2gs_small
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 24, 24, 64)).astype(np.float32))
    out = dec.apply({"params": params}, x, jnp.full((1,), 2.7, jnp.float32))
    raw = np.asarray(out).reshape(-1, 9)
    # channels 0..6 are sigma/rho/alpha/rgb raw logits
    assert raw[:, :7].std() < 0.3, raw[:, :7].std()
    # means stay near the reference grid (channel 7, 8 are mu after the
    # lattice normalization + reference-point shift, in [0, 1] mostly)
    assert abs(raw[:, 7:].mean() - 0.5) < 0.1


def test_torch_init_preserves_structure(fea2gs_small):
    dec, params = fea2gs_small
    p2 = torch_init(dec, params, jax.random.PRNGKey(7))
    assert jax.tree_util.tree_structure(p2) == \
        jax.tree_util.tree_structure(params)
    for a, b in zip(jax.tree_util.tree_leaves(p2),
                    jax.tree_util.tree_leaves(params)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_encoder_plain_torch_default():
    enc = EDSRNOUP(num_feat=16, num_block=1)
    params = init_with_torch_defaults(
        enc, jax.random.PRNGKey(2), jnp.zeros((1, 8, 8, 3)))
    w = params["conv_first"]["kernel"]
    fan_in = 3 * 3 * 3
    assert float(jnp.abs(w).max()) <= 1 / math.sqrt(fan_in)

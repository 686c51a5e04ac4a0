"""Rendering-orchestration golden tests: activations and unit conversions
must match the reference formulas (`utils/gaussian_splatting.py:88-90,
121-123, 174-180, 203-208`) exactly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gsasr_tpu.rendering import (gs_activations, resolve_dmax,
                                 render_gaussians, to_kernel_units)


def test_activations_formulas(rng):
    p = jnp.asarray(rng.normal(size=(50, 9)).astype(np.float32))
    sx, sy, rho, coords, cwa = gs_activations(p)
    pn = np.asarray(p)

    def sigmoid(x):
        return 1 / (1 + np.exp(-x))

    np.testing.assert_allclose(sx, 0.99999 * sigmoid(pn[:, 0]) + 1e-6,
                               rtol=1e-6)
    np.testing.assert_allclose(sy, 0.99999 * sigmoid(pn[:, 1]) + 1e-6,
                               rtol=1e-6)
    np.testing.assert_allclose(rho, 0.999999 * np.tanh(pn[:, 2]), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(coords, pn[:, 7:9] * 2 - 1, rtol=1e-6)
    np.testing.assert_allclose(
        cwa, sigmoid(pn[:, 4:7]) * sigmoid(pn[:, 3:4]), rtol=1e-5)


def test_kernel_units_swap_and_remap(rng):
    """sigma_y pairs with the w axis and sigma_x with the h axis
    (gaussian_splatting.py:121), and centers are remapped from
    align-corners-False to pixel-center convention (:122-123)."""
    n = 20
    sx = jnp.asarray(rng.random(n, dtype=np.float32))
    sy = jnp.asarray(rng.random(n, dtype=np.float32))
    rho = jnp.asarray(rng.random(n, dtype=np.float32) - 0.5)
    coords = jnp.asarray(2 * rng.random((n, 2), dtype=np.float32) - 1)
    H, W, step = 48, 64, 0.3
    sig, co = to_kernel_units(sx, sy, rho, coords, (H, W), step)
    np.testing.assert_allclose(sig[:, 0], np.asarray(sy) / step * 2 / (W - 1),
                               rtol=1e-6)
    np.testing.assert_allclose(sig[:, 1], np.asarray(sx) / step * 2 / (H - 1),
                               rtol=1e-6)
    np.testing.assert_allclose(sig[:, 2], rho, rtol=1e-6)
    cn = np.asarray(coords)
    np.testing.assert_allclose(
        co[:, 0], (cn[:, 0] + 1 - 1 / W) * W / (W - 1) - 1, rtol=1e-5,
        atol=1e-6)
    np.testing.assert_allclose(
        co[:, 1], (cn[:, 1] + 1 - 1 / H) * H / (H - 1) - 1, rtol=1e-5,
        atol=1e-6)


def test_resolve_dmax():
    assert resolve_dmax(25, "dynamic", (100, 200)) == 27 / 100
    assert resolve_dmax(0.1, "fix", (100, 200)) == 0.1
    with pytest.raises(ValueError):
        resolve_dmax(0.1, "bogus", (10, 10))


def test_render_pallas_vs_dense(rng):
    """End-to-end orchestration: pallas and dense paths agree."""
    p = jnp.asarray(rng.normal(size=(300, 9)).astype(np.float32))
    a = render_gaussians((24, 136), p, 2.0, dmax_mode="dynamic", dmax=25,
                         use_pallas=True)
    b = render_gaussians((24, 136), p, 2.0, dmax_mode="dynamic", dmax=25,
                         use_pallas=False)
    assert a.shape == (3, 24, 136)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-5)


def test_render_batch_shapes(rng):
    from gsasr_tpu.rendering import render_batch
    p = jnp.asarray(rng.normal(size=(2, 64, 9)).astype(np.float32))
    scales = jnp.asarray(np.float32([2.0, 3.0]))
    out = render_batch((16, 16), p, scales, dmax_mode="dynamic")
    assert out.shape == (2, 3, 16, 16)


def test_static_perm_rectangular_lattice(rng):
    """The static lattice-anchor permutation generalizes to rectangular
    lattices via lat_hw (r5): same image as the runtime-sort path on a
    non-square decoder lattice / canvas."""
    import jax.numpy as jnp

    from gsasr_tpu.rendering import render_gaussians

    lat_h, lat_w = 24, 36
    g = jnp.asarray(
        0.3 * rng.standard_normal((lat_h * lat_w, 9)).astype(np.float32))
    sr = (48, 72)
    a = render_gaussians(sr, g, jnp.float32(2.0), dmax_mode="fix", dmax=0.5,
                         static_perm=False)
    b = render_gaussians(sr, g, jnp.float32(2.0), dmax_mode="fix", dmax=0.5,
                         static_perm=True, lat_hw=(lat_h, lat_w))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5,
                               atol=1e-6)
    # n is non-square so without lat_hw the runtime sort must engage and
    # still agree
    c = render_gaussians(sr, g, jnp.float32(2.0), dmax_mode="fix", dmax=0.5,
                         static_perm=True)
    np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=1e-5,
                               atol=1e-6)

"""Degradations surface: kernel priors, noise generate/add modes, batched
device variants, JPEG.

Kernel math is pinned exactly against the mounted reference
(`TrainTestGSASR/basicsr/data/degradations.py`); randomized noise paths are
gated statistically (different RNG streams by design) plus exact checks of
the clip/rounds output algebra and the skimage power-of-two `vals`
convention the reference follows.
"""

import math
import random

import numpy as np
import pytest

from gsasr_tpu.data import degradations as D
from tests.reference_oracle import import_reference_module, \
    reference_available

def _img(seed=0, shape=(24, 20, 3)):
    return np.random.default_rng(seed).random(shape).astype(np.float32)


# ---------------------------------------------------------------- kernels


@pytest.mark.oracle
@pytest.mark.skipif(not reference_available(), reason="no reference mount")
class TestKernelOracle:
    @classmethod
    def setup_class(cls):
        cls.ref = import_reference_module(
            "TrainTestGSASR.basicsr.data.degradations")

    def test_bivariate_gaussian(self):
        for iso, sy, th in [(True, None, 0.0), (False, 2.5, 0.7)]:
            ours = D.bivariate_gaussian(13, 1.8, sy, th, isotropic=iso)
            ref = self.ref.bivariate_Gaussian(13, 1.8, sy or 1.8, th,
                                              isotropic=iso)
            np.testing.assert_allclose(ours, ref, atol=1e-12)

    def test_bivariate_generalized_gaussian(self):
        ours = D.bivariate_generalized_gaussian(11, 2.0, 1.2, 0.3, beta=2.5,
                                                isotropic=False)
        ref = self.ref.bivariate_generalized_Gaussian(
            11, 2.0, 1.2, 0.3, 2.5, isotropic=False)
        np.testing.assert_allclose(ours, ref, atol=1e-12)

    def test_bivariate_plateau(self):
        ours = D.bivariate_plateau(11, 2.0, 1.2, -0.4, beta=1.5,
                                   isotropic=False)
        ref = self.ref.bivariate_plateau(11, 2.0, 1.2, -0.4, 1.5,
                                         isotropic=False)
        np.testing.assert_allclose(ours, ref, atol=1e-12)

    def test_circular_lowpass(self):
        for cutoff, ks, pad in [(math.pi / 2, 13, 0), (1.0, 9, 21)]:
            np.testing.assert_allclose(
                D.circular_lowpass_kernel(cutoff, ks, pad),
                self.ref.circular_lowpass_kernel(cutoff, ks, pad),
                atol=1e-12)

    def test_pdf2(self):
        grid, _, _ = self.ref.mesh_grid(9)
        sm = self.ref.sigma_matrix2(1.5, 0.8, 0.3)
        np.testing.assert_allclose(D.pdf2(sm, grid),
                                   self.ref.pdf2(sm, grid), atol=1e-12)

    def test_cdf2(self):
        grid, _, _ = self.ref.mesh_grid(7)
        d = np.array([[1.0, 0.3], [0.2, 1.0]])
        np.testing.assert_allclose(D.cdf2(d, grid),
                                   self.ref.cdf2(d, grid), atol=1e-9)

    def test_mesh_grid(self):
        g_ref, xx, yy = self.ref.mesh_grid(11)
        g, x2, y2 = D.mesh_grid(11)
        np.testing.assert_array_equal(g, g_ref)
        np.testing.assert_array_equal(x2, xx)


def test_random_bivariate_properties():
    rng = random.Random(7)
    for fn, kw in [
            (D.random_bivariate_gaussian, {}),
            (D.random_bivariate_generalized_gaussian,
             {"beta_range": (0.5, 8)}),
            (D.random_bivariate_plateau, {"beta_range": (1, 4)})]:
        k = fn(13, (0.6, 5), (0.6, 5), (-math.pi, math.pi),
               noise_range=(0.75, 1.25), isotropic=False, rng=rng, **kw)
        assert k.shape == (13, 13)
        assert abs(k.sum() - 1.0) < 1e-9
        assert (k >= 0).all() or fn is not D.random_bivariate_gaussian


def test_random_mixed_kernels_all_kinds():
    rng = random.Random(3)
    kinds = ["iso", "aniso", "generalized_iso", "generalized_aniso",
             "plateau_iso", "plateau_aniso"]
    for kind in kinds:
        k = D.random_mixed_kernels([kind], [1.0], 21,
                                   noise_range=(0.9, 1.1), rng=rng)
        assert k.shape == (21, 21) and abs(k.sum() - 1.0) < 1e-9
    with pytest.raises(ValueError):
        D.random_mixed_kernels(["nope"], [1.0], 21, rng=rng)


# ------------------------------------------------------------------ noise


def test_gaussian_noise_stats_and_gray():
    img = _img(shape=(64, 64, 3))
    rng = random.Random(0)
    noise = D.generate_gaussian_noise(img, sigma=25, gray_noise=True,
                                      rng=rng)
    # gray: all channels identical
    np.testing.assert_array_equal(noise[..., 0], noise[..., 1])
    assert abs(noise.std() - 25 / 255.0) < 0.15 * 25 / 255.0
    color = D.generate_gaussian_noise(img, sigma=25, gray_noise=False,
                                      rng=rng)
    assert not np.array_equal(color[..., 0], color[..., 1])


def test_clip_rounds_modes():
    img = np.full((4, 4, 3), 0.5, np.float32)
    noisy = D.add_gaussian_noise(img, sigma=200, clip=True, rounds=True,
                                 rng=random.Random(1))
    # quantized to uint8 levels and clamped
    assert ((noisy * 255) % 1 < 1e-5).all() and noisy.min() >= 0 \
        and noisy.max() <= 1
    unclipped = D.add_gaussian_noise(img, sigma=200, clip=False,
                                     rounds=False, rng=random.Random(1))
    assert unclipped.min() < 0 or unclipped.max() > 1
    rounded = D.add_gaussian_noise(img, sigma=200, clip=False, rounds=True,
                                   rng=random.Random(1))
    assert ((rounded * 255) % 1 < 1e-5).all()


@pytest.mark.oracle
@pytest.mark.skipif(not reference_available(), reason="no reference mount")
def test_poisson_vals_convention_matches_reference():
    ref = import_reference_module("TrainTestGSASR.basicsr.data.degradations")
    img = _img(5, (32, 32, 3))
    q = np.clip((img * 255.0).round(), 0, 255) / 255.0
    vals_ref = 2 ** np.ceil(np.log2(len(np.unique(q))))
    assert D._poisson_vals(img) == vals_ref
    # and the reference's own noise uses that vals (statistical check):
    np.random.seed(0)
    noise_ref = ref.generate_poisson_noise(q.copy(), scale=1.0)
    noise_ours = D.generate_poisson_noise(q, scale=1.0,
                                          rng=random.Random(0))
    assert abs(noise_ref.std() - noise_ours.std()) < 0.25 * noise_ref.std()


def test_poisson_gray_noise_replicates_channels():
    img = _img(2, (16, 16, 3))
    noise = D.generate_poisson_noise(img, scale=2.0, gray_noise=True,
                                     rng=random.Random(0))
    np.testing.assert_array_equal(noise[..., 0], noise[..., 2])


def test_random_add_wrappers_in_range():
    img = _img(3)
    out = D.random_add_gaussian_noise(img, (0, 20), gray_prob=0.5,
                                      rng=random.Random(0))
    assert out.min() >= 0 and out.max() <= 1 and out.dtype == np.float32
    out = D.random_add_poisson_noise(img, (0.5, 2.0), gray_prob=0.5,
                                     rng=random.Random(0))
    assert out.min() >= 0 and out.max() <= 1


# ------------------------------------------------- batched device variants


def test_gaussian_batch_matches_semantics():
    import jax
    import jax.numpy as jnp

    img = jnp.asarray(np.stack([_img(i, (16, 16, 3)) for i in range(3)]))
    key = jax.random.PRNGKey(0)
    # per-sample sigma: sample 0 gets zero noise
    sigma = jnp.asarray([0.0, 10.0, 50.0])
    noise = D.generate_gaussian_noise_batch(key, img, sigma)
    noise = np.asarray(noise)
    assert np.abs(noise[0]).max() == 0.0
    assert noise[2].std() > noise[1].std()
    # gray mask: sample with gray=1 has identical channels
    gray = jnp.asarray([1.0, 0.0, 0.0])
    ng = np.asarray(D.generate_gaussian_noise_batch(key, img, 30.0, gray))
    np.testing.assert_array_equal(ng[0, ..., 0], ng[0, ..., 1])
    assert not np.array_equal(ng[1, ..., 0], ng[1, ..., 1])


def test_gaussian_batch_jit_compatible():
    import jax
    import jax.numpy as jnp

    img = jnp.asarray(np.stack([_img(i, (8, 8, 3)) for i in range(2)]))

    @jax.jit
    def f(key, img):
        return D.random_add_gaussian_noise_batch(key, img, (0, 0.2), 0.4)

    out = np.asarray(f(jax.random.PRNGKey(1), img))
    assert out.shape == img.shape and out.min() >= 0 and out.max() <= 1


def test_poisson_batch_semantics():
    import jax
    import jax.numpy as jnp

    img = jnp.asarray(np.stack([_img(i, (16, 16, 3)) for i in range(2)]))
    key = jax.random.PRNGKey(0)
    noise = np.asarray(D.generate_poisson_noise_batch(key, img, scale=1.0))
    assert noise.shape == img.shape
    # zero scale kills the noise
    z = np.asarray(D.generate_poisson_noise_batch(key, img, scale=0.0))
    assert np.abs(z).max() == 0.0
    # gray: channels identical
    g = np.asarray(D.generate_poisson_noise_batch(key, img, 1.0,
                                                  gray_noise=1.0))
    np.testing.assert_array_equal(g[..., 0], g[..., 2])
    out = np.asarray(D.random_add_poisson_noise_batch(
        jax.random.PRNGKey(2), img, (0.5, 1.5), 0.5))
    assert out.min() >= 0 and out.max() <= 1


# ------------------------------------------------------------------- JPEG


def test_jpeg_roundtrip_and_alias():
    img = _img(9, (32, 32, 3))
    out = D.add_jpg_compression(img, 90)
    assert out.shape == img.shape and out.dtype == np.float32
    # lower quality -> larger error
    e_hi = np.abs(D.add_jpg_compression(img, 95) - img).mean()
    e_lo = np.abs(D.add_jpg_compression(img, 10) - img).mean()
    assert e_lo > e_hi
    r = D.random_add_jpg_compression(img, (30, 95), rng=random.Random(0))
    assert r.shape == img.shape

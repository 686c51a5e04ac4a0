"""DiffJPEG parity vs the reference torch implementation + gradient test."""

import numpy as np
import pytest

from tests.reference_oracle import import_reference_file, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not mounted")


def _ref_diffjpeg():
    return import_reference_file(
        "TrainTestGSASR/basicsr/utils/diffjpeg.py", "diffjpeg")


@pytest.mark.parametrize("quality,differentiable", [(90, True), (30, True),
                                                    (60, False)])
def test_diffjpeg_parity(quality, differentiable):
    import torch
    ref = _ref_diffjpeg()
    import jax.numpy as jnp
    from gsasr_tpu.data.diffjpeg import diff_jpeg

    rng = np.random.default_rng(0)
    # 20x24: not divisible by 16, exercises the pad path
    img = rng.random((2, 20, 24, 3), dtype=np.float32)
    net = ref.DiffJPEG(differentiable=differentiable)
    with torch.no_grad():
        y_ref = net(torch.from_numpy(
            np.ascontiguousarray(img.transpose(0, 3, 1, 2))),
            quality=quality).numpy().transpose(0, 2, 3, 1)
    y = np.asarray(diff_jpeg(jnp.asarray(img), quality,
                             differentiable=differentiable))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=2e-5)


def test_diffjpeg_per_sample_quality():
    import torch
    ref = _ref_diffjpeg()
    import jax.numpy as jnp
    from gsasr_tpu.data.diffjpeg import diff_jpeg

    rng = np.random.default_rng(1)
    img = rng.random((2, 16, 16, 3), dtype=np.float32)
    qual = np.array([35.0, 80.0], dtype=np.float32)
    net = ref.DiffJPEG(differentiable=True)
    with torch.no_grad():
        y_ref = net(torch.from_numpy(
            np.ascontiguousarray(img.transpose(0, 3, 1, 2))),
            quality=torch.from_numpy(qual.copy())
        ).numpy().transpose(0, 2, 3, 1)
    y = np.asarray(diff_jpeg(jnp.asarray(img), jnp.asarray(qual)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=2e-5)


def test_diffjpeg_differentiable():
    import jax
    import jax.numpy as jnp
    from gsasr_tpu.data.diffjpeg import diff_jpeg

    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))

    def loss(x):
        return jnp.mean((diff_jpeg(x, 50.0) - 0.5) ** 2)

    g = jax.grad(loss)(img)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0

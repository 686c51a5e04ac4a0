"""Bicubic-resize parity vs the reference's MATLAB-faithful torch loops."""

import numpy as np
import pytest

from tests.reference_oracle import import_reference_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted")


@pytest.mark.parametrize("shape,scale", [
    ((17, 23, 3), 0.25),
    ((32, 32, 3), 0.5),
    ((12, 20, 3), 2.0),
    ((48, 48), 1 / 3.7),
])
def test_imresize_parity(rng, shape, scale):
    ref = import_reference_module(
        "TrainTestGSASR.basicsr.utils.matlab_functions")
    from gsasr_tpu.data import imresize

    img = rng.random(shape).astype(np.float32)
    out_ref = ref.imresize(img, scale)
    out = imresize(img, scale)
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("scale_h,scale_w", [
    (0.3117, 0.3117),
    (1 / 2.71828, 1 / 2.71828),
    (0.5, 0.5),
])
def test_imresize_new_parity(rng, scale_h, scale_w):
    ref = import_reference_module(
        "TrainTestGSASR.basicsr.utils.matlab_functions")
    from gsasr_tpu.data import imresize_new

    img = rng.random((37, 41, 3)).astype(np.float32)
    out_ref = ref.imresize_new(img, scale_h, scale_w)
    out = imresize_new(img, scale_h, scale_w)
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-5)


def test_native_resize_matches_numpy(rng):
    from gsasr_tpu.data.matlab_resize import _resize_hw, imresize_new
    from gsasr_tpu.native import resize_hwc_native

    img = rng.random((37, 41, 3)).astype(np.float32)
    for s in (0.31, 0.5, 1 / 2.71828):
        out_h, out_w = round(37 * s), round(41 * s)
        native = resize_hwc_native(img, out_h, out_w, s, s)
        if native is None:
            pytest.skip("no native toolchain")
        ref = _resize_hw(img, out_h, out_w, s, s, True)
        np.testing.assert_allclose(native, ref, rtol=1e-4, atol=1e-5)

"""NIQE: bundled pristine params + golden value + reference oracle parity.

The pristine MVG statistics are a constant table bundled at
`gsasr_tpu/assets/niqe_pris_params.npz` (copied from
`TrainTestGSASR/basicsr/metrics/niqe_pris_params.npz` — constant data, not
code), so `calculate_niqe` must run without the reference mount.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

from gsasr_tpu.metrics_niqe import calculate_niqe


def _test_image():
    rng = np.random.default_rng(42)
    img = (rng.random((128, 128, 3)) * 255).astype(np.float64)
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(img, (2, 2, 0)).astype(np.float32)


def test_niqe_bundled_golden(monkeypatch):
    """Runs from the bundled asset (reference path removed) and reproduces
    the value the reference implementation gives on the same image."""
    import gsasr_tpu.metrics_niqe as mod

    monkeypatch.setattr(mod, "_PARAMS_PATHS", [mod._PARAMS_PATHS[1]])
    assert "assets" in mod._PARAMS_PATHS[0]
    val = calculate_niqe(_test_image(), crop_border=0)
    # reference basicsr.metrics.niqe on this image: 8.445464
    assert abs(val - 8.4455) < 5e-3


@pytest.mark.oracle
def test_niqe_vs_reference_oracle():
    from reference_oracle import reference_available

    if not reference_available():
        pytest.skip("reference not mounted")

    def load(relpath, fullname):
        spec = importlib.util.spec_from_file_location(
            fullname, "/root/reference/TrainTestGSASR/" + relpath)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[fullname] = mod
        spec.loader.exec_module(mod)
        return mod

    for pkg in ("basicsr", "basicsr.metrics", "basicsr.utils"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    load("basicsr/utils/registry.py", "basicsr.utils.registry")
    load("basicsr/utils/matlab_functions.py", "basicsr.utils.matlab_functions")
    cu = load("basicsr/utils/color_util.py", "basicsr.utils.color_util")
    sys.modules["basicsr.utils"].bgr2ycbcr = cu.bgr2ycbcr
    load("basicsr/metrics/metric_util.py", "basicsr.metrics.metric_util")
    ref = load("basicsr/metrics/niqe.py", "basicsr.metrics.niqe")

    img = _test_image()
    ref_val = ref.calculate_niqe(img, crop_border=0)
    ours = calculate_niqe(img, crop_border=0)
    assert abs(ours - ref_val) < 1e-3

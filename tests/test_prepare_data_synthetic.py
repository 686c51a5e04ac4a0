"""Synthetic-corpus generator families (`prepare_data synthetic --family`,
r5 corpus v3): each family must produce deterministic, well-formed,
non-degenerate images."""

import numpy as np
import pytest


@pytest.mark.parametrize("family", ["dead-leaves", "text", "texture",
                                    "composite"])
def test_synthetic_family_generates(tmp_path, family):
    import cv2

    from gsasr_tpu.cli.prepare_data import synthetic

    d1 = tmp_path / "a"
    synthetic(str(d1), n=2, size=64, seed=3, family=family, workers=1)
    files = sorted(d1.iterdir())
    assert len(files) == 2
    imgs = [cv2.imread(str(f)) for f in files]
    for img in imgs:
        assert img is not None and img.shape == (64, 64, 3)
        # non-degenerate: some spatial structure
        assert img.std() > 1.0
    # deterministic in the seed
    d2 = tmp_path / "b"
    synthetic(str(d2), n=2, size=64, seed=3, family=family, workers=1)
    for f1, f2 in zip(files, sorted(d2.iterdir())):
        a = cv2.imread(str(f1))
        b = cv2.imread(str(f2))
        np.testing.assert_array_equal(a, b)

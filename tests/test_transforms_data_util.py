"""transforms.py + data_util.py tail: parity against the mounted reference.

Randomized transforms are pinned EXACTLY: both implementations draw from a
Mersenne stream in the same order, so seeding `random.seed(s)` for the
reference and passing `random.Random(s)` to ours must give identical
outputs (crop offsets, flip decisions, angles, rescale factors).
"""

import random

import numpy as np
import pytest

from gsasr_tpu.data import data_util as DU
from gsasr_tpu.data import transforms as T
from tests.reference_oracle import import_reference_file, \
    reference_available

def _img(seed=0, shape=(40, 36, 3)):
    return np.random.default_rng(seed).random(shape).astype(np.float32)


@pytest.fixture(scope="module")
def ref_transforms():
    if not reference_available():
        pytest.skip("no reference mount")
    # load standalone: transforms.py imports basicsr.utils.matlab_functions
    import sys
    import types

    if "basicsr" not in sys.modules:
        pkg = types.ModuleType("basicsr")
        utils = types.ModuleType("basicsr.utils")
        mf = import_reference_file(
            "TrainTestGSASR/basicsr/utils/matlab_functions.py",
            "basicsr.utils.matlab_functions")
        utils.matlab_functions = mf
        pkg.utils = utils
        sys.modules["basicsr"] = pkg
        sys.modules["basicsr.utils"] = utils
        sys.modules["basicsr.utils.matlab_functions"] = mf
    return import_reference_file(
        "TrainTestGSASR/basicsr/data/transforms.py", "ref_transforms")


@pytest.fixture(scope="module")
def ref_data_util(ref_transforms):
    if not reference_available():
        pytest.skip("no reference mount")
    # data_util.py imports mod_crop + img2tensor/scandir from the basicsr
    # package; wire lightweight stand-ins to avoid its heavy __init__.
    import sys
    import types

    data_pkg = types.ModuleType("basicsr.data")
    data_pkg.transforms = ref_transforms
    sys.modules["basicsr.data"] = data_pkg
    sys.modules["basicsr.data.transforms"] = ref_transforms
    utils = sys.modules["basicsr.utils"]
    if not hasattr(utils, "img2tensor"):
        import torch

        utils.img2tensor = lambda imgs, **k: [
            torch.from_numpy(v.transpose(2, 0, 1)) for v in imgs]
        utils.scandir = lambda p, full_path=False: iter(sorted(
            __import__("os").listdir(p)))
    return import_reference_file(
        "TrainTestGSASR/basicsr/data/data_util.py", "ref_data_util")


# ------------------------------------------------------------- transforms


@pytest.mark.oracle
def test_mod_crop_parity(ref_transforms):
    for scale in (2, 3, 4):
        img = _img(1, (41, 37, 3))
        np.testing.assert_array_equal(T.mod_crop(img, scale),
                                      ref_transforms.mod_crop(img, scale))


@pytest.mark.oracle
def test_paired_random_crop_parity(ref_transforms):
    scale, gt_ps = 4, 24
    lq = _img(2, (20, 18, 3))
    gt = _img(3, (80, 72, 3))
    random.seed(77)
    rg, rl = ref_transforms.paired_random_crop(gt.copy(), lq.copy(),
                                               gt_ps, scale)
    og, ol = T.paired_random_crop(gt.copy(), lq.copy(), gt_ps, scale,
                                  rng=random.Random(77))
    np.testing.assert_array_equal(og, rg)
    np.testing.assert_array_equal(ol, rl)


def test_paired_random_crop_errors():
    with pytest.raises(ValueError):
        T.paired_random_crop(_img(0, (79, 72, 3)), _img(1, (20, 18, 3)),
                             24, 4)
    with pytest.raises(ValueError):
        T.paired_random_crop(_img(0, (16, 16, 3)), _img(1, (4, 4, 3)),
                             24, 4)


@pytest.mark.oracle
def test_augment_parity(ref_transforms):
    for seed in range(6):
        imgs = [_img(seed, (16, 12, 3)), _img(seed + 50, (16, 12, 3))]
        flow = _img(seed + 100, (16, 12, 2)).astype(np.float32)
        random.seed(seed)
        r_imgs, r_flow = ref_transforms.augment(
            [v.copy() for v in imgs], flows=flow.copy())
        o_imgs, o_flow = T.augment([v.copy() for v in imgs],
                                   flows=flow.copy(),
                                   rng=random.Random(seed))
        for a, b in zip(o_imgs, r_imgs):
            np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(o_flow, r_flow)


def test_augment_status():
    out, status = T.augment(_img(), return_status=True,
                            rng=random.Random(5))
    assert isinstance(status, tuple) and len(status) == 3
    assert isinstance(out, np.ndarray)


@pytest.mark.oracle
def test_img_rotate_parity(ref_transforms):
    img = _img(4, (30, 20, 3))
    np.testing.assert_array_equal(T.img_rotate(img, 33.0),
                                  ref_transforms.img_rotate(img, 33.0))


@pytest.mark.oracle
def test_my_augment_parity(ref_transforms):
    for seed in range(8):
        img = _img(seed, (24, 20, 3))
        random.seed(seed)
        ref = ref_transforms.my_augment([img.copy()])
        ours = T.my_augment([img.copy()], rng=random.Random(seed))
        # reference my_augment forgets its return for lists of length 1
        # (falls off the end, transforms.py:258-263) — compare via the
        # single-image path where it mutates in place... use our list
        # result vs re-running the reference pipeline manually:
        random.seed(seed)
        ref_single = ref_transforms.my_augment(img.copy())
        if ref_single is not None:
            np.testing.assert_allclose(ours[0], ref_single, atol=1e-6)


# -------------------------------------------------------------- data_util


@pytest.mark.oracle
def test_generate_frame_indices_parity(ref_data_util):
    for padding in ("replicate", "reflection", "reflection_circle",
                    "circle"):
        for crt in (0, 2, 9):
            assert DU.generate_frame_indices(crt, 10, 5, padding) == \
                ref_data_util.generate_frame_indices(crt, 10, 5, padding)


def test_paths_from_folder(tmp_path):
    for n in ("b.png", "a.png"):
        (tmp_path / n).write_bytes(b"x")
    paths = DU.paths_from_folder(str(tmp_path))
    assert len(paths) == 2
    assert all(p.endswith(n) for p, n in zip(paths, ("a.png", "b.png")))
    with pytest.raises(ValueError):
        DU.paths_from_lmdb(str(tmp_path))


def test_read_img_seq(tmp_path):
    import cv2

    for i in range(3):
        cv2.imwrite(str(tmp_path / f"f{i}.png"),
                    (np.random.default_rng(i).random((13, 11, 3)) * 255)
                    .astype(np.uint8))
    stack, names = DU.read_img_seq(str(tmp_path), require_mod_crop=True,
                                   scale=4, return_imgname=True)
    assert stack.shape == (3, 12, 8, 3) and stack.dtype == np.float32
    assert names == ["f0", "f1", "f2"]


@pytest.mark.oracle
def test_generate_gaussian_kernel_parity(ref_data_util):
    np.testing.assert_allclose(DU.generate_gaussian_kernel(13, 1.6),
                               ref_data_util.generate_gaussian_kernel(
                                   13, 1.6), atol=1e-12)


@pytest.mark.oracle
def test_duf_downsample_parity(ref_data_util):
    import torch

    x = _img(7, (2, 3, 25, 21))  # (t, c, h, w) torch layout
    ref = ref_data_util.duf_downsample(torch.from_numpy(x), 13, 4).numpy()
    # ours: NHWC
    ours = np.asarray(DU.duf_downsample(
        np.transpose(x, (0, 2, 3, 1)), 13, 4))
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref,
                               atol=2e-6)
    # batched (B, T, H, W, C) path
    xb = np.stack([np.transpose(x, (0, 2, 3, 1))] * 2)
    ob = np.asarray(DU.duf_downsample(xb, 13, 4))
    np.testing.assert_allclose(ob[0], ours, atol=1e-6)

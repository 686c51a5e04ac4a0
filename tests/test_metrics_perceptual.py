"""Tests for LPIPS / DISTS / FID implementations."""

import sys
import types

import numpy as np
import pytest

from tests.reference_oracle import REFERENCE, reference_available


def _torch_alexnet_features():
    """torchvision AlexNet.features replica (random init)."""
    import torch.nn as tnn
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(), tnn.MaxPool2d(3, 2),
    )


def test_alexnet_backbone_parity():
    """Our flax AlexNet taps == torch replica taps (shared random
    weights)."""
    import torch
    import jax.numpy as jnp
    from gsasr_tpu.metrics_perceptual import AlexNetFeatures

    torch.manual_seed(0)
    feats = _torch_alexnet_features()
    feats.eval()
    rng = np.random.default_rng(0)
    img = rng.random((1, 3, 64, 64), dtype=np.float32)

    taps_ref = []
    x = torch.from_numpy(img)
    with torch.no_grad():
        for i, layer in enumerate(feats):
            x = layer(x)
            if i in (1, 4, 7, 9, 11):
                taps_ref.append(x.numpy())

    params = {}
    sd = feats.state_dict()
    for key in sd:
        if key.endswith(".weight"):
            idx = int(key.split(".")[0])
            params[f"conv_{idx}"] = {
                "kernel": sd[key].numpy().transpose(2, 3, 1, 0),
                "bias": sd[key.replace(".weight", ".bias")].numpy(),
            }
    model = AlexNetFeatures()
    taps = model.apply({"params": params},
                       jnp.asarray(img.transpose(0, 2, 3, 1)))
    assert len(taps) == 5
    for t, tr in zip(taps, taps_ref):
        np.testing.assert_allclose(np.asarray(t).transpose(0, 3, 1, 2), tr,
                                   rtol=1e-4, atol=1e-4)


def test_lpips_zero_on_identical_and_converter():
    import jax
    import jax.numpy as jnp
    from gsasr_tpu.metrics_perceptual import (ALEX_CHNS, LPIPS,
                                              convert_lpips)

    # synthetic official-layout checkpoint
    rng = np.random.default_rng(1)
    sd = {}
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    tv_idx = [0, 3, 6, 8, 10]
    slice_of = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}
    for (o, i, k, _), idx in zip(shapes, tv_idx):
        sd[f"net.slice{slice_of[idx]}.{idx}.weight"] = \
            rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05
        sd[f"net.slice{slice_of[idx]}.{idx}.bias"] = \
            np.zeros(o, dtype=np.float32)
    for kk, ch in enumerate(ALEX_CHNS):
        sd[f"lins.{kk}.model.1.weight"] = np.abs(
            rng.standard_normal((1, ch, 1, 1)).astype(np.float32))
    params = convert_lpips(sd, net="alex")

    model = LPIPS(net="alex")
    img = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    img2 = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    d_same = model.apply({"params": params}, img, img)
    d_diff = model.apply({"params": params}, img, img2)
    assert abs(float(d_same[0])) < 1e-8
    assert float(d_diff[0]) > 0
    # jittable
    f = jax.jit(lambda a, b: model.apply({"params": params}, a, b))
    np.testing.assert_allclose(np.asarray(f(img, img2)),
                               np.asarray(d_diff), rtol=1e-5)


def test_l2_pool_matches_numpy():
    import jax.numpy as jnp
    from gsasr_tpu.metrics_perceptual import l2_pool

    rng = np.random.default_rng(2)
    x = rng.random((1, 8, 8, 2), dtype=np.float32)
    out = np.asarray(l2_pool(jnp.asarray(x), channels=2))
    # independent numpy computation
    a = np.hanning(5)[1:-1]
    g = np.outer(a, a)
    g = g / g.sum()
    xp = np.pad(x ** 2, ((0, 0), (1, 1), (1, 1), (0, 0)))
    expect = np.zeros_like(out)
    for oy in range(out.shape[1]):
        for ox in range(out.shape[2]):
            patch = xp[0, oy * 2:oy * 2 + 3, ox * 2:ox * 2 + 3, :]
            expect[0, oy, ox, :] = np.sqrt(
                (patch * g[..., None]).sum(axis=(0, 1)) + 1e-12)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_dists_zero_on_identical():
    import jax
    import jax.numpy as jnp
    from gsasr_tpu.metrics_perceptual import DISTS

    model = DISTS()
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    img2 = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), img, img)["params"]
    # make alpha/beta positive so the weighting is meaningful
    params = dict(params)
    params["alpha"] = jnp.abs(params["alpha"]) + 0.1
    params["beta"] = jnp.abs(params["beta"]) + 0.1
    d_same = model.apply({"params": params}, img, img)
    d_diff = model.apply({"params": params}, img, img2)
    assert abs(float(d_same[0])) < 1e-5
    assert float(d_diff[0]) > float(d_same[0])


@pytest.mark.skipif(not reference_available(), reason="no reference tree")
def test_fid_parity_vs_reference():
    import importlib.util

    # stub the inception arch import (needs pretrained download machinery)
    inc = types.ModuleType("basicsr.archs.inception")
    inc.InceptionV3 = object
    sys.modules["basicsr.archs.inception"] = inc
    tqdm_mod = types.ModuleType("tqdm")
    tqdm_mod.tqdm = lambda x, **k: x
    sys.modules.setdefault("tqdm", tqdm_mod)
    for name in ("basicsr", "basicsr.archs"):
        sys.modules.setdefault(name, types.ModuleType(name))
    spec = importlib.util.spec_from_file_location(
        "basicsr.metrics.fid",
        REFERENCE / "TrainTestGSASR/basicsr/metrics/fid.py")
    ref_fid = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_fid)

    from gsasr_tpu.metrics_perceptual import (calculate_fid,
                                              compute_feature_stats)

    rng = np.random.default_rng(4)
    f1 = rng.standard_normal((200, 16))
    f2 = rng.standard_normal((200, 16)) * 1.3 + 0.2
    mu1, s1 = compute_feature_stats(f1)
    mu2, s2 = compute_feature_stats(f2)
    ours = calculate_fid(mu1, s1, mu2, s2)
    theirs = ref_fid.calculate_fid(mu1, s1, mu2, s2)
    np.testing.assert_allclose(ours, theirs, rtol=1e-10)
    assert calculate_fid(mu1, s1, mu1, s1) < 1e-8


def test_vgg16_backbone_parity():
    """Our flax VGG16 LPIPS taps == torch replica taps."""
    import torch
    import torch.nn as tnn
    import jax.numpy as jnp
    from gsasr_tpu.metrics_perceptual import VGG16Features

    torch.manual_seed(1)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU())
            in_ch = v
    feats = tnn.Sequential(*layers)
    feats.eval()
    rng = np.random.default_rng(5)
    img = rng.random((1, 3, 32, 32), dtype=np.float32) * 0.1

    taps_ref = []
    x = torch.from_numpy(img)
    with torch.no_grad():
        for i, layer in enumerate(feats):
            x = layer(x)
            if i in (3, 8, 15, 22, 29):
                taps_ref.append(x.numpy())

    params = {}
    sd = feats.state_dict()
    for key in sd:
        if key.endswith(".weight"):
            idx = int(key.split(".")[0])
            params[f"conv_{idx}"] = {
                "kernel": sd[key].numpy().transpose(2, 3, 1, 0),
                "bias": sd[key.replace(".weight", ".bias")].numpy(),
            }
    model = VGG16Features()
    taps = model.apply({"params": params},
                       jnp.asarray(img.transpose(0, 2, 3, 1)))
    assert len(taps) == 5
    for t, tr in zip(taps, taps_ref):
        np.testing.assert_allclose(np.asarray(t).transpose(0, 3, 1, 2), tr,
                                   rtol=1e-4, atol=1e-5)

"""VGGFeatureExtractor + PerceptualLoss parity vs the reference
(`basicsr/archs/vgg_arch.py`, `basicsr/losses/basic_loss.py`), using a
randomly-initialized torchvision-layout VGG replica as shared weights
(pretrained weights are unavailable in this zero-egress image)."""

import sys
import types

import numpy as np
import pytest

from tests.reference_oracle import (REFERENCE, import_reference_file,
                                    reference_available)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not mounted")

VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def _torch_vgg19_features():
    """torchvision-layout vgg19 `features` Sequential (random init)."""
    import torch.nn as tnn
    layers, in_ch = [], 3
    for v in VGG19_CFG:
        if v == "M":
            layers.append(tnn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=True))
            in_ch = v
    return tnn.Sequential(*layers)


def _load_ref_vgg_arch():
    """Load reference vgg_arch with torchvision.models.vgg stubbed to
    return our random replica."""
    import torch
    torch.manual_seed(0)
    features = _torch_vgg19_features()

    class _FakeVGG:
        def __init__(self):
            self.features = features

    vgg_stub = types.ModuleType("torchvision.models.vgg")
    vgg_stub.vgg19 = lambda pretrained=True, **kw: _FakeVGG()
    models_stub = types.ModuleType("torchvision.models")
    models_stub.vgg = vgg_stub
    sys.modules["torchvision.models"] = models_stub
    sys.modules["torchvision.models.vgg"] = vgg_stub

    reg_mod = types.ModuleType("basicsr.utils.registry")

    class _Reg:
        def register(self, obj=None):
            return obj if obj is not None else (lambda o: o)

    reg_mod.ARCH_REGISTRY = _Reg()
    reg_mod.LOSS_REGISTRY = _Reg()
    sys.modules["basicsr.utils.registry"] = reg_mod
    for name in ("basicsr", "basicsr.utils", "basicsr.archs",
                 "basicsr.losses"):
        sys.modules.setdefault(name, types.ModuleType(name))

    import importlib.util

    def _load(relpath, modname):
        spec = importlib.util.spec_from_file_location(
            modname, REFERENCE / relpath)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[modname] = mod
        spec.loader.exec_module(mod)
        return mod

    vgg_arch = _load("TrainTestGSASR/basicsr/archs/vgg_arch.py",
                     "basicsr.archs.vgg_arch")
    return vgg_arch, features


def test_vgg_feature_extractor_parity():
    import torch
    import jax.numpy as jnp
    from gsasr_tpu.models.vgg import VGGFeatureExtractor, convert_vgg

    vgg_arch, features = _load_ref_vgg_arch()
    layer_list = ["relu1_1", "conv2_2", "relu3_4", "pool4"]
    ref = vgg_arch.VGGFeatureExtractor(layer_name_list=layer_list,
                                       vgg_type="vgg19")
    ref.eval()
    rng = np.random.default_rng(0)
    img = rng.random((2, 3, 16, 16), dtype=np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(img))

    params = convert_vgg(features.state_dict(), "vgg19")
    model = VGGFeatureExtractor(layer_name_list=tuple(layer_list))
    out = model.apply({"params": params},
                      jnp.asarray(img.transpose(0, 2, 3, 1)))
    assert set(out.keys()) == set(out_ref.keys())
    for k in layer_list:
        np.testing.assert_allclose(
            np.asarray(out[k]).transpose(0, 3, 1, 2),
            out_ref[k].numpy(), rtol=1e-4, atol=1e-4)


def test_perceptual_loss_parity():
    import torch
    import jax.numpy as jnp
    from gsasr_tpu.models.vgg import PerceptualLoss, convert_vgg

    vgg_arch, features = _load_ref_vgg_arch()
    # stub pytorch_msssim (absent) before loading basic_loss
    ms = types.ModuleType("pytorch_msssim")
    for n in ("ssim", "ms_ssim", "SSIM", "MS_SSIM"):
        setattr(ms, n, None)
    sys.modules.setdefault("pytorch_msssim", ms)

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "basicsr.losses.loss_util",
        REFERENCE / "TrainTestGSASR/basicsr/losses/loss_util.py")
    lu = importlib.util.module_from_spec(spec)
    sys.modules["basicsr.losses.loss_util"] = lu
    spec.loader.exec_module(lu)
    spec = importlib.util.spec_from_file_location(
        "basicsr.losses.basic_loss",
        REFERENCE / "TrainTestGSASR/basicsr/losses/basic_loss.py")
    bl = importlib.util.module_from_spec(spec)
    sys.modules["basicsr.losses.basic_loss"] = bl
    spec.loader.exec_module(bl)

    layer_weights = {"relu1_1": 0.5, "relu2_2": 1.5}
    ref_loss = bl.PerceptualLoss(layer_weights, vgg_type="vgg19",
                                 perceptual_weight=2.0, style_weight=3.0,
                                 criterion="l1")
    rng = np.random.default_rng(1)
    x = rng.random((2, 3, 16, 16), dtype=np.float32)
    gt = rng.random((2, 3, 16, 16), dtype=np.float32)
    with torch.no_grad():
        p_ref, s_ref = ref_loss(torch.from_numpy(x), torch.from_numpy(gt))

    ours = PerceptualLoss(layer_weights, perceptual_weight=2.0,
                          style_weight=3.0, criterion="l1")
    params = convert_vgg(features.state_dict(), "vgg19")
    p, s = ours(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                jnp.asarray(gt.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(float(p), float(p_ref), rtol=1e-4)
    np.testing.assert_allclose(float(s), float(s_ref), rtol=1e-3, atol=1e-8)

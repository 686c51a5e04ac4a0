"""Parity tests for the classic (non-NOUP) full SR networks vs the
reference registry archs (`TrainTestGSASR/basicsr/archs/*_arch.py`),
executed as CPU-torch oracles."""

import numpy as np
import pytest

from tests.reference_oracle import import_basicsr_arch, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not mounted")


def _run(model, params, x_torch):
    import jax.numpy as jnp
    y = model.apply({"params": params},
                    jnp.asarray(x_torch.numpy().transpose(0, 2, 3, 1)))
    return np.asarray(y).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("cls_name,upscale", [("EDSR", 4), ("EDSRx3", 3),
                                              ("EDSRx4", 4)])
def test_edsr_classic_parity(cls_name, upscale):
    import torch
    ref_mod = import_basicsr_arch("edsr_arch")
    from gsasr_tpu.models.classic import EDSR
    from gsasr_tpu.utils.torch_convert import convert_edsr_classic

    torch.manual_seed(0)
    net = getattr(ref_mod, cls_name)(num_in_ch=3, num_out_ch=3, num_feat=16,
                                     num_block=2, upscale=upscale)
    net.eval()
    x = torch.rand(1, 3, 8, 10)
    with torch.no_grad():
        y_ref = net(x).numpy()

    model = EDSR(num_feat=16, num_block=2, upscale=upscale)
    y = _run(model, convert_edsr_classic(net.state_dict()), x)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("upscale", [2, 4])
def test_rdn_classic_parity(upscale):
    import torch
    ref_mod = import_basicsr_arch("rdn_arch")
    from gsasr_tpu.models.classic import RDN
    from gsasr_tpu.utils.torch_convert import convert_rdn_classic

    torch.manual_seed(0)
    net = ref_mod.RDNNOUP(r=upscale, no_upsampling=False)
    net.eval()
    x = torch.rand(1, 3, 6, 8)
    with torch.no_grad():
        y_ref = net(x).numpy()

    model = RDN(upscale=upscale)
    y = _run(model, convert_rdn_classic(net.state_dict()), x)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("upsampler", ["pixelshuffle", "pixelshuffledirect",
                                       "nearest+conv", ""])
def test_swinir_classic_parity(upsampler):
    import torch
    ref_mod = import_basicsr_arch("swinir_arch")
    from gsasr_tpu.models.classic import SwinIR
    from gsasr_tpu.utils.torch_convert import convert_swinir_classic

    torch.manual_seed(0)
    upscale = 4 if upsampler == "nearest+conv" else 2
    cfg = dict(upscale=upscale, img_size=8, embed_dim=24, depths=(2, 2),
               num_heads=(6, 6), window_size=4, mlp_ratio=2,
               upsampler=upsampler)
    net = ref_mod.SwinIR(**cfg)
    net.eval()
    x = torch.rand(1, 3, 8, 12)
    with torch.no_grad():
        y_ref = net(x).numpy()

    model = SwinIR(upscale=upscale, embed_dim=24, depths=(2, 2),
                   num_heads=(6, 6), window_size=4, mlp_ratio=2,
                   upsampler=upsampler)
    y = _run(model, convert_swinir_classic(net.state_dict(), upsampler), x)
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=1e-4)


def test_hat_classic_parity():
    import torch
    from tests.reference_oracle import import_hat_paper_arch
    ref_mod = import_hat_paper_arch()
    from gsasr_tpu.models.classic import HAT
    from gsasr_tpu.utils.torch_convert import convert_hat_classic

    torch.manual_seed(0)
    cfg = dict(upscale=2, img_size=8, embed_dim=24, depths=(2,),
               num_heads=(6,), window_size=4, mlp_ratio=2,
               compress_ratio=3, squeeze_factor=6, conv_scale=0.01,
               overlap_ratio=0.5, upsampler="pixelshuffle")
    net = ref_mod.HAT(**cfg)
    net.eval()
    x = torch.rand(1, 3, 8, 12)
    with torch.no_grad():
        y_ref = net(x).numpy()

    model = HAT(upscale=2, embed_dim=24, depths=(2,), num_heads=(6,),
                window_size=4, mlp_ratio=2, squeeze_factor=6)
    y = _run(model, convert_hat_classic(net.state_dict()), x)
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=1e-4)

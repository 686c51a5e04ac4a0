"""Weight-conversion parity: random-init torch reference modules vs our flax
modules with converted weights. Catches layout bugs (e.g. the EDSRNOUP
`return res` quirk), attention math drift, and bias-table permutation issues.
"""

import numpy as np
import pytest

from tests.reference_oracle import import_reference_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted")


def test_edsr_parity():
    import torch
    ref_mod = import_reference_module("utils.edsrbaseline")
    import jax.numpy as jnp
    from gsasr_tpu.models import EDSRNOUP
    from gsasr_tpu.utils.torch_convert import convert_edsr

    torch.manual_seed(0)
    net = ref_mod.EDSRNOUP(num_in_ch=3, num_out_ch=3, num_feat=32, num_block=4)
    net.eval()
    x = torch.randn(2, 3, 16, 20)
    with torch.no_grad():
        y_ref = net(x).numpy()

    params = convert_edsr(net.state_dict())
    model = EDSRNOUP(num_feat=32, num_block=4)
    y = model.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    y = np.asarray(y).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_fea2gs_parity_small():
    import torch
    ref_mod = import_reference_module("utils.fea2gs")
    import jax.numpy as jnp
    from gsasr_tpu.models import Fea2GS
    from gsasr_tpu.utils.torch_convert import convert_fea2gs

    torch.manual_seed(0)
    cfg = dict(inchannel=8, channel=24, num_heads=6, num_crossattn_blocks=1,
               num_crossattn_layers=2, num_selfattn_blocks=1,
               num_selfattn_layers=2, num_gs_seed=16, gs_up_factor=1.0,
               window_size=4, shuffle_scale1=2, shuffle_scale2=2)
    net = ref_mod.Fea2GS(**{k: v for k, v in cfg.items()
                            if k != "shuffle_scale1" or True})
    net.eval()
    b, h, w = 2, 8, 12  # 2x3 windows
    x = torch.randn(b, cfg["inchannel"], h, w)
    scale = torch.tensor([2.0, 3.5])
    with torch.no_grad():
        y_ref = net(x, scale).numpy()

    params = convert_fea2gs(net.state_dict(),
                            num_gs_seed=cfg["num_gs_seed"],
                            window_size=cfg["window_size"],
                            num_heads=cfg["num_heads"])
    model = Fea2GS(inchannel=cfg["inchannel"], channel=cfg["channel"],
                   num_heads=cfg["num_heads"],
                   num_crossattn_blocks=cfg["num_crossattn_blocks"],
                   num_crossattn_layers=cfg["num_crossattn_layers"],
                   num_selfattn_blocks=cfg["num_selfattn_blocks"],
                   num_selfattn_layers=cfg["num_selfattn_layers"],
                   num_gs_seed=cfg["num_gs_seed"],
                   window_size=cfg["window_size"])
    y = model.apply({"params": params},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    jnp.asarray(scale.numpy()))
    y = np.asarray(y)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=1e-4)


def test_fea2gs_parity_default_single_window():
    """Default-size decoder (channel 180, 12x12 window) on one window."""
    import torch
    ref_mod = import_reference_module("utils.fea2gs")
    import jax.numpy as jnp
    from gsasr_tpu.models import Fea2GS
    from gsasr_tpu.utils.torch_convert import convert_fea2gs

    torch.manual_seed(1)
    net = ref_mod.Fea2GS(inchannel=64, channel=180, num_selfattn_blocks=2)
    net.eval()
    x = torch.randn(1, 64, 12, 12)
    scale = torch.tensor([4.0])
    with torch.no_grad():
        y_ref = net(x, scale).numpy()

    params = convert_fea2gs(net.state_dict())
    model = Fea2GS(num_selfattn_blocks=2)
    y = model.apply({"params": params},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    jnp.asarray(scale.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-3, atol=1e-4)


def test_rdn_parity():
    import torch
    ref_mod = import_reference_module("utils.rdn")
    import jax.numpy as jnp
    from gsasr_tpu.models import RDNNOUP
    from gsasr_tpu.utils.torch_convert import convert_rdn

    torch.manual_seed(0)
    net = ref_mod.RDNNOUP()
    net.eval()
    x = torch.randn(1, 3, 12, 14)
    with torch.no_grad():
        y_ref = net(x).numpy()

    params = convert_rdn(net.state_dict())
    model = RDNNOUP()
    y = model.apply({"params": params},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    y = np.asarray(y).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_swinir_parity_small():
    import torch
    ref_mod = import_reference_module("utils.swinir")
    import jax.numpy as jnp
    from gsasr_tpu.models import SwinIRNOUP
    from gsasr_tpu.utils.torch_convert import convert_swinir

    torch.manual_seed(0)
    # small config: 2 RSTBs x 2 blocks, embed 24, window 4 — exercises the
    # shifted-window mask path on a 8x12 input.
    net = ref_mod.SwinIRNOUP(img_size=8, embed_dim=24, depths=(2, 2),
                             num_heads=(6, 6), window_size=4, mlp_ratio=2,
                             upsampler="pixelshuffle")
    net.eval()
    x = torch.randn(2, 3, 8, 12)
    with torch.no_grad():
        y_ref = net(x).numpy()

    params = convert_swinir(net.state_dict())
    model = SwinIRNOUP(embed_dim=24, depths=(2, 2), num_heads=(6, 6),
                       window_size=4, mlp_ratio=2)
    y = model.apply({"params": params},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    y = np.asarray(y).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=1e-4)


def test_fea2gs_rope_parity_small():
    import torch
    ref_mod = import_reference_module("utils.fea2gsropeamp")
    import jax.numpy as jnp
    from gsasr_tpu.models import Fea2GSRopeAMP
    from gsasr_tpu.utils.torch_convert import convert_fea2gs_rope

    torch.manual_seed(0)
    cfg = dict(inchannel=8, channel=24, num_heads=6, num_crossattn_blocks=1,
               num_crossattn_layers=2, num_selfattn_blocks=1,
               num_selfattn_layers=2, num_gs_seed=16, gs_up_factor=1.0,
               window_size=4)
    net = ref_mod.Fea2GS_ROPE_AMP(**cfg)
    net.eval()
    b, h, w = 2, 8, 12
    x = torch.randn(b, cfg["inchannel"], h, w)
    scale = torch.tensor([2.0, 3.5])
    with torch.no_grad():
        y_ref = net(x, scale).numpy()

    params = convert_fea2gs_rope(net.state_dict())
    model = Fea2GSRopeAMP(inchannel=8, channel=24, num_heads=6,
                          num_crossattn_blocks=1, num_crossattn_layers=2,
                          num_selfattn_blocks=1, num_selfattn_layers=2,
                          num_gs_seed=16, window_size=4)
    y = model.apply({"params": params},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    jnp.asarray(scale.numpy()))
    y = np.asarray(y)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=1e-4)


def test_hat_parity_small():
    import torch
    ref_mod = import_reference_module("utils.hatropeamp")
    import jax.numpy as jnp
    from gsasr_tpu.models import HATNOUP
    from gsasr_tpu.utils.torch_convert import convert_hat

    torch.manual_seed(0)
    net = ref_mod.HATNOUP_ROPE_AMP(
        img_size=8, embed_dim=24, depths=(2, 2), num_heads=(6, 6),
        window_size=4, compress_ratio=3, squeeze_factor=4, conv_scale=0.01,
        overlap_ratio=0.5, mlp_ratio=2, upsampler="pixelshuffle",
        drop_path_rate=0.0)
    net.eval()
    x = torch.randn(1, 3, 8, 12)
    with torch.no_grad():
        y_ref = net(x).numpy()

    params = convert_hat(net.state_dict())
    model = HATNOUP(embed_dim=24, depths=(2, 2), num_heads=(6, 6),
                    window_size=4, squeeze_factor=4, mlp_ratio=2)
    y = model.apply({"params": params},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    y = np.asarray(y).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=1e-4)


def test_hat_paper_parity_small():
    import torch
    from tests.reference_oracle import import_hat_paper_arch
    ref_mod = import_hat_paper_arch()
    import jax.numpy as jnp
    from gsasr_tpu.models.hat_paper import HATNOUPPaper
    from gsasr_tpu.utils.torch_convert import convert_hat_paper

    torch.manual_seed(0)
    net = ref_mod.HATNOUP(
        img_size=8, embed_dim=24, depths=(2, 2), num_heads=(6, 6),
        window_size=4, compress_ratio=3, squeeze_factor=4, conv_scale=0.01,
        overlap_ratio=0.5, mlp_ratio=2, upsampler="pixelshuffle",
        drop_path_rate=0.0)
    net.eval()
    x = torch.randn(1, 3, 8, 12)
    with torch.no_grad():
        y_ref = net(x).numpy()

    params = convert_hat_paper(net.state_dict())
    model = HATNOUPPaper(embed_dim=24, depths=(2, 2), num_heads=(6, 6),
                         window_size=4, squeeze_factor=4, mlp_ratio=2)
    y = model.apply({"params": params},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    y = np.asarray(y).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=1e-4)

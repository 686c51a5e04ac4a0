"""Import helpers for using the reference PyTorch implementation (mounted
read-only at /root/reference) as a numerical oracle in tests.

We never copy reference code into this repo; we *execute* it (CPU torch) to
generate golden outputs for parity tests. torchvision is not installed in
this image, so it's stubbed before import (the reference only imports it for
save_image, unused in forward passes).
"""

import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")


def reference_available() -> bool:
    return REFERENCE.exists()


def _rgb_to_grayscale(img, num_output_channels=1):
    # BT.601 luma, the torchvision functional_tensor semantics
    # (used by the reference's degradations.py:8 for gray poisson noise).
    r, g, b = img.unbind(dim=-3)
    out = (0.299 * r + 0.587 * g + 0.114 * b).unsqueeze(dim=-3)
    if num_output_channels == 3:
        out = out.expand(img.shape)
    return out


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv_utils = types.ModuleType("torchvision.utils")
    tv_utils.save_image = lambda *a, **k: None
    tv_utils.make_grid = lambda *a, **k: None
    tv.utils = tv_utils
    tv_tr = types.ModuleType("torchvision.transforms")
    tv_ft = types.ModuleType("torchvision.transforms.functional_tensor")
    tv_ft.rgb_to_grayscale = _rgb_to_grayscale
    tv_tr.functional_tensor = tv_ft
    tv.transforms = tv_tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.utils"] = tv_utils
    sys.modules["torchvision.transforms"] = tv_tr
    sys.modules["torchvision.transforms.functional_tensor"] = tv_ft


def import_reference_module(name: str):
    """Import e.g. 'utils.fea2gs' from the reference tree.

    Names under 'TrainTestGSASR.' are loaded as standalone files (that tree
    has no top-level __init__.py and basicsr's package __init__ pulls heavy
    dependencies we don't need for oracles).
    """
    _stub_torchvision()
    if name.startswith("TrainTestGSASR."):
        rel = name.replace(".", "/") + ".py"
        return import_reference_file(rel, name.rsplit(".", 1)[-1])
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    import importlib
    return importlib.import_module(name)


def import_reference_file(relpath: str, name: str):
    """Load a single reference .py file without package machinery."""
    _stub_torchvision()
    import importlib.util
    path = REFERENCE / relpath
    spec = importlib.util.spec_from_file_location(f"refonly_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def import_hat_paper_arch():
    """Load `TrainTestGSASR/basicsr/archs/hat_arch.py` with minimal stubs
    for the basicsr package machinery (registry decorator, arch_util)."""
    _stub_torchvision()
    import types

    if "refonly_hat_arch" in sys.modules:
        return sys.modules["refonly_hat_arch"]

    # minimal registry + arch_util stubs
    reg_mod = types.ModuleType("basicsr.utils.registry")

    class _Reg:
        def register(self, obj=None):
            if obj is None:
                return lambda o: o
            return obj

    reg_mod.ARCH_REGISTRY = _Reg()

    util_mod = types.ModuleType("basicsr.archs.arch_util")
    import collections.abc
    from itertools import repeat

    def _to_2tuple(x):
        if isinstance(x, collections.abc.Iterable):
            return tuple(x)
        return tuple(repeat(x, 2))

    hat_rope = import_reference_module("utils.hatropeamp")
    util_mod.to_2tuple = _to_2tuple
    util_mod.trunc_normal_ = hat_rope.trunc_normal_

    pkg = types.ModuleType("basicsr")
    utils_pkg = types.ModuleType("basicsr.utils")
    archs_pkg = types.ModuleType("basicsr.archs")
    for name, mod in [("basicsr", pkg), ("basicsr.utils", utils_pkg),
                      ("basicsr.utils.registry", reg_mod),
                      ("basicsr.archs", archs_pkg),
                      ("basicsr.archs.arch_util", util_mod)]:
        sys.modules.setdefault(name, mod)

    return import_reference_file(
        "TrainTestGSASR/basicsr/archs/hat_arch.py", "hat_arch")


def import_basicsr_arch(modname: str):
    """Load `TrainTestGSASR/basicsr/archs/<modname>.py` with the REAL
    arch_util (EDSR/RDN/SwinIR classic archs need ResidualBlockNoBN /
    Upsample / make_layer), stubbing only the registry, logger and the
    CUDA-only dcn op package."""
    _stub_torchvision()
    import torch

    full = f"basicsr.archs.{modname}"
    if f"refarch_{modname}" in sys.modules:
        return sys.modules[f"refarch_{modname}"]

    reg_mod = types.ModuleType("basicsr.utils.registry")

    class _Reg:
        def register(self, obj=None):
            if obj is None:
                return lambda o: o
            return obj

    reg_mod.ARCH_REGISTRY = _Reg()

    import logging
    utils_pkg = sys.modules.get("basicsr.utils") or types.ModuleType(
        "basicsr.utils")
    utils_pkg.get_root_logger = lambda *a, **k: logging.getLogger("ref")

    dcn_mod = types.ModuleType("basicsr.ops.dcn")

    class _MDCPStub(torch.nn.Module):
        pass

    dcn_mod.ModulatedDeformConvPack = _MDCPStub
    dcn_mod.modulated_deform_conv = lambda *a, **k: None

    pkg = sys.modules.get("basicsr") or types.ModuleType("basicsr")
    archs_pkg = sys.modules.get("basicsr.archs") or types.ModuleType(
        "basicsr.archs")
    archs_pkg.__path__ = [str(
        REFERENCE / "TrainTestGSASR" / "basicsr" / "archs")]
    ops_pkg = types.ModuleType("basicsr.ops")
    for name, mod in [("basicsr", pkg), ("basicsr.utils", utils_pkg),
                      ("basicsr.utils.registry", reg_mod),
                      ("basicsr.archs", archs_pkg),
                      ("basicsr.ops", ops_pkg),
                      ("basicsr.ops.dcn", dcn_mod)]:
        sys.modules[name] = mod

    import importlib.util

    def _load(submod):
        path = (REFERENCE / "TrainTestGSASR" / "basicsr" / "archs"
                / f"{submod}.py")
        spec = importlib.util.spec_from_file_location(
            f"basicsr.archs.{submod}", path)
        m = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = m
        spec.loader.exec_module(m)
        return m

    # Real arch_util (replaces any minimal stub a prior oracle installed).
    _load("arch_util")
    mod = _load(modname)
    sys.modules[f"refarch_{modname}"] = mod
    return mod

"""YAML config system.

Parses the reference's BasicSR-style YAML options
(`TrainTestGSASR/basicsr/utils/options.py:99-202`) into plain dataclasses:
`scale`, datasets by phase, network_g / network_fea2gs kwargs, train block
(optimizers, scheduler, EMA), val/metrics block. Also supports
`--force_yml`-style dotted overrides (`options.py:134-145`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import yaml


def load_options(path) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def apply_overrides(opt: Dict[str, Any], overrides: List[str]):
    """`key:sub=value` dotted overrides (reference --force_yml)."""
    for item in overrides or []:
        keys, value = item.split("=", 1)
        value = yaml.safe_load(value)
        node = opt
        parts = keys.replace(":", ".").split(".")
        for k in parts[:-1]:
            node = node.setdefault(k, {})
        node[parts[-1]] = value
    return opt


def build_networks(opt: Dict[str, Any], dtype=None):
    """network_g / network_fea2gs blocks -> flax modules.

    Covers the reference's ARCH_REGISTRY surface for GSASR training
    (`basicsr/archs/*_arch.py` registrations): all four NOUP encoders and
    both decoder families, any extra yaml keys passed through as module
    kwargs. `model_dtype: bfloat16` at the top level selects the bf16
    (GSASRAMPModel-equivalent) family."""
    import jax.numpy as jnp

    from gsasr_tpu.models import (EDSRNOUP, Fea2GS, Fea2GSRopeAMP, HATNOUP,
                                  HATNOUPPaper, RDNNOUP, SwinIRNOUP)

    if dtype is None:
        # explicit model_dtype wins; otherwise the reference's
        # model_type: GSASRAMPModel selects the bf16 family
        default = ("bfloat16" if "AMP" in str(opt.get("model_type", ""))
                   else "float32")
        name = str(opt.get("model_dtype", default)).lower()
        dtypes = {"float32": jnp.float32, "fp32": jnp.float32,
                  "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}
        if name not in dtypes:
            raise NotImplementedError(
                f"model_dtype {name!r} (expected one of {sorted(dtypes)})")
        dtype = dtypes[name]

    encoders = {
        "EDSRNOUP": EDSRNOUP, "EDSR": EDSRNOUP,
        "RDNNOUP": RDNNOUP, "RDN": RDNNOUP,
        "SwinIRNOUP": SwinIRNOUP, "SWINNOUP": SwinIRNOUP,
        "HATNOUP_ROPE_AMP": HATNOUP,
        # the reference's paper-HAT registration (rel-pos bias + masked
        # shifts, hat_arch.py:987) — distinct from the RoPE/AMP variant
        "HATNOUP": HATNOUPPaper,
    }
    decoders = {"Fea2GS": Fea2GS, "Fea2GS_ROPE_AMP": Fea2GSRopeAMP,
                "Fea2GSRopeAMP": Fea2GSRopeAMP}

    # Reference-yaml keys our NOUP modules fix structurally (upsampler
    # removed, channel counts pinned by the GSASR configs) — silently
    # dropped. Anything else unknown raises, matching the reference's
    # TypeError on unexpected ctor kwargs.
    _STRUCTURAL = {"upscale", "upsampler", "img_size", "img_range",
                   "in_chans", "no_upsampling", "resi_connection",
                   "kSize", "r", "n_colors", "num_in_ch", "num_out_ch",
                   "scale", "patch_size", "ape", "patch_norm"}

    def adapt(kwargs, cls, rename):
        """Accept reference-yaml keys: rename known aliases, drop keys our
        NOUP modules fix structurally (see _STRUCTURAL), raise on anything
        else unknown so a misspelled hyperparameter can't silently train
        with the module default."""
        fields = {f.name for f in dataclasses.fields(cls)}
        out = {}
        for k, v in kwargs.items():
            k = rename.get(k, k)
            if k in fields:
                out[k] = tuple(v) if isinstance(v, list) else v
            elif k not in _STRUCTURAL:
                raise TypeError(
                    f"{cls.__name__}: unknown yaml key {k!r} "
                    f"(known: {sorted(fields)})")
        return out

    g = dict(opt["network_g"])
    gtype = g.pop("type")
    if gtype not in encoders:
        raise NotImplementedError(f"encoder type {gtype}")
    cls = encoders[gtype]
    enc = cls(dtype=dtype, **adapt(g, cls, {"G0": "g0",
                                            "RDNconfig": "config"}))

    d = dict(opt["network_fea2gs"])
    dt = d.pop("type")
    if dt not in decoders:
        raise NotImplementedError(f"decoder type {dt}")
    cls = decoders[dt]
    dec = cls(dtype=dtype, **adapt(d, cls, {}))
    return enc, dec


def build_train_config(opt: Dict[str, Any]):
    from gsasr_tpu.train import TrainConfig

    t = opt.get("train", {})
    sched = t.get("scheduler", {})
    optim = t.get("optim_g", {})
    ds = next((v for k, v in opt.get("datasets", {}).items()
               if k.startswith("train")), {})
    import math
    lr_size = ds.get("lr_size", 48)
    scale_list = ds.get("scale_list", [1, 4])
    gt_max = math.ceil(scale_list[-1] * lr_size)
    return TrainConfig(
        lr=float(optim.get("lr", 2e-4)),
        betas=tuple(optim.get("betas", (0.9, 0.99))),
        milestones=tuple(sched.get("milestones", (250000, 400000, 450000,
                                                  475000))),
        gamma=float(sched.get("gamma", 0.5)),
        total_iter=int(t.get("total_iter", 500000)),
        warmup_iter=int(t.get("warmup_iter", -1)),
        ema_decay=float(t.get("ema_decay", 0.999)),
        # reference key `clip_grad_norm` is a boolean gate: gsasr_model.py
        # always clips at the hardcoded norm 5 when truthy. Accept a
        # numeric value as a custom norm; map `True` to 5.0. Legacy
        # `use_grad_clip` bool kept for our earlier configs.
        clip_grad_norm=(
            ((5.0 if t["clip_grad_norm"] is True
              else float(t["clip_grad_norm"]))
             if t["clip_grad_norm"] else None)
            if "clip_grad_norm" in t
            else (5.0 if t.get("use_grad_clip", True) else None)),
        accumulation_steps=int(t.get("accumulation_steps", 1)),
        default_step_size=float(opt.get("default_step_size", 1.2)),
        dmax=float(opt.get("dmax", 0.5)),
        dmax_mode=opt.get("dmax_mode", "fix"),
        if_dmax=bool(opt.get("if_dmax", True)),
        canvas_hw=(gt_max, gt_max),
        # reference ssim_opt (`gsasr_model.py:130-143, 227-242`)
        ssim_weight=float(t.get("ssim_opt", {}).get("loss_weight", 0.0)
                          if isinstance(t.get("ssim_opt"), dict) else 0.0),
        seed=int(opt.get("manual_seed", 0)),
        fused_decoder=bool(t.get("fused_decoder", False)),
    )

"""Checkpoint save/load with the reference's dual-key semantics.

The reference saves each network as `{'params': sd, 'params_ema': sd}`
(`basicsr/models/base_model.py:208-253`), training state (optimizers +
iter) as a separate `.state` file (`:318-366`), resumes from `params` and
evaluates from `params_ema` (`gsasr_model.py:42-66`). We keep the same
structure in orbax:

  <dir>/<step>/
    net_g/{params, params_ema}
    net_fea2gs/{params, params_ema}
    train_state/{opt_state, step}

`load_torch_checkpoint` ingests reference .pth files (torch CPU unpickle +
gsasr_tpu.utils.torch_convert mapping) for parity evaluation.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


def save_checkpoint(directory, step: int, state, *, keep: int = 5,
                    retries: int = 3):
    """Save TrainState (gsasr_tpu.train.trainer.TrainState) via orbax.

    Retries transient IO failures like the reference's save loop
    (`basicsr/models/base_model.py:238-253`)."""
    import time

    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    directory.mkdir(parents=True, exist_ok=True)
    payload = {
        "net_g": {"params": state.params_g, "params_ema": state.ema_g},
        "net_fea2gs": {"params": state.params_d, "params_ema": state.ema_d},
        "train_state": {"opt_state": state.opt_state,
                        "step": state.step},
    }
    ckptr = ocp.StandardCheckpointer()
    for attempt in range(retries):
        try:
            ckptr.save(directory / str(step), payload, force=True)
            ckptr.wait_until_finished()
            break
        except Exception:
            if attempt == retries - 1:
                raise
            time.sleep(1.0)
    _prune(directory, keep)


def _prune(directory: Path, keep: int):
    # Never prune the step the `best` symlink points at (best-metric
    # checkpoint tracking, reference `base_model.py:50-73`).
    best = None
    link = directory / "best"
    if link.is_symlink():
        tgt = os.readlink(link)
        if os.path.basename(tgt).isdigit():
            best = int(os.path.basename(tgt))
    steps = sorted(
        (int(p.name) for p in directory.iterdir()
         if p.is_dir() and p.name.isdigit()))
    for s in steps[:-keep]:
        if s == best:
            continue
        import shutil
        shutil.rmtree(directory / str(s), ignore_errors=True)


def mark_best(directory, step: int):
    """Point `<directory>/best` at the given saved step (atomic refresh)."""
    directory = Path(directory).absolute()
    link = directory / "best"
    tmp = directory / ".best.tmp"
    if tmp.is_symlink() or tmp.exists():
        tmp.unlink()
    os.symlink(str(step), tmp)
    os.replace(tmp, link)


def latest_step(directory) -> Optional[int]:
    """`--auto_resume` support (`train.py:68-95`): newest saved step."""
    directory = Path(directory)
    if not directory.exists():
        return None
    steps = [int(p.name) for p in directory.iterdir()
             if p.is_dir() and p.name.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(directory, step: int, state_template):
    """Restore into the structure of `state_template` (a TrainState)."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    template = {
        "net_g": {"params": state_template.params_g,
                  "params_ema": state_template.ema_g},
        "net_fea2gs": {"params": state_template.params_d,
                       "params_ema": state_template.ema_d},
        "train_state": {"opt_state": state_template.opt_state,
                        "step": state_template.step},
    }
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(directory / str(step), template)
    return state_template.replace(
        step=payload["train_state"]["step"],
        params_g=payload["net_g"]["params"],
        ema_g=payload["net_g"]["params_ema"],
        params_d=payload["net_fea2gs"]["params"],
        ema_d=payload["net_fea2gs"]["params_ema"],
        opt_state=payload["train_state"]["opt_state"])


def load_torch_checkpoint(path, kind: str, param_key: str = "params_ema",
                          **convert_kwargs) -> Dict[str, Any]:
    """Load a reference .pth network file -> flax params.

    kind: 'edsr' | 'fea2gs'. param_key follows the reference's test configs
    (`param_key_g: params_ema`, e.g. options/test/paper/
    test_GSASR_EDSR-Baseline_paper_bicubic_x1_4_x4.yml:111).
    """
    import torch

    from gsasr_tpu.utils import torch_convert

    blob = torch.load(path, map_location="cpu", weights_only=True)
    sd = blob.get(param_key, blob) if isinstance(blob, dict) else blob
    if kind == "edsr":
        return torch_convert.convert_edsr(sd)
    if kind == "rdn":
        return torch_convert.convert_rdn(sd)
    if kind == "swinir":
        return torch_convert.convert_swinir(sd)
    if kind == "fea2gs":
        return torch_convert.convert_fea2gs(sd, **convert_kwargs)
    if kind == "fea2gs_rope":
        return torch_convert.convert_fea2gs_rope(sd)
    if kind == "hat":
        return torch_convert.convert_hat(sd)
    if kind == "hat_paper":
        return torch_convert.convert_hat_paper(sd)
    raise ValueError(f"unknown checkpoint kind {kind!r}")


def load_pretrained_params(spec, kind: str, key: str = "params", *,
                           net: Optional[str] = None):
    """Load one network's params for `pretrain_network_*` initialization
    (reference `train.py:132-142` semantics).

    spec: a reference .pth file OR an orbax step dir written by
    save_checkpoint; kind: the .pth converter kind ('edsr', 'rdn',
    'swinir', 'hat', 'fea2gs', 'fea2gs_rope'); key: 'params' or
    'params_ema'; net: which orbax subtree ('g' or 'fea2gs') — defaults
    from kind (decoder kinds start with 'fea2gs').
    """
    if not spec:
        return None
    import os.path as osp
    if net is None:
        net = "fea2gs" if kind.startswith("fea2gs") else "g"
    if osp.isdir(spec):
        enc_p, dec_p = load_eval_params(spec, key)
        return dec_p if net == "fea2gs" else enc_p
    return load_torch_checkpoint(spec, kind, param_key=key)


# yaml network type -> .pth converter kind (see load_torch_checkpoint)
CONVERTER_KINDS = {
    "EDSRNOUP": "edsr", "EDSR": "edsr",
    "RDNNOUP": "rdn", "RDN": "rdn",
    "SwinIRNOUP": "swinir", "SWINNOUP": "swinir",
    "HATNOUP_ROPE_AMP": "hat", "HATNOUP": "hat_paper",
    "Fea2GS": "fea2gs",
    "Fea2GS_ROPE_AMP": "fea2gs_rope", "Fea2GSRopeAMP": "fea2gs_rope",
}


def load_eval_params(spec, key: str = "params_ema"):
    """Restore ONLY net_g/net_fea2gs[key] from an orbax step dir.

    A full StandardCheckpointer restore also materializes the optimizer
    state (Adam mu+nu = 2x the params of both networks) just to discard
    it; this reads the tree metadata and partial-restores the two network
    subtrees. Returns (enc_params, dec_params).
    """
    import os.path as osp

    import jax
    import orbax.checkpoint as ocp

    path = osp.abspath(spec)
    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    meta = ckptr.metadata(path).item_metadata
    tree = meta.tree if hasattr(meta, "tree") else meta
    item = {"net_g": {key: jax.tree_util.tree_map(lambda m: 0.,
                                                  tree["net_g"][key])},
            "net_fea2gs": {key: jax.tree_util.tree_map(
                lambda m: 0., tree["net_fea2gs"][key])}}
    ra = jax.tree_util.tree_map(lambda _: ocp.RestoreArgs(), item)
    out = ckptr.restore(path, args=ocp.args.PyTreeRestore(
        item=item, restore_args=ra, transforms={}))
    return out["net_g"][key], out["net_fea2gs"][key]

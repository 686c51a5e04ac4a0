"""Weight conversion CLI: reference .pth checkpoints -> orbax.

One command turns a published GSASR checkpoint pair (net_g + net_fea2gs,
saved as `{'params': sd, 'params_ema': sd}` per
`/root/reference/TrainTestGSASR/basicsr/models/base_model.py:208-253`) into
an orbax step dir with this repo's layout
(`gsasr_tpu/utils/checkpoint.py`):

    <out>/<step>/net_g/{params, params_ema}
                 net_fea2gs/{params, params_ema}

which `cli/infer.py --orbax_ckpt`, `cli/test.py --orbax_ckpt` and
`path.pretrain_network_*` in train configs all consume directly.

Usage:
  python -m gsasr_tpu.cli.convert \
      --enc_ckpt net_g_latest.pth --dec_ckpt net_fea2gs_latest.pth \
      --model EDSR --version paper --out converted/edsr_paper [--step 0]
"""

from __future__ import annotations

import argparse


# CLI model name -> encoder converter kind (utils/checkpoint.CONVERTER_KINDS)
ENCODER_KINDS = {"EDSR": "edsr", "RDN": "rdn", "SWIN": "swinir",
                 "HATL": "hat"}


def convert_pair(enc_ckpt: str, dec_ckpt: str, model: str, version: str,
                 out: str, step: int = 0) -> str:
    """Convert both networks (params + params_ema when present) and save
    one orbax step dir. Returns the step-dir path."""
    from pathlib import Path

    import orbax.checkpoint as ocp
    import torch

    from gsasr_tpu.utils.checkpoint import load_torch_checkpoint

    enc_kind = ENCODER_KINDS[model]
    dec_kind = "fea2gs" if version == "paper" else "fea2gs_rope"

    payload = {"net_g": {}, "net_fea2gs": {}}
    for net, path, kind in (("net_g", enc_ckpt, enc_kind),
                            ("net_fea2gs", dec_ckpt, dec_kind)):
        blob = torch.load(path, map_location="cpu", weights_only=True)
        keys = [k for k in ("params", "params_ema")
                if isinstance(blob, dict) and k in blob] or ["params"]
        for key in keys:
            payload[net][key] = load_torch_checkpoint(path, kind,
                                                      param_key=key)
        if "params_ema" not in payload[net]:
            payload[net]["params_ema"] = payload[net]["params"]

    out_dir = Path(out).absolute()
    out_dir.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out_dir / str(step), payload, force=True)
    ckptr.wait_until_finished()
    return str(out_dir / str(step))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--enc_ckpt", required=True,
                   help="reference net_g .pth")
    p.add_argument("--dec_ckpt", required=True,
                   help="reference net_fea2gs .pth")
    p.add_argument("--model", default="EDSR", choices=sorted(ENCODER_KINDS))
    p.add_argument("--version", default="paper",
                   choices=["paper", "enhanced", "ultra"])
    p.add_argument("--out", required=True, help="orbax output dir")
    p.add_argument("--step", type=int, default=0)
    args = p.parse_args()

    path = convert_pair(args.enc_ckpt, args.dec_ckpt, args.model,
                        args.version, args.out, args.step)
    print(f"Converted -> {path}")
    print(f"Use with: python -m gsasr_tpu.cli.infer --orbax_ckpt {path} ...")


if __name__ == "__main__":
    main()

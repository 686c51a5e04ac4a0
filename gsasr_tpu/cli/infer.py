"""Single-image inference CLI — equivalent of
`/root/reference/inference_paper.py` and
`/root/reference/inference_enhenced.py` (selected via --version).

Usage:
  python -m gsasr_tpu.cli.infer --input_img_path in.png --scale 4 \
      --save_sr_path out/ [--model EDSR|RDN|SWIN|HATL] \
      [--version paper|enhanced|ultra] [--bf16] \
      [--enc_ckpt net_g.pth --dec_ckpt net_fea2gs.pth] \
      [--tile_process --tile_size 480 --tile_overlap 8 --crop_size 4]

Loads reference-format .pth checkpoints (params_ema) when given; otherwise
runs with random init (smoke mode).
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np

# CLI model name -> (encoder key, checkpoint converter kind)
MODEL_ENCODERS = {"EDSR": "edsr", "RDN": "rdn", "SWIN": "swinir",
                  "HATL": "hat"}


def build_models(model: str, version: str, bf16: bool = False):
    """(enc, dec, enc_params_kind, dec_params_kind, denominator)."""
    from gsasr_tpu.model import DENOMINATORS, make_models
    import jax.numpy as jnp

    encoder = MODEL_ENCODERS[model]
    if model == "HATL" and version == "paper":
        raise SystemExit("HATL ships only as Enhanced/Ultra "
                         "(README.md:206-209)")
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    enc, dec = make_models(encoder, version, dtype=dtype)
    dec_kind = "fea2gs" if version == "paper" else "fea2gs_rope"
    # Enhanced family denominators: 12 EDSR/RDN, 16 SWIN/HATL
    # (`inference_enhenced.py:219-222`); paper: 12/24
    # (`inference_paper.py:170`).
    if version == "paper":
        denom = DENOMINATORS[encoder]
    else:
        denom = 12 if model in ("EDSR", "RDN") else 16
    return enc, dec, encoder, dec_kind, denom


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_img_path", required=True)
    p.add_argument("--save_sr_path", default="./output")
    p.add_argument("--scale", type=float, default=4.0)
    p.add_argument("--model", default="EDSR",
                   choices=sorted(MODEL_ENCODERS))
    p.add_argument("--version", default="paper",
                   choices=["paper", "enhanced", "ultra"])
    p.add_argument("--AMP_test", "--bf16", dest="bf16",
                   action="store_true",
                   help="bf16 inference (`inference_enhenced.py:212`)")
    p.add_argument("--enc_ckpt", default=None)
    p.add_argument("--dec_ckpt", default=None)
    p.add_argument("--orbax_ckpt", default=None,
                   help="orbax checkpoint step dir (<exp>/checkpoints/"
                        "<step>) holding net_g + net_fea2gs")
    p.add_argument("--param_key", default="params_ema",
                   choices=["params", "params_ema"])
    p.add_argument("--denominator", type=int, default=None)
    p.add_argument("--suffix", default="GSASR_tpu")
    p.add_argument("--tile_process", action="store_true")
    p.add_argument("--tile_size", type=int, default=480)
    p.add_argument("--tile_overlap", type=int, default=8)
    p.add_argument("--crop_size", type=int, default=4)
    p.add_argument("--dmax", type=float, default=0.1)
    args = p.parse_args()

    import cv2
    from gsasr_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from gsasr_tpu.model import sr_forward
    from gsasr_tpu.tiling import split_and_joint_image
    from gsasr_tpu.utils.checkpoint import load_torch_checkpoint

    enc, dec, enc_kind, dec_kind, denom = build_models(
        args.model, args.version, args.bf16)
    denom = args.denominator or denom

    rng = jax.random.PRNGKey(0)
    if args.orbax_ckpt:
        from gsasr_tpu.utils.checkpoint import load_eval_params
        enc_params, dec_params = load_eval_params(args.orbax_ckpt,
                                                  args.param_key)
    elif args.enc_ckpt:
        enc_params = load_torch_checkpoint(args.enc_ckpt, enc_kind)
        dec_params = load_torch_checkpoint(args.dec_ckpt, dec_kind)
    else:
        print("WARNING: no checkpoint given; random init (smoke mode)")
        enc_params = enc.init(rng, jnp.zeros((1, 12, 12, 3)))["params"]
        dec_params = dec.init(rng, jnp.zeros((1, 12, 12, 64)),
                              jnp.ones((1,)))["params"]

    img = cv2.imread(args.input_img_path, cv2.IMREAD_COLOR)
    lq = jnp.asarray(img[:, :, ::-1].astype(np.float32) / 255.0)[None]
    h, w = lq.shape[1:3]
    gt_size = (math.floor(args.scale * h), math.floor(args.scale * w))

    if args.tile_process:
        assert args.tile_size % denom == 0
        canvas = split_and_joint_image(
            lq, args.scale, args.tile_size, args.tile_overlap, enc, dec,
            enc_params, dec_params, crop_size=args.crop_size,
            if_dmax=True, dmax=args.dmax)
        out = canvas[:, :gt_size[0], :gt_size[1]]
    else:
        out = np.asarray(sr_forward(enc, dec, enc_params, dec_params, lq,
                                    args.scale, denominator=denom,
                                    dmax=args.dmax))

    sr = np.clip(out[0], 0, 1)
    os.makedirs(args.save_sr_path, exist_ok=True)
    name, ext = os.path.splitext(os.path.basename(args.input_img_path))
    out_path = os.path.join(
        args.save_sr_path,
        f"{name}_{args.suffix}_{args.model}_{args.scale}{ext}")
    cv2.imwrite(out_path, (sr[:, :, ::-1] * 255).round().astype(np.uint8))
    print(f"Saved SR image to {out_path}")


if __name__ == "__main__":
    main()

"""Interactive SR demo — equivalent of `/root/reference/demo_gr.py` (Gradio
UI; gradio is not available in this image, so this serves a minimal local
HTML form + POST endpoint with the same behavior: upload an image, pick a
scale, get the SR result; inputs larger than `tile_threshold` are tiled
like the reference's auto-tiling >1024px, `demo_gr.py:117-339`).

Usage:
  python -m gsasr_tpu.cli.demo --port 7860 \
      [--enc_ckpt encoder.pth --dec_ckpt decoder.pth --model EDSR]
"""

from __future__ import annotations

import argparse
from http.server import BaseHTTPRequestHandler, HTTPServer

def parse_multipart(content_type: str, body: bytes) -> dict:
    """Minimal multipart/form-data parser (the stdlib `cgi` module is
    deprecated/removed in new Pythons). Returns {field_name: bytes}."""
    fields = {}
    if "boundary=" not in content_type:
        return fields
    boundary = content_type.split("boundary=")[1].split(";")[0].strip()
    # RFC 2046 allows (and sometimes requires) a quoted boundary parameter
    boundary = boundary.strip('"')
    sep = ("--" + boundary).encode()
    for part in body.split(sep):
        if b"\r\n\r\n" not in part:
            continue
        head, _, payload = part.partition(b"\r\n\r\n")
        # the payload is terminated by exactly one CRLF before the next
        # boundary marker; rstrip would eat legitimate trailing image bytes
        if payload.endswith(b"\r\n"):
            payload = payload[:-2]
        name = None
        for line in head.split(b"\r\n"):
            if not line.lower().startswith(b"content-disposition"):
                continue
            for param in line.split(b";"):
                key, _, val = param.strip().partition(b"=")
                # exact parameter match: 'filename=' also contains 'name='
                if key.strip().lower() == b"name":
                    name = val.strip().strip(b'"')
        if name:
            fields[name.decode()] = payload
    return fields


_FORM = b"""<!doctype html><title>GSASR-TPU demo</title>
<h2>GSASR-TPU: arbitrary-scale super-resolution</h2>
<form method=post enctype=multipart/form-data action=/sr>
  <p>Image: <input type=file name=image></p>
  <p>Scale: <input type=number step=0.1 min=1 max=16 value=4 name=scale></p>
  <p><input type=submit value=Upscale></p>
</form>"""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--model", default="EDSR", choices=["EDSR"])
    p.add_argument("--enc_ckpt", default=None)
    p.add_argument("--dec_ckpt", default=None)
    p.add_argument("--dmax", type=float, default=0.1)
    p.add_argument("--tile_threshold", type=int, default=1024)
    p.add_argument("--tile_size", type=int, default=480)
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsasr_tpu.model import DENOMINATORS, make_models, sr_forward
    from gsasr_tpu.tiling import split_and_joint_image
    from gsasr_tpu.utils.checkpoint import load_torch_checkpoint
    from gsasr_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()
    enc, dec = make_models(args.model.lower())
    denom = DENOMINATORS[args.model.lower()]
    rng = jax.random.PRNGKey(0)
    if args.enc_ckpt:
        enc_params = load_torch_checkpoint(args.enc_ckpt, "edsr")
        dec_params = load_torch_checkpoint(args.dec_ckpt, "fea2gs")
    else:
        print("WARNING: random init (smoke mode)")
        enc_params = enc.init(rng, jnp.zeros((1, 12, 12, 3)))["params"]
        dec_params = dec.init(rng, jnp.zeros((1, 12, 12, 64)),
                              jnp.ones((1,)))["params"]

    def run_sr(img_bgr, scale):
        import math
        lq = jnp.asarray(img_bgr[:, :, ::-1].astype(np.float32) / 255.0)[None]
        h, w = lq.shape[1:3]
        want = (math.floor(h * scale), math.floor(w * scale))
        if max(h, w) > args.tile_threshold:
            canvas = split_and_joint_image(
                lq, scale, args.tile_size, 8, enc, dec, enc_params,
                dec_params, crop_size=4, if_dmax=True, dmax=args.dmax)
            sr = canvas[0, :want[0], :want[1]]
        else:
            sr = np.asarray(sr_forward(enc, dec, enc_params, dec_params, lq,
                                       scale, denominator=denom,
                                       dmax=args.dmax))[0]
        return (np.clip(sr, 0, 1)[:, :, ::-1] * 255).round().astype(np.uint8)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(_FORM)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            fields = parse_multipart(self.headers.get("Content-Type", ""),
                                     body)
            data = fields.get("image", b"")
            scale = float(fields.get("scale", b"4").decode() or "4")
            img = cv2.imdecode(np.frombuffer(data, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                self.send_error(400, "could not decode image")
                return
            sr = run_sr(img, scale)
            ok, png = cv2.imencode(".png", sr)
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.end_headers()
            self.wfile.write(png.tobytes())

        def log_message(self, *a):
            pass

    print(f"demo listening on http://127.0.0.1:{args.port}")
    HTTPServer(("127.0.0.1", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()

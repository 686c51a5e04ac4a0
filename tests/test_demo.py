"""Demo server smoke test — the dependency-free equivalent of the
reference's Gradio demo (`/root/reference/demo_gr.py`): serve the form,
accept a multipart POST, return the SR PNG."""

import os
import socket
import subprocess
import sys
import time
import urllib.request

import cv2
import numpy as np

from gsasr_tpu.cli.demo import parse_multipart


def test_parse_multipart_binary_safety():
    # payload ending in CRLF-ish bytes must survive exactly
    payload = b"\x89PNG\r\n\x1a\n-data-\r\n-"
    boundary = "XBOUND"
    body = (b"--XBOUND\r\n"
            b'Content-Disposition: form-data; name="image"; '
            b'filename="a.png"\r\n'
            b"Content-Type: image/png\r\n\r\n" + payload + b"\r\n"
            b"--XBOUND\r\n"
            b'Content-Disposition: form-data; name="scale"\r\n\r\n'
            b"3.5\r\n"
            b"--XBOUND--\r\n")
    fields = parse_multipart(f"multipart/form-data; boundary={boundary}",
                             body)
    assert fields["image"] == payload
    assert fields["scale"] == b"3.5"

    # RFC 2046 quoted boundary parameter must parse identically
    fields_q = parse_multipart(
        f'multipart/form-data; boundary="{boundary}"', body)
    assert fields_q == fields

    # RFC 7578 does not constrain parameter order: filename before name
    body2 = (b"--XBOUND\r\n"
             b'Content-Disposition: form-data; filename="a.png"; '
             b'name="image"\r\n'
             b"Content-Type: image/png\r\n\r\n" + payload + b"\r\n"
             b"--XBOUND--\r\n")
    fields2 = parse_multipart("multipart/form-data; boundary=XBOUND", body2)
    assert fields2["image"] == payload


def test_demo_server_end_to_end(tmp_path):
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    # child output goes to a file, NOT a pipe: XLA can emit tens of KB of
    # warnings (e.g. compile-cache AOT host-feature mismatches) and an
    # undrained pipe blocks the server mid-startup.
    log = open(tmp_path / "demo.log", "wb+")
    proc = subprocess.Popen(
        [sys.executable, "-m", "gsasr_tpu.cli.demo", "--port", str(port)],
        env=env, stdout=log, stderr=subprocess.STDOUT)
    try:
        _wait_ready(port, proc, timeout=180, log_path=tmp_path / "demo.log")
        # GET serves the form
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=30) as r:
            assert b"GSASR-TPU" in r.read()

        # POST a tiny image at x2
        img = (np.random.default_rng(0).random((12, 12, 3)) * 255
               ).astype(np.uint8)
        ok, png = cv2.imencode(".png", img)
        assert ok
        boundary = "XTESTBOUND"
        body = (f"--{boundary}\r\n"
                f'Content-Disposition: form-data; name="image"; '
                f'filename="in.png"\r\n'
                f"Content-Type: image/png\r\n\r\n").encode() + \
            png.tobytes() + \
            (f"\r\n--{boundary}\r\n"
             f'Content-Disposition: form-data; name="scale"\r\n\r\n'
             f"2\r\n--{boundary}--\r\n").encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/sr", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        with urllib.request.urlopen(req, timeout=600) as r:
            out = np.frombuffer(r.read(), np.uint8)
        sr = cv2.imdecode(out, cv2.IMREAD_COLOR)
        assert sr is not None and sr.shape == (24, 24, 3)
    finally:
        proc.terminate()
        proc.wait(timeout=30)
        log.close()


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _wait_ready(port, proc, timeout, log_path=None):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if proc.poll() is not None:
            out = b""
            if log_path is not None:
                out = open(log_path, "rb").read()
            elif proc.stdout is not None:
                out = proc.stdout.read()
            raise AssertionError("demo exited early:\n"
                                 + out.decode(errors="replace")[-2000:])
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/", timeout=5):
                return
        except Exception:
            time.sleep(2)
    raise AssertionError("demo server did not become ready")

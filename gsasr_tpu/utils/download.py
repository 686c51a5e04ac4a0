"""Remote-file helpers — equivalent of
`TrainTestGSASR/basicsr/utils/download_util.py` and
`TrainTestGSASR/scripts/download_pretrained_models.py`.

The reference downloads pretrained checkpoints from a URL or Google Drive
(`download_util.py:11-38, 82-108`). This environment has no egress, so these
helpers are exercised by unit tests via ``file://`` URLs and raise a clear
error when the network is unreachable.
"""

from __future__ import annotations

import math
import os
import re
import urllib.error
import urllib.parse
import urllib.request
from pathlib import Path

_CHUNK = 32768


def sizeof_fmt(size, suffix: str = "B") -> str:
    """Human-readable file size (`basicsr/utils/misc.py:127-142`)."""
    for unit in ["", "K", "M", "G", "T", "P", "E", "Z"]:
        if abs(size) < 1024.0:
            return f"{size:3.1f} {unit}{suffix}"
        size /= 1024.0
    return f"{size:3.1f} Y{suffix}"


def _save_response(resp, destination, file_size=None, progress=print):
    total_chunks = (math.ceil(file_size / _CHUNK) if file_size else None)
    os.makedirs(os.path.dirname(os.path.abspath(destination)), exist_ok=True)
    done = 0
    with open(destination, "wb") as f:
        while True:
            chunk = resp.read(_CHUNK)
            if not chunk:
                break
            f.write(chunk)
            done += 1
            if total_chunks and progress and done % 64 == 0:
                progress(f"  {done}/{total_chunks} chunks "
                         f"({sizeof_fmt(done * _CHUNK)})")


def load_file_from_url(url: str, model_dir: str, *, file_name: str = None,
                       progress=print) -> str:
    """Download ``url`` into ``model_dir`` unless already present.

    Mirrors `download_util.py:82-108` (which defers to torch.hub) without a
    torch dependency. Returns the local path.
    """
    file_name = file_name or os.path.basename(
        urllib.parse.urlparse(url).path)
    cached = Path(model_dir) / file_name
    if cached.exists():
        return str(cached)
    try:
        with urllib.request.urlopen(url) as resp:
            size = resp.headers.get("Content-Length")
            _save_response(resp, cached, int(size) if size else None,
                           progress)
    except urllib.error.URLError as e:
        raise ConnectionError(
            f"cannot download {url}: {e}. This environment may have no "
            "network egress — place the file at "
            f"{cached} manually.") from e
    return str(cached)


def download_file_from_google_drive(file_id: str, save_path: str,
                                    progress=print) -> None:
    """Google Drive download with the confirm-token dance
    (`download_util.py:11-38`)."""
    url = ("https://docs.google.com/uc?export=download&id="
           + urllib.parse.quote(file_id))
    try:
        req = urllib.request.Request(url)
        with urllib.request.urlopen(req) as resp:
            body = resp.read()
            cookies = resp.headers.get_all("Set-Cookie") or []
        token = None
        for c in cookies:
            m = re.search(r"download_warning[^=]*=([^;]+)", c)
            if m:
                token = m.group(1)
        if token is None:
            m = re.search(rb"confirm=([0-9A-Za-z_-]+)", body)
            token = m.group(1).decode() if m else None
        if token:
            url = url + "&confirm=" + token
        with urllib.request.urlopen(url) as resp:
            size = resp.headers.get("Content-Length")
            _save_response(resp, save_path, int(size) if size else None,
                           progress)
    except urllib.error.URLError as e:
        raise ConnectionError(
            f"cannot reach Google Drive for id {file_id}: {e}") from e


# Pretrained-model catalog CLI (`scripts/download_pretrained_models.py`):
# the reference maps method names -> google-drive folder ids. Ours maps
# model names -> HuggingFace URLs published in the reference README
# (`/root/reference/README.md:218-248` model zoo table).
HF_BASE = "https://huggingface.co/mutou0308/GSASR/resolve/main"
PRETRAINED_MODELS = {
    "EDSR_paper_x1_4": f"{HF_BASE}/EDSRbaseline_GSASR_paper/net_g_latest.pth",
    "RDN_paper_x1_4": f"{HF_BASE}/RDN_GSASR_paper/net_g_latest.pth",
    "SWIN_paper_x1_4": f"{HF_BASE}/SWINIR_GSASR_paper/net_g_latest.pth",
    "EDSR_enhanced_x1_4": f"{HF_BASE}/EDSRbaseline_GSASR/net_g_latest.pth",
    "RDN_enhanced_x1_4": f"{HF_BASE}/RDN_GSASR/net_g_latest.pth",
    "SWIN_enhanced_x1_4": f"{HF_BASE}/SWINIR_GSASR/net_g_latest.pth",
    "HATL_ultra_x1_16": f"{HF_BASE}/HATL_GSASR_UltraPerformance/"
                        "net_g_latest.pth",
}


def download_pretrained_models(method: str,
                               save_dir: str = "pretrained") -> str:
    if method not in PRETRAINED_MODELS:
        raise KeyError(
            f"unknown model '{method}'; available: "
            f"{sorted(PRETRAINED_MODELS)}")
    url = PRETRAINED_MODELS[method]
    return load_file_from_url(url, save_dir, file_name=method + ".pth")

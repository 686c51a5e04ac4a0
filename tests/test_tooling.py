"""Tooling parity tests: download utils, model publishing, multiscale data
prep, metric CLI plumbing, complexity plot.

Reference behaviors covered:
- `basicsr/utils/misc.py:127-142` (sizeof_fmt)
- `basicsr/utils/download_util.py:82-108` (load_file_from_url caching)
- `scripts/publish_models.py:8-37` (sha256 stamping + key check)
- `scripts/data_preparation/generate_multiscale_dataset.py`
- `scripts/plot/model_complexity_cmp_bsrn.py`
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def test_sizeof_fmt():
    from gsasr_tpu.utils.download import sizeof_fmt
    assert sizeof_fmt(100) == "100.0 B"
    assert sizeof_fmt(2048) == "2.0 KB"
    assert sizeof_fmt(3 * 1024 ** 3) == "3.0 GB"


def test_load_file_from_url_file_scheme(tmp_path):
    from gsasr_tpu.utils.download import load_file_from_url
    src = tmp_path / "weights.bin"
    src.write_bytes(b"\x01\x02" * 100)
    out = load_file_from_url(src.as_uri(), str(tmp_path / "cache"),
                             progress=None)
    assert open(out, "rb").read() == src.read_bytes()
    # second call hits the cache (delete the source to prove it)
    src.unlink()
    out2 = load_file_from_url("file:///nonexistent/weights.bin",
                              str(tmp_path / "cache"), progress=None)
    assert out2 == out


def test_download_catalog_known_models():
    from gsasr_tpu.utils.download import PRETRAINED_MODELS
    assert "EDSR_paper_x1_4" in PRETRAINED_MODELS
    assert all(u.startswith("https://huggingface.co/")
               for u in PRETRAINED_MODELS.values())


def test_publish_sha_stamp_and_key_check(tmp_path):
    from gsasr_tpu.cli.publish import update_sha

    good = tmp_path / "net_g.npz"
    np.savez(good, **{"params/conv/kernel": np.zeros(3)})
    (final,) = update_sha([str(good)])
    assert final.exists() and not good.exists()
    base, sha = final.stem.rsplit("-", 1)
    assert base == "net_g" and len(sha) == 8
    # re-running with the correct sha is a no-op
    (final2,) = update_sha([str(final)])
    assert final2 == final and final.exists()

    bad = tmp_path / "random.npz"
    np.savez(bad, foo=np.zeros(2))
    with pytest.raises(ValueError):
        update_sha([str(bad)])
    (stamped,) = update_sha([str(bad)], allow_missing_keys=True)
    assert stamped.exists()


def test_publish_directory_manifest_sha(tmp_path):
    from gsasr_tpu.cli.publish import _sha256_dir
    d = tmp_path / "ckpt"
    (d / "sub").mkdir(parents=True)
    (d / "a.bin").write_bytes(b"aa")
    (d / "sub" / "b.bin").write_bytes(b"bb")
    h1 = _sha256_dir(d)
    (d / "sub" / "b.bin").write_bytes(b"bc")
    assert _sha256_dir(d) != h1


def test_multiscale_pyramid(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image
    from gsasr_tpu.cli.prepare_data import multiscale

    src = tmp_path / "gt"
    src.mkdir()
    Image.new("RGB", (64, 48), (10, 20, 30)).save(src / "img.png")
    dst = tmp_path / "out"
    multiscale(str(src), str(dst), shortest_edge=16,
               scales=(0.9, 0.5, 0.25))
    names = sorted(os.listdir(dst))
    # 0.9 -> (57, 43) ok; 0.5 -> (32, 24) ok; 0.25 -> (16, 12) < 16 skipped;
    # plus the shortest-edge-16 variant (T3)
    assert names == ["imgT0.png", "imgT1.png", "imgT3.png"]
    w, h = Image.open(dst / "imgT3.png").size
    assert min(w, h) == 16 and w == 21  # aspect preserved


def test_metrics_cli_niqe_smoke(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    folder = tmp_path / "sr"
    folder.mkdir()
    img = (rng.random((224, 224, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(folder / "a.png"), img)
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "gsasr_tpu.cli.metrics", "--metric", "niqe",
         "--restored", str(folder)],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr
    assert "Average: NIQE:" in out.stdout


def test_complexity_plot(tmp_path):
    pytest.importorskip("matplotlib")
    sys.path.insert(0, "/root/repo/scripts")
    try:
        from plot_complexity import plot
    finally:
        sys.path.pop(0)
    spec = [{"name": "GSASR", "params_k": 500, "psnr": 30.9,
             "flops_g": 100, "group": 0},
            {"name": "LIIF", "params_k": 1567, "psnr": 30.7,
             "flops_g": 80, "group": 1}]
    out = plot(spec, str(tmp_path / "cmp.png"))
    assert os.path.getsize(out) > 1000


def test_fid_cli_gate(tmp_path):
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "gsasr_tpu.cli.metrics", "--metric", "fid",
         "--restored", str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=120)
    assert out.returncode != 0
    assert "InceptionV3" in (out.stderr + out.stdout)

"""Tests for aux utils: flow IO, plot helpers, filter2D/USM sharpening."""

import numpy as np
import pytest

from tests.reference_oracle import import_reference_file, reference_available


def test_flow_flo_roundtrip(tmp_path):
    from gsasr_tpu.utils.flow import flowread, flowwrite
    rng = np.random.default_rng(0)
    flow = rng.standard_normal((6, 8, 2)).astype(np.float32)
    path = tmp_path / "a.flo"
    flowwrite(flow, path)
    back = flowread(path)
    np.testing.assert_array_equal(back, flow)


def test_flow_quantize_roundtrip():
    from gsasr_tpu.utils.flow import dequantize_flow, quantize_flow
    rng = np.random.default_rng(1)
    flow = (rng.standard_normal((5, 7, 2)) * 0.05).astype(np.float64)
    dx, dy = quantize_flow(flow, max_val=0.02, norm=True)
    assert dx.dtype == np.uint8
    back = dequantize_flow(dx, dy, max_val=0.02, denorm=True)
    # lossy: bin width is 2*max_val/255 in normalized units, scaled by w/h
    np.testing.assert_allclose(
        back[..., 0], np.clip(flow[..., 0], -0.02 * 7, 0.02 * 7),
        atol=0.02 * 2 / 255 * 7 + 1e-9)
    # zero maps to zero (255-level design)
    z = np.zeros((4, 4, 2))
    dx0, dy0 = quantize_flow(z)
    np.testing.assert_allclose(dequantize_flow(dx0, dy0), z, atol=1e-12)


def test_plot_txt_and_smooth(tmp_path):
    from gsasr_tpu.utils.plot import (read_data_from_txt_1v,
                                      read_data_from_txt_2v, smooth_data)
    log = tmp_path / "train.log"
    log.write_text("iter 100 loss 0.5\niter 200 loss 0.25\nnoise\n")
    steps, values = read_data_from_txt_2v(
        log, r"iter (\d+) loss ([\d.]+)")
    assert steps == [100, 200] and values == [0.5, 0.25]
    vals = read_data_from_txt_1v(log, r"iter \d+ loss ([\d.]+)")
    assert vals == [0.5, 0.25]
    sm = smooth_data([1.0, 0.0, 0.0], 0.5)
    np.testing.assert_allclose(sm, [1.0, 0.5, 0.25])


@pytest.mark.skipif(not reference_available(), reason="no reference tree")
def test_filter2d_parity_vs_torch():
    import torch
    ref = import_reference_file(
        "TrainTestGSASR/basicsr/utils/img_process_util.py",
        "img_process_util")
    import jax.numpy as jnp
    from gsasr_tpu.ops.img_process import filter2D

    rng = np.random.default_rng(2)
    img = rng.random((2, 10, 12, 3), dtype=np.float32)
    # per-sample kernels
    k = rng.random((2, 5, 5), dtype=np.float32)
    k /= k.sum(axis=(1, 2), keepdims=True)
    y_ref = ref.filter2D(torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2))),
                         torch.from_numpy(k)).numpy().transpose(0, 2, 3, 1)
    y = np.asarray(filter2D(jnp.asarray(img), jnp.asarray(k)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-6)
    # shared kernel
    k1 = k[:1]
    y_ref = ref.filter2D(torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2))),
                         torch.from_numpy(k1)).numpy().transpose(0, 2, 3, 1)
    y = np.asarray(filter2D(jnp.asarray(img), jnp.asarray(k1)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="no reference tree")
def test_usm_sharp_parity_vs_reference():
    """Our jax USMSharp vs the reference torch USMSharp module (identical
    kernel construction via cv2.getGaussianKernel semantics)."""
    import torch
    ref = import_reference_file(
        "TrainTestGSASR/basicsr/utils/img_process_util.py",
        "img_process_util")
    import jax.numpy as jnp
    from gsasr_tpu.ops.img_process import USMSharp

    rng = np.random.default_rng(3)
    img = rng.random((1, 16, 18, 3), dtype=np.float32)
    ref_mod = ref.USMSharp(radius=9)
    y_ref = ref_mod(torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2))))
    y_ref = y_ref.numpy().transpose(0, 2, 3, 1)
    ours = USMSharp(radius=9)
    y = np.asarray(ours(jnp.asarray(img)))
    # threshold mask is a hard comparison; tolerate a few flipped pixels'
    # soft-mask contribution
    assert np.abs(y - y_ref).max() < 5e-3
    assert np.abs(y - y_ref).mean() < 1e-4


def test_lmdb_roundtrip_small_values(tmp_path):
    """LmdbMaker -> FileClient('lmdb') round trip on inline-sized values
    (the `lmdb` package is absent here, so this exercises the pure-Python
    mini_lmdb fallback writing/parsing the real on-disk format)."""
    from gsasr_tpu.utils.file_client import FileClient
    from gsasr_tpu.utils.lmdb_writer import LmdbMaker

    db = str(tmp_path / "small.lmdb")
    maker = LmdbMaker(db, map_size=2 ** 20, batch=3)
    payloads = {f"im{i:03d}": bytes([i]) * (10 + 7 * i) for i in range(10)}
    for k, v in payloads.items():
        maker.put(v, k, (4, 4, 3))
    maker.close()

    fc = FileClient("lmdb", db_paths=[db], client_keys=["gt"])
    for k, v in payloads.items():
        assert fc.get(k, "gt") == v
    assert fc.client.get("missing", "gt") is None
    # meta_info.txt sidecar written in the BasicSR format
    lines = (tmp_path / "small.lmdb" / "meta_info.txt").read_text()
    assert "im000.png (4,4,3) 1" in lines


def test_lmdb_roundtrip_overflow_values_and_many_keys(tmp_path):
    """Values past the inline node limit take overflow pages; enough keys
    to force multiple leaf pages and a branch root."""
    import numpy as np

    from gsasr_tpu.utils.file_client import FileClient
    from gsasr_tpu.utils.lmdb_writer import LmdbMaker

    rng = np.random.default_rng(0)
    db = str(tmp_path / "big.lmdb")
    maker = LmdbMaker(db, map_size=64 * 2 ** 20)
    payloads = {}
    for i in range(300):
        size = int(rng.integers(1, 3000)) if i % 3 else int(
            rng.integers(5000, 20000))
        payloads[f"k{i:04d}"] = rng.integers(
            0, 256, size, dtype=np.uint8).tobytes()
        maker.put(payloads[f"k{i:04d}"], f"k{i:04d}", (1, size, 1))
    maker.close()

    fc = FileClient("lmdb", db_paths=[db])
    for k, v in payloads.items():
        got = fc.get(k, "default")
        assert got == v, f"{k}: {len(got or b'')} != {len(v)}"


def test_lmdb_dataset_pipeline(tmp_path):
    """make_lmdb_from_imgs -> paired_paths_from_lmdb -> FileClient read ->
    imfrombytes: the reference's lmdb dataset pipeline end-to-end
    (`basicsr/utils/lmdb_util.py:9-132`, `data_util.py:95-153`)."""
    import cv2
    import numpy as np

    from gsasr_tpu.data import data_util as DU
    from gsasr_tpu.utils.file_client import FileClient, imfrombytes
    from gsasr_tpu.utils.lmdb_writer import make_lmdb_from_imgs

    rng = np.random.default_rng(1)
    src = tmp_path / "imgs"
    src.mkdir()
    names = []
    for i in range(5):
        img = (rng.random((24, 20, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(src / f"s{i}.png"), img)
        names.append(f"s{i}.png")

    gt_db = str(tmp_path / "gt.lmdb")
    lq_db = str(tmp_path / "lq.lmdb")
    keys = [n[:-4] for n in names]
    make_lmdb_from_imgs(str(src), gt_db, names, keys, compress_level=1)
    make_lmdb_from_imgs(str(src), lq_db, names, keys, compress_level=1,
                        multiprocessing_read=True, n_thread=2)

    pairs = DU.paired_paths_from_lmdb([lq_db, gt_db], ["lq", "gt"])
    assert len(pairs) == 5
    fc = FileClient("lmdb", db_paths=[gt_db], client_keys=["gt"])
    img = imfrombytes(fc.get(pairs[0]["gt_path"], "gt"), float32=True)
    assert img.shape == (24, 20, 3) and img.dtype == np.float32
    ref = cv2.imread(str(src / f"{pairs[0]['gt_path']}.png")).astype(
        np.float32) / 255.0
    np.testing.assert_allclose(img, ref)


def test_message_logger_and_avg_timer(tmp_path, caplog):
    """MessageLogger formats epoch/iter/lr/eta + metrics and writes
    tensorboard scalars (torch's SummaryWriter is available in-image);
    AvgTimer windows its average (`logger.py:10-117` equivalents)."""
    import logging as _logging
    import time

    from gsasr_tpu.utils.logging import AvgTimer, MessageLogger

    tb_dir = str(tmp_path / "tb")
    ml = MessageLogger(total_iter=1000, start_iter=0, tb_dir=tb_dir)
    records = []

    class _Cap(_logging.Handler):
        def emit(self, rec):
            records.append(rec.getMessage())

    ml.logger.addHandler(_Cap())
    try:
        ml(100, 2, 1.5e-4, {"l_pix": 0.1234}, iter_time=0.5)
        ml.log_validation(100, "val_set", {"psnr": 30.12, "ssim": 0.91})
    finally:
        ml.logger.handlers = [h for h in ml.logger.handlers
                              if not isinstance(h, _Cap)]
    text = "\n".join(records)
    assert "iter:     100" in text and "1.500e-04" in text
    assert "l_pix: 1.2340e-01" in text and "eta:" in text
    assert "Validation val_set" in text and "psnr: 30.1200" in text
    if ml.tb is not None:
        ml.tb.flush()
        import os
        assert any(f.startswith("events") for f in os.listdir(tb_dir))

    t = AvgTimer(window=3)
    for _ in range(5):
        t.start()
        time.sleep(0.01)
        t.record()
    assert len(t.times) == 3
    assert 0.005 < t.get_avg_time() < 0.1


def test_get_env_info():
    from gsasr_tpu.utils.env import get_env_info

    info = get_env_info()
    assert "jax:" in info and "backend:" in info
    assert "flax:" in info

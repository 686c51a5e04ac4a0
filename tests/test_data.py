"""Data pipeline tests: continuous-scale dataset semantics + sharding."""

import math

import numpy as np
import pytest


@pytest.fixture(scope="module")
def gt_dir(tmp_path_factory):
    import cv2
    d = tmp_path_factory.mktemp("gt")
    g = np.random.default_rng(0)
    for i in range(4):
        img = (g.random((220, 240, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"img{i}.png"), img)
    return d


def test_continuous_dataset_semantics(gt_dir):
    from gsasr_tpu.data.datasets import ContinuousBicubicDataset

    ds = ContinuousBicubicDataset([str(gt_dir)], scale_list=(1.0, 4.0),
                                  lr_size=48, seed=3)
    assert len(ds) == 4
    assert ds.gt_size_max == math.ceil(4.0 * 48)
    s = ds[0]
    assert s["lq"].shape == (48, 48, 3)
    assert s["gt"].shape == (ds.gt_size_max, ds.gt_size_max, 3)
    assert 1.0 <= float(s["scale"]) <= 4.0
    gh, gw = int(s["gt_h"]), int(s["gt_w"])
    assert gh == math.ceil(float(s["scale"]) * 48)
    # realized scale_modify = crop / lr_size
    np.testing.assert_allclose(s["scale_modify"][0], gh / 48, rtol=1e-6)
    # padding beyond gt size is zero
    if gh < ds.gt_size_max:
        assert np.all(s["gt"][gh:] == 0)
    assert s["lq"].min() >= 0 and s["lq"].max() <= 1


def test_batch_iterator_sharding(gt_dir):
    from gsasr_tpu.data.datasets import (ContinuousBicubicDataset,
                                         batch_iterator, epoch_indices)

    ds = ContinuousBicubicDataset([str(gt_dir)], lr_size=24)
    batches = list(batch_iterator(ds, 2, epoch=0, enlarge_ratio=4))
    assert len(batches) == 8  # 4 imgs * 4 enlarge / 2 per batch
    b = batches[0]
    assert b["lq"].shape == (2, 24, 24, 3)
    assert b["scale"].shape == (2,)
    assert b["gt_h"].dtype == np.int32

    # shards partition the index stream
    i0 = epoch_indices(10, epoch=1, num_shards=2, shard=0)
    i1 = epoch_indices(10, epoch=1, num_shards=2, shard=1)
    assert len(i0) == len(i1) == 5
    # deterministic given (seed, epoch)
    np.testing.assert_array_equal(i0, epoch_indices(10, epoch=1,
                                                    num_shards=2, shard=0))


def test_checkpoint_roundtrip(tmp_path, rng):
    import jax
    from gsasr_tpu.train import TrainConfig, Trainer
    from gsasr_tpu.models import EDSRNOUP, Fea2GS
    from gsasr_tpu.utils.checkpoint import (latest_step, restore_checkpoint,
                                            save_checkpoint)

    enc = EDSRNOUP(num_feat=8, num_block=1)
    dec = Fea2GS(inchannel=8, channel=12, num_heads=6,
                 num_crossattn_blocks=1, num_crossattn_layers=1,
                 num_selfattn_blocks=1, num_selfattn_layers=1,
                 num_gs_seed=16, window_size=4)
    trainer = Trainer(enc, dec, TrainConfig(canvas_hw=(16, 16)))
    state = trainer.init(jax.random.PRNGKey(0), (1, 4, 4, 3))

    save_checkpoint(tmp_path / "ck", 7, state)
    assert latest_step(tmp_path / "ck") == 7

    state2 = trainer.init(jax.random.PRNGKey(1), (1, 4, 4, 3))
    restored = restore_checkpoint(tmp_path / "ck", 7, state2)
    a = jax.tree_util.tree_leaves(state.params_g)[0]
    b = jax.tree_util.tree_leaves(restored.params_g)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_prefetcher(gt_dir):
    from gsasr_tpu.data.datasets import ContinuousBicubicDataset, batch_iterator
    from gsasr_tpu.data.prefetch import DevicePrefetcher

    ds = ContinuousBicubicDataset([str(gt_dir)], lr_size=16)
    it = batch_iterator(ds, 2)
    batches = list(DevicePrefetcher(it))
    assert len(batches) == 2
    import jax
    assert isinstance(batches[0]["lq"], jax.Array)


def test_stage_timer():
    import jax.numpy as jnp
    from gsasr_tpu.utils.profiler import StageTimer

    t = StageTimer()
    with t.stage("mul") as h:
        h["out"] = jnp.ones((8, 8)) * 3
    with t.stage("mul") as h:
        h["out"] = jnp.ones((8, 8)) * 4
    rep = t.report()
    assert "mul" in rep and t.counts["mul"] == 2


def test_paired_paths_and_file_client(gt_dir):
    from gsasr_tpu.data.data_util import paired_paths_from_folder
    from gsasr_tpu.utils.file_client import FileClient, imfrombytes

    paths = paired_paths_from_folder([str(gt_dir), str(gt_dir)],
                                     ["lq", "gt"])
    assert len(paths) == 4 and "lq_path" in paths[0]
    fc = FileClient("disk")
    img = imfrombytes(fc.get(paths[0]["gt_path"]), float32=True)
    assert img.ndim == 3 and img.dtype == np.float32


def test_config_loader(tmp_path):
    import yaml
    from gsasr_tpu.config import (apply_overrides, build_networks,
                                  build_train_config, load_options)

    cfg = {
        "name": "t", "datasets": {"train": {"lr_size": 12,
                                            "scale_list": [1, 2]}},
        "network_g": {"type": "EDSRNOUP", "num_feat": 8, "num_block": 1},
        "network_fea2gs": {"type": "Fea2GS", "channel": 12,
                           "num_gs_seed": 16, "window_size": 4},
        "train": {"optim_g": {"lr": 1e-3}, "total_iter": 10,
                  "scheduler": {"milestones": [5]}},
    }
    p = tmp_path / "c.yml"
    p.write_text(yaml.safe_dump(cfg))
    opt = load_options(p)
    opt = apply_overrides(opt, ["train.total_iter=20"])
    assert opt["train"]["total_iter"] == 20
    enc, dec = build_networks(opt)
    assert enc.num_feat == 8 and dec.channel == 12
    tc = build_train_config(opt)
    assert tc.total_iter == 20 and tc.canvas_hw == (24, 24)


def test_threaded_batch_iterator_deterministic(gt_dir):
    """num_workers>0 must produce an identical batch stream run-to-run
    (per-position RNGs make it independent of thread scheduling)."""
    from gsasr_tpu.data.datasets import (ContinuousBicubicDataset,
                                         batch_iterator)

    ds = ContinuousBicubicDataset([str(gt_dir)], lr_size=24, seed=7)
    a = list(batch_iterator(ds, 2, epoch=3, seed=7, num_workers=3))
    b = list(batch_iterator(ds, 2, epoch=3, seed=7, num_workers=2))
    assert len(a) == len(b) == 2
    for ba, bb in zip(a, b):
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])
    # same index stream as the serial path (sample contents differ only in
    # RNG draw, which is positional in both cases for a fixed seed/epoch)
    c = list(batch_iterator(ds, 2, epoch=3, seed=7, num_workers=0))
    assert len(c) == len(a)
    assert all(ba["lq"].shape == bc["lq"].shape for ba, bc in zip(a, c))


def test_metric_history_and_best():
    from gsasr_tpu.utils.logging import MetricHistory

    h = MetricHistory()
    assert h.update("Set5", 100, {"psnr": 30.0, "lpips": 0.30})
    assert not h.update("Set5", 200, {"psnr": 29.5, "lpips": 0.35})
    assert h.update("Set5", 300, {"psnr": 31.0, "lpips": 0.40})  # psnr up
    best = h.best("Set5")
    assert best["psnr"] == {"val": 31.0, "iter": 300}
    # lpips is lower-better: best stays at iter 100
    assert best["lpips"] == {"val": 0.30, "iter": 100}
    assert [v for _, v in h.history("Set5", "psnr")] == [30.0, 29.5, 31.0]


def test_mark_best_survives_prune(tmp_path):
    from gsasr_tpu.utils.checkpoint import _prune, mark_best

    d = tmp_path / "ckpts"
    d.mkdir()
    for s in (100, 200, 300, 400, 500):
        (d / str(s)).mkdir()
    mark_best(d, 100)
    _prune(d, keep=2)
    kept = sorted(int(p.name) for p in d.iterdir() if p.name.isdigit())
    assert kept == [100, 400, 500]  # best (100) outlives the keep window
    mark_best(d, 500)  # atomic refresh over existing link
    import os
    assert os.readlink(d / "best") == "500"


def test_calculate_metric_dispatch():
    from gsasr_tpu.metrics import calculate_metric, calculate_psnr

    g = np.random.default_rng(0)
    img = (g.random((32, 32, 3)) * 255).astype(np.float64)
    img2 = np.clip(img + g.normal(0, 4, img.shape), 0, 255)
    via_registry = calculate_metric(
        dict(img=img, img2=img2),
        dict(type="calculate_psnr", crop_border=2, test_y_channel=True))
    direct = calculate_psnr(img, img2, 2, test_y_channel=True)
    assert via_registry == direct
    with pytest.raises(ValueError):
        calculate_metric(dict(img=img, img2=img2), dict(type="nope"))

"""Training CLI — equivalent of `TrainTestGSASR/basicsr/train.py`.

Usage:
  python -m gsasr_tpu.cli.train -opt configs/train_edsr_paper.yml \
      [--auto_resume] [--force_yml train:total_iter=1000]

Single-controller JAX: one process drives all local devices (data-parallel
mesh); multi-host runs call jax.distributed.initialize() first.
"""

from __future__ import annotations

import argparse
import math
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-opt", required=True)
    p.add_argument("--auto_resume", action="store_true")
    p.add_argument("--force_yml", nargs="*", default=None)
    p.add_argument("--multihost", action="store_true")
    args = p.parse_args()

    if args.multihost:
        import os

        import jax

        # On a TPU pod slice initialize() discovers topology from the
        # runtime; off-pod (CPU/GPU clusters) the standard rendezvous
        # variables drive it (equivalent of the reference's
        # init_dist pytorch launcher reading RANK/WORLD_SIZE,
        # `basicsr/utils/dist_util.py:11-64`).
        kwargs = {}
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            kwargs = dict(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]))
        jax.distributed.initialize(**kwargs)

    from gsasr_tpu.utils.env import enable_compilation_cache, get_env_info
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsasr_tpu.config import (apply_overrides, build_networks,
                                  build_train_config, load_options)
    from gsasr_tpu.data.datasets import ContinuousBicubicDataset, batch_iterator
    from gsasr_tpu.data.prefetch import DevicePrefetcher
    from gsasr_tpu.parallel.mesh import batch_sharding
    from gsasr_tpu.train import Trainer
    from gsasr_tpu.utils.checkpoint import (latest_step, mark_best,
                                            restore_checkpoint,
                                            save_checkpoint)
    from gsasr_tpu.utils.logging import (AvgTimer, MessageLogger,
                                         MetricHistory, get_root_logger,
                                         init_wandb_logger)
    opt = apply_overrides(load_options(args.opt), args.force_yml)
    exp_dir = opt.get("path", {}).get(
        "experiments_root", f"experiments/{opt.get('name', 'run')}")
    import os
    os.makedirs(exp_dir, exist_ok=True)
    logger = get_root_logger(log_file=f"{exp_dir}/train.log")
    logger.info(get_env_info())
    enc, dec = build_networks(opt)
    cfg = build_train_config(opt)
    trainer = Trainer(enc, dec, cfg)

    ds_opt = next(v for k, v in opt["datasets"].items()
                  if k.startswith("train"))
    dataset = ContinuousBicubicDataset(
        ds_opt["all_gt_list"], scale_list=ds_opt.get("scale_list", (1, 4)),
        lr_size=ds_opt.get("lr_size", 48),
        use_hflip=ds_opt.get("use_hflip", True),
        use_rot=ds_opt.get("use_rot", True),
        round_mode=ds_opt.get("round_mode", "ceil"),
        clamp_scale_to_image=ds_opt.get("clamp_scale_to_image", False),
        sample_size=ds_opt.get("sample_size", 0),
        seed=opt.get("manual_seed", 0))
    # Per-host batch: each process loads its own shard; the global batch
    # (what the jitted step sees) is per_gpu * total devices.
    batch_size = ds_opt.get("batch_size_per_gpu", 16) * \
        jax.local_device_count()
    global_batch = ds_opt.get("batch_size_per_gpu", 16) * jax.device_count()
    lr_size = ds_opt.get("lr_size", 48)

    state = trainer.init(
        jax.random.PRNGKey(opt.get("manual_seed", 0)),
        (batch_size, lr_size, lr_size, 3))

    # pretrained-network loading (reference `path.pretrain_network_g` /
    # `path_fea2gs.pretrain_network_fea2gs`, train.py:132-142): initialize
    # params (and EMA) from a .pth or an orbax step dir before training.
    from gsasr_tpu.utils.checkpoint import (CONVERTER_KINDS,
                                            load_pretrained_params as
                                            _load_pretrain)

    path_opt = opt.get("path", {}) or {}
    pg = _load_pretrain(path_opt.get("pretrain_network_g"),
                        CONVERTER_KINDS[opt["network_g"]["type"]],
                        path_opt.get("param_key_g", "params"), net="g")
    pd = _load_pretrain(
        (opt.get("path_fea2gs", {}) or {}).get("pretrain_network_fea2gs"),
        CONVERTER_KINDS[opt["network_fea2gs"]["type"]],
        (opt.get("path_fea2gs", {}) or {}).get(
            "param_key_fea2gs", "params"), net="fea2gs")
    if pg is not None:
        state = state.replace(params_g=pg, ema_g=jax.tree_util.tree_map(
            jnp.copy, pg))
        logger.info("loaded pretrain_network_g")
    if pd is not None:
        state = state.replace(params_d=pd, ema_d=jax.tree_util.tree_map(
            jnp.copy, pd))
        logger.info("loaded pretrain_network_fea2gs")

    ckpt_dir = f"{exp_dir}/checkpoints"
    start_iter = 0
    if args.auto_resume:
        step = latest_step(ckpt_dir)
        if step is not None:
            state = restore_checkpoint(ckpt_dir, step, state)
            start_iter = int(step)
            logger.info(f"resumed from iter {start_iter}")

    total = cfg.total_iter
    log_opt = opt.get("logger", {}) or {}
    save_freq = log_opt.get("save_checkpoint_freq", 5000)
    print_freq = log_opt.get("print_freq", 100)
    val_opt = next((v for k, v in opt.get("datasets", {}).items()
                    if k.startswith("val")), None)
    val_freq = opt.get("val", {}).get("val_freq", 10000)

    # Observability (reference train.py:98-231): MessageLogger + tb event
    # files + wandb (optional) + validation metric history with best
    # tracking (base_model.py:50-73).
    tb_dir = (f"{exp_dir}/tb_logger"
              if log_opt.get("use_tb_logger", True) else None)
    # wandb must init BEFORE the tb SummaryWriter is created:
    # sync_tensorboard=True only patches writers constructed after
    # wandb.init (reference logger.py:126-131 "to allow proper sync").
    init_wandb_logger(opt)
    msg_logger = MessageLogger(total, start_iter, tb_dir=tb_dir)
    history = MetricHistory()

    def run_validation(it, state):
        """In-training validation (reference `nondist_validation`, rank 0,
        EMA weights, metrics from the yaml `val.metrics` table)."""
        import numpy as np
        from gsasr_tpu.data.datasets import PairedImageDataset
        from gsasr_tpu.metrics import calculate_metric, crop_border_for_scale
        from gsasr_tpu.model import sr_forward

        ds = PairedImageDataset(val_opt["dataroot_gt"],
                                val_opt["dataroot_lq"],
                                val_opt.get("scale", 4))
        crop = crop_border_for_scale(ds.scale)
        # Images in this pipeline are RGB throughout; calculate_psnr/ssim
        # default to channel_order='bgr' (cv2 convention of the reference
        # configs), so the order must be forced to 'rgb' here — including
        # for yaml-supplied metric opts — or Y-channel metrics use swapped
        # R/B BT.601 coefficients.
        metric_opts = opt.get("val", {}).get("metrics") or {
            "psnr": dict(type="calculate_psnr", crop_border=crop,
                         test_y_channel=True),
            "ssim": dict(type="calculate_ssim", crop_border=crop,
                         test_y_channel=True),
        }
        metric_opts = {name: {**mopt, "channel_order": "rgb"}
                       for name, mopt in metric_opts.items()}
        n_images = min(len(ds), val_opt.get("max_images", len(ds)))
        sums = {k: 0.0 for k in metric_opts}
        # Materialize EMA params host-locally: feeding globally-sharded
        # arrays into the stage-jitted sr_forward would pull validation
        # onto the global mesh (all processes must participate); local
        # numpy copies keep it a per-host computation (replicated arrays
        # are locally addressable).
        to_local = lambda tree: jax.tree_util.tree_map(np.asarray, tree)
        ema_g, ema_d = to_local(state.ema_g), to_local(state.ema_d)
        for i in range(n_images):
            item = ds[i]
            lq = jnp.asarray(item["lq"])[None]
            want = (item["gt"].shape[0], item["gt"].shape[1])
            out = np.asarray(sr_forward(
                enc, dec, ema_g, ema_d, lq, ds.scale,
                sr_size=want, dmax=0.1))[0]
            sr255 = np.clip(out, 0, 1) * 255
            gt255 = item["gt"] * 255
            for name, mopt in metric_opts.items():
                sums[name] += calculate_metric(
                    dict(img=sr255, img2=gt255), mopt)
        results = {k: v / max(n_images, 1) for k, v in sums.items()}
        ds_name = val_opt.get("name", "val")
        # identical across hosts (same data, replicated params), so the
        # improved-decision is consistent; only host 0 logs.
        improved = history.update(ds_name, it, results)
        if jax.process_index() == 0:
            msg_logger.log_validation(it, ds_name, results, best=history)
        return improved

    it = start_iter
    epoch = 0
    num_hosts = jax.process_count()
    host = jax.process_index()
    num_workers = ds_opt.get("num_worker_per_gpu", 4)
    data_timer = AvgTimer()
    iter_timer = AvgTimer()
    data_sharding = batch_sharding(trainer.mesh)
    while it < total:
        # Threaded sample assembly + device prefetch: decode/resize of
        # upcoming batches and the host->device copy both overlap the
        # running step (reference prefetch_dataloader.py:61-123).
        prefetcher = DevicePrefetcher(
            batch_iterator(
                dataset, batch_size, epoch=epoch,
                seed=opt.get("manual_seed", 0),
                num_shards=num_hosts, shard=host,
                enlarge_ratio=ds_opt.get("dataset_enlarge_ratio", 1),
                num_workers=num_workers),
            sharding=data_sharding)
        batches = iter(prefetcher)
        while True:
            data_timer.start()
            batch = next(batches, None)
            data_timer.record()
            if batch is None:
                break
            iter_timer.start()
            state, metrics = trainer.step(state, batch)
            it += 1
            if it % print_freq == 0:
                jax.block_until_ready(metrics["loss"])
                iter_timer.record()
                scalars = {k: float(v) for k, v in metrics.items()
                           if k != "lr"}
                scalars["data_time"] = data_timer.get_avg_time()
                msg_logger(it, epoch, float(metrics["lr"]), scalars,
                           iter_time=iter_timer.get_avg_time())
            else:
                iter_timer.record()
            # orbax checkpointing is multiprocess-coordinated: ALL hosts
            # call save (primary writes); gating on host 0 would deadlock
            # a multi-process run on globally-sharded arrays.
            if it % save_freq == 0:
                save_checkpoint(ckpt_dir, it, state)
            if val_opt is not None and it % val_freq == 0:
                improved = run_validation(it, state)
                if improved:
                    # keep the best-metric step around even past `keep`
                    # (base_model.py:50-73 best tracking).
                    save_checkpoint(ckpt_dir, it, state)
                    if host == 0:
                        mark_best(ckpt_dir, it)
            if it >= total:
                # Shut the prefetcher down cleanly instead of abandoning
                # its worker thread blocked on a full queue.
                prefetcher.close()
                break
        epoch += 1

    save_checkpoint(ckpt_dir, it, state)
    logger.info("training done")


if __name__ == "__main__":
    main()

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
        import jax
        jax.distributed.initialize()

    from gsasr_tpu.utils.env import enable_compilation_cache, get_env_info
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsasr_tpu.config import (apply_overrides, build_networks,
                                  build_train_config, load_options)
    from gsasr_tpu.data.datasets import ContinuousBicubicDataset, batch_iterator
    from gsasr_tpu.train import Trainer
    from gsasr_tpu.utils.checkpoint import (latest_step, restore_checkpoint,
                                            save_checkpoint)

    print(get_env_info(), flush=True)
    opt = apply_overrides(load_options(args.opt), args.force_yml)
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
    batch_size = ds_opt.get("batch_size_per_gpu", 16) * jax.device_count()
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
        print("loaded pretrain_network_g")
    if pd is not None:
        state = state.replace(params_d=pd, ema_d=jax.tree_util.tree_map(
            jnp.copy, pd))
        print("loaded pretrain_network_fea2gs")

    exp_dir = opt.get("path", {}).get(
        "experiments_root", f"experiments/{opt.get('name', 'run')}")
    ckpt_dir = f"{exp_dir}/checkpoints"
    start_iter = 0
    if args.auto_resume:
        step = latest_step(ckpt_dir)
        if step is not None:
            state = restore_checkpoint(ckpt_dir, step, state)
            start_iter = int(step)
            print(f"resumed from iter {start_iter}")

    total = cfg.total_iter
    save_freq = opt.get("logger", {}).get("save_checkpoint_freq", 5000)
    print_freq = opt.get("logger", {}).get("print_freq", 100)
    val_opt = next((v for k, v in opt.get("datasets", {}).items()
                    if k.startswith("val")), None)
    val_freq = opt.get("val", {}).get("val_freq", 10000)

    def run_validation(it, state):
        """In-training validation (reference `dist_validation`, rank 0,
        EMA weights, PSNR/SSIM protocol)."""
        import numpy as np
        from gsasr_tpu.data.datasets import PairedImageDataset
        from gsasr_tpu.metrics import (calculate_psnr, calculate_ssim,
                                       crop_border_for_scale)
        from gsasr_tpu.model import sr_forward

        ds = PairedImageDataset(val_opt["dataroot_gt"],
                                val_opt["dataroot_lq"],
                                val_opt.get("scale", 4))
        crop = crop_border_for_scale(ds.scale)
        psnrs, ssims = [], []
        for i in range(min(len(ds), val_opt.get("max_images", 10))):
            item = ds[i]
            lq = jnp.asarray(item["lq"])[None]
            want = (item["gt"].shape[0], item["gt"].shape[1])
            out = np.asarray(sr_forward(
                enc, dec, state.ema_g, state.ema_d, lq, ds.scale,
                sr_size=want, dmax=0.1))[0]
            sr255 = np.clip(out, 0, 1) * 255
            gt255 = item["gt"] * 255
            psnrs.append(calculate_psnr(sr255, gt255, crop,
                                        test_y_channel=True,
                                        channel_order="rgb"))
            ssims.append(calculate_ssim(sr255, gt255, crop,
                                        test_y_channel=True,
                                        channel_order="rgb"))
        print(f"VAL @ iter {it}: psnr {np.mean(psnrs):.4f} "
              f"ssim {np.mean(ssims):.5f} over {len(psnrs)} images",
              flush=True)

    it = start_iter
    epoch = 0
    num_hosts = jax.process_count()
    host = jax.process_index()
    t_last = time.time()
    while it < total:
        for batch in batch_iterator(
                dataset, batch_size, epoch=epoch,
                seed=opt.get("manual_seed", 0),
                num_shards=num_hosts, shard=host,
                enlarge_ratio=ds_opt.get("dataset_enlarge_ratio", 1)):
            state, metrics = trainer.step(
                state, {k: jnp.asarray(v) for k, v in batch.items()})
            it += 1
            if it % print_freq == 0:
                loss = float(metrics["loss"])
                dt = (time.time() - t_last) / print_freq
                t_last = time.time()
                print(f"iter {it}/{total} loss {loss:.4f} "
                      f"lr {float(metrics['lr']):.2e} {dt * 1e3:.0f} ms/it",
                      flush=True)
            if it % save_freq == 0 and host == 0:
                save_checkpoint(ckpt_dir, it, state)
            if val_opt is not None and it % val_freq == 0 and host == 0:
                run_validation(it, state)
            if it >= total:
                break
        epoch += 1

    if host == 0:
        save_checkpoint(ckpt_dir, it, state)
    print("training done")


if __name__ == "__main__":
    main()

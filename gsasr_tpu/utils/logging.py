"""Training loggers — equivalents of `basicsr/utils/logger.py`.

- AvgTimer (:10-44): windowed average iteration timer.
- MessageLogger (:45-117): epoch/iter/lr/time/ETA console lines + optional
  TensorBoard scalars (tensorboardX/torch.utils unavailable here; we write
  TB event files via flax's metric_writers if present, else no-op).
- get_root_logger (:146-186): process-aware logger (suppresses non-zero
  hosts like the reference suppresses non-zero ranks).
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional


def get_root_logger(name="gsasr_tpu", log_file: Optional[str] = None,
                    level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    fmt = logging.Formatter(
        "%(asctime)s %(levelname)s: %(message)s", "%Y-%m-%d %H:%M:%S")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    try:
        import jax
        is_main = jax.process_index() == 0
    except Exception:
        is_main = True
    logger.setLevel(level if is_main else logging.ERROR)
    if log_file and is_main:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


class AvgTimer:
    """Windowed average timer (`logger.py:10-44`)."""

    def __init__(self, window: int = 200):
        self.window = window
        self.times = []
        self._start = time.time()

    def start(self):
        self._start = time.time()

    def record(self):
        self.times.append(time.time() - self._start)
        if len(self.times) > self.window:
            self.times.pop(0)
        self._start = time.time()

    def get_avg_time(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


class MessageLogger:
    """Console + TensorBoard training logger (`logger.py:45-117`)."""

    def __init__(self, total_iter: int, start_iter: int = 0,
                 tb_dir: Optional[str] = None):
        self.total_iter = total_iter
        self.start_iter = start_iter
        self.start_time = time.time()
        self.logger = get_root_logger()
        self.tb = None
        if tb_dir:
            try:
                from tensorboardX import SummaryWriter  # type: ignore
                self.tb = SummaryWriter(tb_dir)
            except ImportError:
                try:
                    from torch.utils.tensorboard import SummaryWriter
                    self.tb = SummaryWriter(tb_dir)
                except Exception:
                    self.logger.warning("no tensorboard writer available")

    def __call__(self, it: int, epoch: int, lr: float,
                 metrics: Dict[str, float], iter_time: float = None):
        msg = f"[epoch:{epoch:3d}, iter:{it:8,d}, lr:({lr:.3e})] "
        if iter_time is not None:
            done = max(it - self.start_iter, 1)
            eta = iter_time * (self.total_iter - it)
            msg += f"[time: {iter_time:.3f}s, eta: {eta/3600:.1f}h] "
        msg += " ".join(f"{k}: {v:.4e}" for k, v in metrics.items())
        self.logger.info(msg)
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(f"train/{k}", v, it)
            self.tb.add_scalar("train/lr", lr, it)

    def log_validation(self, it: int, dataset: str,
                       metrics: Dict[str, float]):
        msg = f"Validation {dataset} @ iter {it:,d}: " + ", ".join(
            f"{k}: {v:.4f}" for k, v in metrics.items())
        self.logger.info(msg)
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(f"metrics/{dataset}/{k}", v, it)

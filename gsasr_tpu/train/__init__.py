from gsasr_tpu.train.schedules import multistep_warmup_schedule
from gsasr_tpu.train.trainer import TrainConfig, Trainer, TrainState

__all__ = ["Trainer", "TrainConfig", "TrainState",
           "multistep_warmup_schedule"]

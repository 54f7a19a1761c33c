from lako_tpu.train.optim import make_optimizer, warmup_linear_schedule
from lako_tpu.train.state import TrainState

__all__ = ["make_optimizer", "warmup_linear_schedule", "TrainState"]

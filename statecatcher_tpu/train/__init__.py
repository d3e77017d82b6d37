"""L4 training orchestration: jitted step, loop, optimizer, checkpoints."""

from statecatcher_tpu.train.step import TrainStepFn, make_train_step, build_optimizer
from statecatcher_tpu.train.loop import train

__all__ = ["TrainStepFn", "make_train_step", "build_optimizer", "train"]

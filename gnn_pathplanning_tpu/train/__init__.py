from .trainer import Trainer, TrainConfig, TrainState, make_train_step, render_batch
from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint
from .metrics import PerformanceRecorder

__all__ = [
    "Trainer",
    "TrainConfig",
    "TrainState",
    "make_train_step",
    "render_batch",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "PerformanceRecorder",
]

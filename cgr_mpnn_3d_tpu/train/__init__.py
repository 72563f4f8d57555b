"""Training subsystem: trainer, optimizer, checkpointing, metrics, eval."""

from .checkpoint import load_checkpoint, restore_into, save_checkpoint
from .evaluate import evaluate, load_model, parity_plot, predict
from .metrics import MetricsLogger
from .trainer import (RxnGraphTrainer, TrainState, make_optimizer,
                      set_epoch_lr, sse_loss)

__all__ = ["load_checkpoint", "restore_into", "save_checkpoint", "evaluate",
           "load_model", "parity_plot", "predict", "MetricsLogger",
           "RxnGraphTrainer", "TrainState", "make_optimizer", "set_epoch_lr", "sse_loss"]

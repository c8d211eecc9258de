"""Training/evaluation engine: loss assembly, optimizer regimes, steps,
metrics, checkpointing, epoch loop."""

from .multiscale import LEVEL_WEIGHTS, multiscale_loss
from .optim import make_optimizer, lr_for_epoch
from .state import TrainState, create_train_state
from .step import make_train_step, make_eval_step
from .metrics import full_res_metrics, decode_occ, fl_all, occ_f1
from .checkpoint import (save_checkpoint, latest_checkpoint,
                         load_model_checkpoint, load_train_checkpoint,
                         load_or_convert)
from .loop import run, train_epoch, eval_epoch, build_model, build_loaders

__all__ = [
    "LEVEL_WEIGHTS", "multiscale_loss",
    "make_optimizer", "lr_for_epoch",
    "TrainState", "create_train_state",
    "make_train_step", "make_eval_step",
    "full_res_metrics", "decode_occ", "fl_all", "occ_f1",
    "save_checkpoint", "latest_checkpoint", "load_model_checkpoint",
    "load_train_checkpoint", "load_or_convert",
    "run", "train_epoch", "eval_epoch", "build_model", "build_loaders",
]

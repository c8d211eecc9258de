"""Training/evaluation engine: loss assembly, optimizer regimes, steps,
metrics, checkpointing, epoch loop."""

from .multiscale import LEVEL_WEIGHTS, multiscale_loss
from .optim import make_optimizer, lr_for_epoch
from .state import TrainState, create_train_state
from .step import make_train_step, make_eval_step
from .metrics import full_res_metrics, decode_occ

__all__ = [
    "LEVEL_WEIGHTS", "multiscale_loss",
    "make_optimizer", "lr_for_epoch",
    "TrainState", "create_train_state",
    "make_train_step", "make_eval_step",
    "full_res_metrics", "decode_occ",
]

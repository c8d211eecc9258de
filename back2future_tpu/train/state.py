"""Train state container."""

from __future__ import annotations

from typing import Any

import jax
from flax import struct

from .optim import make_optimizer


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jax.Array        # global step counter
    epoch: int = struct.field(pytree_node=False, default=1)

    def with_epoch(self, epoch: int, opt) -> "TrainState":
        """Enter a new epoch regime. Mirrors the reference's per-epoch
        optimState rebuild (train.lua:112-121): fresh optimizer state each
        epoch (Adam moments reset) unless disabled."""
        new = self.replace(epoch=epoch)
        tx = make_optimizer(opt, epoch)
        if getattr(opt, "adam_reset_per_epoch", True):
            new = new.replace(opt_state=tx.init(self.params))
        return new


def create_train_state(params, opt, epoch: int = 1) -> TrainState:
    import jax.numpy as jnp
    tx = make_optimizer(opt, epoch)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32), epoch=epoch)

"""Jitted train/eval steps with data-parallel sharding.

The step functions are ordinary jitted computations; data parallelism
comes from consuming batch arrays sharded over the mesh's 'data' axis with
replicated params — XLA's SPMD partitioner inserts the gradient all-reduce
over ICI (the functional equivalent of DataParallelTable+syncParameters,
util.lua:27-48, train.lua:493-496).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict

import jax

from .multiscale import multiscale_loss
from .metrics import full_res_metrics
from .optim import make_optimizer
from .state import TrainState


def make_train_step(model, opt, crits, donate: bool = True) -> Callable:
    """Build a jitted train_step(state, batch) -> (state, logs).

    The optimizer transformation is rebuilt per epoch on the host
    (regime LR changes); the returned callable is cached per-epoch LR via
    the `lr` static argument closure.
    """

    def apply_fn(params, images):
        return model.apply({"params": params}, images)

    if getattr(opt, "remat", 0):
        # Recompute the forward during the backward instead of holding the
        # full activation pyramid in HBM (-remat 1). nothing_saveable is
        # the max-memory-saving policy; the forward is ~1/3 of step FLOPs
        # so the time cost is bounded by ~+33%.
        apply_fn = jax.checkpoint(
            apply_fn, policy=jax.checkpoint_policies.nothing_saveable)

    def loss_fn(params, batch):
        outputs = apply_fn(params, batch["images"])
        loss, comps = multiscale_loss(outputs, batch, opt, crits)
        return loss, (comps, outputs)

    @functools.lru_cache(maxsize=8)
    def step_for_lr(lr: float):
        tx = make_optimizer(opt, epoch=1, lr_override=lr)

        def train_step(state: TrainState, batch: Dict[str, Any]):
            # compact-wire batches arrive u8/f16; the decode (+ deferred
            # ImageNet normalization) happens here inside the jit, where
            # XLA fuses it into the first consumers (data/wire.py)
            from ..data.wire import decode_batch
            batch = decode_batch(batch)
            (loss, (comps, outputs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch)
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            import optax
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=new_params,
                                      opt_state=new_opt_state,
                                      step=state.step + 1)
            logs = {"loss": loss, **comps}
            if opt.ground_truth and "flow_gt" in batch:
                g0 = outputs[0]
                logs.update(full_res_metrics(
                    g0["flow"], g0.get("occ") if (opt.frames > 2 and not opt.no_occ) else None,
                    batch, opt.flownet_factor, opt.sizeAverage))
            return new_state, logs

        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    def step(state: TrainState, batch):
        # cache the compiled step by LR: the regime only changes LR every
        # 200 epochs (train.lua:66-92), so epochs within a regime reuse
        # one executable instead of recompiling per epoch
        from .optim import lr_for_epoch
        return step_for_lr(lr_for_epoch(state.epoch, opt.LR))(state, batch)

    # expose the underlying jitted fn for AOT inspection (lower/compile
    # memory analysis in tests and tools)
    step.step_for_lr = step_for_lr
    return step


def make_eval_step(model, opt, crits) -> Callable:
    """Jitted eval step: forward + losses + metrics, no backward
    (test.lua:101-312)."""

    @jax.jit
    def eval_step(params, batch):
        from ..data.wire import decode_batch
        batch = decode_batch(batch)
        outputs = model.apply({"params": params}, batch["images"])
        loss, comps = multiscale_loss(outputs, batch, opt, crits)
        logs = {"loss": loss, **comps}
        if opt.ground_truth and "flow_gt" in batch:
            g0 = outputs[0]
            logs.update(full_res_metrics(
                g0["flow"], g0.get("occ") if (opt.frames > 2 and not opt.no_occ) else None,
                batch, opt.flownet_factor, opt.sizeAverage))
        return logs

    return eval_step

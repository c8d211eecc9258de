"""Optimizer and learning-rate regimes (train.lua:27-121; opts.lua:75-79).

Default recipe: Adam, LR 1e-4 halved at epochs 201/401/601/801 (5 regimes
to epoch 1000). Reference quirk replicated behind a flag: `paramsForEpoch`
returns newRegime=True for EVERY epoch (`epoch >= row[1]`, train.lua:89),
so the reference rebuilds optimState — resetting Adam moments — at every
epoch boundary. `adam_reset_per_epoch=True` (default) reproduces that;
set False for the (almost certainly intended) persistent-moment behavior.
"""

from __future__ import annotations


import optax


def lr_for_epoch(epoch: int, base_lr: float = 0.0) -> float:
    """LR for a 1-indexed epoch (train.lua:66-92)."""
    lr = base_lr if base_lr > 0 else 1e-4
    for i, (start, end) in enumerate([(1, 200), (201, 400), (401, 600),
                                      (601, 800), (801, 1000)]):
        if start <= epoch <= end:
            return lr / (2 ** i)
    return lr / 16  # beyond epoch 1000: keep the final regime


def make_optimizer(opt, epoch: int,
                   lr_override: float = 0.0) -> optax.GradientTransformation:
    """Build the optimizer for one epoch's regime (or a pinned LR)."""
    lr = lr_override if lr_override > 0 else lr_for_epoch(epoch, opt.LR)
    wd = opt.weightDecay
    clip = getattr(opt, "grad_clip", 0.0)
    # chain order mirrors torch: weightDecay is added to the raw gradient
    # first (L2, not decoupled), then the (optional, TPU-native) global-
    # norm clip bounds the effective gradient, then the update rule
    chain = []
    if wd > 0:
        chain.append(optax.add_decayed_weights(wd))
    if clip > 0:
        chain.append(optax.clip_by_global_norm(clip))
    if opt.optimizer == "adam":
        # torch optim.adam defaults: beta1=0.9, beta2=0.999, eps=1e-8
        chain.append(optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8))
    elif opt.optimizer == "sgd":
        # torch optim.sgd: momentum with dampening=0
        chain.append(optax.sgd(lr, momentum=opt.momentum))
    else:
        raise ValueError(f"unknown optimizer {opt.optimizer!r}")
    return chain[0] if len(chain) == 1 else optax.chain(*chain)

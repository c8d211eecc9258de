"""Supervised endpoint-error criterion (criterions/L2Criterion.lua).

Masked average EPE; also returns the per-pixel EPE map for the occluded /
non-occluded metric breakdown (train.lua:337-375). The backward replicates
the reference's eps-stabilized denominator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-12


def epe_map(flow, target_flow, mask):
    """Per-pixel masked endpoint error (B,H,W)."""
    diff = flow - target_flow
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1)) * mask


@functools.lru_cache(maxsize=None)
def make_l2_criterion(size_average: bool = True, reference_grads: bool = True):
    """Returns fn(flow, target_flow, mask) -> (loss, epe_map).

    mask is (B,H,W) (or (B,H,W,1)); npixels = mask.sum().
    """

    def forward(flow, target_flow, mask):
        mask = mask.reshape(mask.shape[:3])
        m = epe_map(flow, target_flow, mask)
        out = jnp.sum(m)
        if size_average:
            out = out / jnp.sum(mask)
        return out, m

    if not reference_grads:
        return forward

    @jax.custom_vjp
    def l2(flow, target_flow, mask):
        return forward(flow, target_flow, mask)

    def fwd(flow, target_flow, mask):
        return forward(flow, target_flow, mask), (flow, target_flow, mask)

    def bwd(res, cotangents):
        g, _g_map = cotangents  # gradient through the epe_map output is dropped
        flow, target_flow, mask = res
        mask3 = mask.reshape(mask.shape[:3])
        diff = flow - target_flow
        denom = jnp.sqrt(jnp.sum(diff * diff, axis=-1) * mask3) + _EPS
        d = diff / denom[..., None] * mask3[..., None]
        if size_average:
            d = d / jnp.sum(mask3)
        return (d * g, jnp.zeros_like(target_flow), jnp.zeros_like(mask))

    l2.defvjp(fwd, bwd)
    return l2

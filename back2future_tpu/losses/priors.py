"""Occlusion prior and constant-velocity criterions.

Both carry reference backward passes that deviate from true gradients:

  * OcclusionPrior's hand-written gradient is a deliberate pseudo-gradient —
    (1-o2, 1-o1) where the analytic gradient of 1 - o1*o2 is (-o2, -o1)
    (criterions/OcclusionPriorCriterion.lua:59-66).
  * ConstVel normalizes the forward by nElement (= B*2*H*W) but the backward
    by npixels (= B*H*W) — a factor-2 inconsistency — and stabilizes the EPE
    denominator with eps=1e-12 (criterions/ConstVelCriterion.lua:33,56-60).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-12


@functools.lru_cache(maxsize=None)
def make_occ_prior(size_average: bool = True, penalty: float = 1.0,
                   reference_grads: bool = True):
    def forward(occ, target):
        c = occ.shape[-1]
        norm = c / occ.size
        if c == 3:
            val = (1.0 - occ[..., 1]) * (occ[..., 0] + occ[..., 2]) * penalty * 0.05
        else:
            val = (1.0 - occ[..., 0] * occ[..., 1]) * penalty
        out = jnp.sum(val)
        return norm * out if size_average else out

    if not reference_grads:
        return forward

    @jax.custom_vjp
    def occ_prior(occ, target):
        return forward(occ, target)

    def fwd(occ, target):
        return forward(occ, target), (occ, target)

    def bwd(res, g):
        occ, target = res
        c = occ.shape[-1]
        norm = (c / occ.size) if size_average else 1.0
        if c == 3:
            d = jnp.stack([
                (1.0 - occ[..., 1]) * penalty * 0.05,
                -(occ[..., 0] + occ[..., 2]) * penalty * 0.05,
                (1.0 - occ[..., 1]) * penalty * 0.05,
            ], axis=-1)
        else:
            # pseudo-gradient: (1-o2, 1-o1) instead of (-o2, -o1)
            d = jnp.stack([
                (1.0 - occ[..., 1]) * penalty,
                (1.0 - occ[..., 0]) * penalty,
            ], axis=-1)
        return (d * norm * g, jnp.zeros_like(target))

    occ_prior.defvjp(fwd, bwd)
    return occ_prior


@functools.lru_cache(maxsize=None)
def make_const_vel(size_average: bool = True, reference_grads: bool = True):
    def forward(flow_a, flow_b):
        diff = flow_a - flow_b
        epe = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        out = jnp.sum(epe)
        return out / flow_a.size if size_average else out

    if not reference_grads:
        return forward

    @jax.custom_vjp
    def const_vel(flow_a, flow_b):
        return forward(flow_a, flow_b)

    def fwd(flow_a, flow_b):
        return forward(flow_a, flow_b), (flow_a, flow_b)

    def bwd(res, g):
        flow_a, flow_b = res
        diff = flow_a - flow_b
        denom = (jnp.sqrt(jnp.sum(diff * diff, axis=-1)) + _EPS)[..., None]
        # backward normalizes by npixels, not nElement (reference factor-2
        # inconsistency; ConstVelCriterion.lua:56,69-70)
        npix = flow_a.size / flow_a.shape[-1]
        d = diff / denom
        if size_average:
            d = d / npix
        return (d * g, -d * g)

    const_vel.defvjp(fwd, bwd)
    return const_vel

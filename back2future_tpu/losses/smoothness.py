"""Smoothness criterions: contrast-sensitive 1st/2nd order + KL divergence.

First- and second-order smoothness have autodiff-consistent reference
backwards (the contrast weights depend only on the target, which receives
no gradient), so they are plain differentiable functions. The KL criterion's
reference backward applies analytic formulas on eps-clamped values without
zeroing clamped entries, so it gets a custom VJP.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .common import fwd_diff_x, fwd_diff_y
from .penalty import make_penalty

_CS = 20.0  # contrast sensitivity (SmoothnessCriterion.lua:25)


@dataclasses.dataclass(frozen=True)
class SmoothConfig:
    penalty: str = "Quadratic"
    size_average: bool = True
    second_order: bool = False
    reference_grads: bool = True


def smoothness(flow, target, cfg: SmoothConfig):
    """First-order contrast-sensitive smoothness
    (criterions/SmoothnessCriterion.lua:28-73)."""
    p = make_penalty(cfg.penalty)
    gy = fwd_diff_y(flow)
    gx = fwd_diff_x(flow)
    igy = fwd_diff_y(target)
    igx = fwd_diff_x(target)
    wy = jnp.exp(-_CS * jnp.mean(jnp.abs(igy), axis=-1, keepdims=True))
    wx = jnp.exp(-_CS * jnp.mean(jnp.abs(igx), axis=-1, keepdims=True))
    wy = jax.lax.stop_gradient(wy)
    wx = jax.lax.stop_gradient(wx)
    buf = jnp.sum(p.apply(gx) * wx + p.apply(gy) * wy)
    if cfg.size_average:
        buf = buf / flow.size
    return buf


def second_order_smoothness(flow, target, cfg: SmoothConfig):
    """Second-order variant on 2u_i - u_{i-1} - u_{i+1} with two-sided
    image-gradient weights (criterions/SecondOrderSmoothnessCriterion.lua)."""
    p = make_penalty(cfg.penalty)
    h, w = flow.shape[1], flow.shape[2]

    gy = 2 * flow[:, 1:-1] - flow[:, :-2] - flow[:, 2:]
    gy = jnp.pad(gy, ((0, 0), (1, 1), (0, 0), (0, 0)))
    gx = 2 * flow[:, :, 1:-1] - flow[:, :, :-2] - flow[:, :, 2:]
    gx = jnp.pad(gx, ((0, 0), (0, 0), (1, 1), (0, 0)))

    # two-sided accumulated target gradients (SecondOrder...lua:49-56):
    # igy[1:] += mean|t[1:]-t[:-1]|; igy[1:-1] += mean|t[1:-1]-t[2:]|
    def weights(t, axis):
        diff1 = jnp.mean(jnp.abs(jnp.diff(t, axis=axis)), axis=-1, keepdims=True)
        ig = jnp.zeros(t.shape[:3] + (1,), t.dtype)
        if axis == 1:
            ig = ig.at[:, 1:].add(diff1)
            back = jnp.mean(jnp.abs(t[:, 1:-1] - t[:, 2:]), axis=-1, keepdims=True)
            ig = ig.at[:, 1:-1].add(back)
        else:
            ig = ig.at[:, :, 1:].add(diff1)
            back = jnp.mean(jnp.abs(t[:, :, 1:-1] - t[:, :, 2:]), axis=-1, keepdims=True)
            ig = ig.at[:, :, 1:-1].add(back)
        return jax.lax.stop_gradient(jnp.exp(-_CS * ig))

    wy = weights(target, axis=1)
    wx = weights(target, axis=2)
    buf = jnp.sum(p.apply(gx) * wx + p.apply(gy) * wy)
    if cfg.size_average:
        buf = buf / flow.size
    return buf


def make_flow_smoothness(cfg: SmoothConfig):
    fn = second_order_smoothness if cfg.second_order else smoothness
    return functools.partial(fn, cfg=cfg)


# --------------------------------------------------------------------------
# KL divergence between neighboring occlusion pixels
# (criterions/KLDivergenceCriterion.lua)
# --------------------------------------------------------------------------

_KL_EPS = 5e-2


@functools.lru_cache(maxsize=None)
def make_kl_smoothness(size_average: bool = True, reference_grads: bool = True):
    def _padded(occ):
        """Replication-pad by 1 and clamp below at eps
        (KLDivergenceCriterion.lua:36-40)."""
        pp = jnp.pad(occ, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        return jnp.maximum(pp, _KL_EPS)

    def _weights(target, shape):
        igy = fwd_diff_y(target)
        igx = fwd_diff_x(target)
        wy = jnp.exp(-_CS * jnp.mean(jnp.abs(igy), axis=-1, keepdims=True))
        wx = jnp.exp(-_CS * jnp.mean(jnp.abs(igx), axis=-1, keepdims=True))
        return jax.lax.stop_gradient(wy), jax.lax.stop_gradient(wx)

    def forward(occ, target):
        b, h, w, c = occ.shape
        nz = _padded(occ)
        lg = jnp.log(nz)
        pc = nz[:, 1:1 + h, 1:1 + w]
        lc = lg[:, 1:1 + h, 1:1 + w]
        pd = nz[:, 2:2 + h, 1:1 + w]   # down neighbor
        ld = lg[:, 2:2 + h, 1:1 + w]
        pr = nz[:, 1:1 + h, 2:2 + w]   # right neighbor
        lr = lg[:, 1:1 + h, 2:2 + w]
        gy = (lc - ld) * pc + (ld - lc) * pd
        gx = (lc - lr) * pc + (lr - lc) * pr
        wy, wx = _weights(target, occ.shape)
        buf = jnp.sum(gx * wx + gy * wy)
        norm = c / occ.size
        return norm * buf if size_average else buf

    if not reference_grads:
        return forward

    @jax.custom_vjp
    def kl(occ, target):
        return forward(occ, target)

    def fwd(occ, target):
        return forward(occ, target), (occ, target)

    def bwd(res, g):
        occ, target = res
        b, h, w, c = occ.shape
        nz = _padded(occ)
        lg = jnp.log(nz)
        pc = nz[:, 1:1 + h, 1:1 + w]
        lc = lg[:, 1:1 + h, 1:1 + w]
        pd = nz[:, 2:2 + h, 1:1 + w]
        ld = lg[:, 2:2 + h, 1:1 + w]
        pr = nz[:, 1:1 + h, 2:2 + w]
        lr = lg[:, 1:1 + h, 2:2 + w]
        pu = nz[:, 0:h, 1:1 + w]       # up neighbor
        lu = lg[:, 0:h, 1:1 + w]
        pl = nz[:, 1:1 + h, 0:w]       # left neighbor
        ll = lg[:, 1:1 + h, 0:w]
        wy, wx = _weights(target, occ.shape)

        # reference analytic formulas on clamped values
        # (KLDivergenceCriterion.lua:84-103)
        gy = (lc - ld + 1.0 - pd / pc) * wy
        tmp = -pu / pc + lc - lu + 1.0
        tmp = tmp.at[:, 1:].mul(wy[:, :-1])
        gy = gy + tmp
        gx = (lc - lr + 1.0 - pr / pc) * wx
        tmp = -pl / pc + lc - ll + 1.0
        tmp = tmp.at[:, :, 1:].mul(wx[:, :, :-1])
        gx = gx + tmp

        norm = (c / occ.size) if size_average else 1.0
        return ((gx + gy) * norm * g, jnp.zeros_like(target))

    kl.defvjp(fwd, bwd)
    return kl

"""Photometric (brightness/gradient constancy) criterions.

Faithful rebuilds of the reference loss family, each as a scalar-valued
function of the level-output group. Where the reference's hand-written
backward deviates from the true gradient, a custom VJP replicates it under
`reference_grads=True` (the default for training parity):

  * OBCC/OBGCC/OSSIM: the occlusion gradient additionally receives the
    constant out-of-image penalty term (e.g. OBCCriterion.lua:180-190),
    which is absent from the analytic gradient.
  * OBGCC: the occlusion-gradient buffer applies image-gradient transpose
    structure (signs/shifts) that the analytic occlusion gradient does not
    have (OBGCCriterion.lua:215-219); the brightness term enters the forward
    WITHOUT the alpha weight but the backward WITH it (OBGCCriterion.lua:97
    vs :202); and the per-frame image-gradient buffers ACCUMULATE across
    frames without re-zeroing (OBGCCriterion.lua:91-92,194-195).
  * SSIM variants: the backward uses a center-gaussian-weight approximation
    of the SSIM derivative and omits the 1/(mx-mn) normalization chain
    (MSSIML1Criterion.lua:218-224).
  * No criterion sends gradient to the flow inputs; flow only matters
    through the (non-differentiable) out-of-image masks. Gradient reaches
    flow through the model's warp ops instead.

Group layout (NHWC): flow (B,H,W,2); flow_past (B,H,W,2) or None; occ
(B,H,W,2) with channel 0 = "visible or past occluded" (torch channel 1) and
channel 1 = "visible or future occluded" (torch channel 2); warped = tuple
of F-1 images (B,H,W,C) in frame order; target = reference frame (B,H,W,C).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .common import (coord_grid, depthwise_gauss3, fwd_diff_x, fwd_diff_y,
                     gaussian3_center_weight, in_image_mask)
from .penalty import make_penalty

# occ channel used to weight a frame: past frames -> torch ch2 (ours 1),
# future frames -> torch ch1 (ours 0)  (OBCCriterion.lua:86-92)
_OCC_PAST, _OCC_FUTURE = 1, 0


@dataclasses.dataclass(frozen=True)
class PhotoConfig:
    frames: int = 3
    penalty: str = "Quadratic"
    size_average: bool = True
    past_flow: bool = False
    penalty_out: float = 1.0
    alpha: float = 1.0   # OBGCC brightness / SSIM mix weight
    beta: float = 1.0    # OBGCC x-gradient weight
    gamma: float = 1.0   # OBGCC y-gradient weight
    reference_grads: bool = True


def _frame_flow_k(cfg, f: int, flow, flow_past, scale):
    """Per-frame displacement field k*flow*scale for the out-of-image test
    (OBCCriterion.lua:79-89; MBCCriterion.lua:70-81 for F=2)."""
    ref = 0.5 * (cfg.frames - 1)
    if cfg.frames == 2:
        return flow * scale
    if f <= ref:
        fl = flow_past if (cfg.past_flow and flow_past is not None) else flow
        return (f - ref - 1) * fl * scale
    return (f - ref) * flow * scale


def _masks(cfg, flow, flow_past, scale, h, w):
    """Per-frame out-of-image masks (B,H,W), frame index 1..F-1."""
    b = flow.shape[0]
    coord = coord_grid(b, h, w, flow.dtype)
    out = {}
    for f in range(1, cfg.frames):
        t = coord + _frame_flow_k(cfg, f, flow, flow_past, scale)
        out[f] = jax.lax.stop_gradient(in_image_mask(t, h, w))
    return out


def _norms(cfg, target):
    b, h, w, c = target.shape
    inner = 1.0 / (c * (cfg.frames - 1))
    size_norm = (1.0 / (b * h * w)) if cfg.size_average else 1.0
    return inner, size_norm




def _occ_w(occ, f, ref):
    """Occlusion weight channel for warped frame f, or 1.0 when the model
    has no occlusion head (frames==2 / no_occ): the occlusion-aware
    criterions then degrade to their unmasked (MBCC-style) behavior —
    the reference would index a missing output and error
    (OBCCriterion.lua:65)."""
    if occ is None:
        return None
    return occ[..., _OCC_PAST if f <= ref else _OCC_FUTURE]


# --------------------------------------------------------------------------
# OBCC — occlusion-aware brightness constancy (criterions/OBCCriterion.lua)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def make_obcc(cfg: PhotoConfig, scale: float):
    p = make_penalty(cfg.penalty)
    ref = 0.5 * (cfg.frames - 1)

    def forward(flow, flow_past, occ, warped, target):
        b, h, w, c = target.shape
        inner, size_norm = _norms(cfg, target)
        masks = _masks(cfg, flow, flow_past, scale, h, w)
        acc = 0.0
        for f in range(1, cfg.frames):
            img = warped[f - 1]
            photo = jnp.sum(p.apply(img - target), axis=-1)
            ow = _occ_w(occ, f, ref)
            m = masks[f]
            masked = photo * m if ow is None else photo * ow * m
            acc = acc + masked + (1.0 - m) * cfg.penalty_out
        return jnp.sum(acc) * inner * size_norm

    if not cfg.reference_grads:
        return forward

    @jax.custom_vjp
    def obcc(flow, flow_past, occ, warped, target):
        return forward(flow, flow_past, occ, warped, target)

    def fwd(flow, flow_past, occ, warped, target):
        return forward(flow, flow_past, occ, warped, target), \
            (flow, flow_past, occ, warped, target)

    def bwd(res, g):
        flow, flow_past, occ, warped, target = res
        b, h, w, c = target.shape
        inner, size_norm = _norms(cfg, target)
        masks = _masks(cfg, flow, flow_past, scale, h, w)
        scale_all = g * inner * size_norm

        d_occ = None if occ is None else jnp.zeros_like(occ)
        d_warped = []
        for f in range(1, cfg.frames):
            img = warped[f - 1]
            ch = _OCC_PAST if f <= ref else _OCC_FUTURE
            m = masks[f]
            if occ is not None:
                photo = jnp.sum(p.apply(img - target), axis=-1)
                # occ grad includes the out-of-image penalty constant
                # (OBCCriterion.lua:180-190) — reference quirk
                occ_g = photo * m + (1.0 - m) * cfg.penalty_out
                d_occ = d_occ.at[..., ch].add(occ_g * scale_all)
            gi = p.der(img - target) * m[..., None]
            if occ is not None:
                gi = gi * occ[..., ch][..., None]
            d_warped.append(gi * scale_all)

        zeros = lambda a: None if a is None else jnp.zeros_like(a)
        return (jnp.zeros_like(flow), zeros(flow_past), d_occ,
                tuple(d_warped), jnp.zeros_like(target))

    obcc.defvjp(fwd, bwd)
    return obcc


# --------------------------------------------------------------------------
# OBGCC — brightness + gradient constancy (criterions/OBGCCriterion.lua)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def make_obgcc(cfg: PhotoConfig, scale: float):
    p = make_penalty(cfg.penalty)
    ref = 0.5 * (cfg.frames - 1)

    def _terms(warped, target):
        """Per-frame (diff, buffer_gx, buffer_gy) with the reference's
        cross-frame gradient-buffer accumulation (OBGCCriterion.lua:91-92)."""
        tgt_gx, tgt_gy = fwd_diff_x(target), fwd_diff_y(target)
        acc_gx = jnp.zeros_like(target)
        acc_gy = jnp.zeros_like(target)
        out = []
        for f in range(1, cfg.frames):
            img = warped[f - 1]
            acc_gx = acc_gx + fwd_diff_x(img)
            acc_gy = acc_gy + fwd_diff_y(img)
            out.append((img - target, acc_gx - tgt_gx, acc_gy - tgt_gy))
        return out

    def forward(flow, flow_past, occ, warped, target):
        b, h, w, c = target.shape
        inner, size_norm = _norms(cfg, target)
        masks = _masks(cfg, flow, flow_past, scale, h, w)
        acc = 0.0
        for f, (diff, bgx, bgy) in enumerate(_terms(warped, target), start=1):
            # NOTE: no alpha on the brightness term in the reference forward
            # (OBGCCriterion.lua:96-105)
            tmp = (jnp.sum(p.apply(diff), axis=-1)
                   + cfg.beta * jnp.sum(p.apply(bgx), axis=-1)
                   + cfg.gamma * jnp.sum(p.apply(bgy), axis=-1))
            ow = _occ_w(occ, f, ref)
            m = masks[f]
            masked = tmp * m if ow is None else tmp * ow * m
            acc = acc + masked + (1.0 - m) * cfg.penalty_out
        return jnp.sum(acc) * inner * size_norm

    if not cfg.reference_grads:
        return forward

    @jax.custom_vjp
    def obgcc(flow, flow_past, occ, warped, target):
        return forward(flow, flow_past, occ, warped, target)

    def fwd(flow, flow_past, occ, warped, target):
        return forward(flow, flow_past, occ, warped, target), \
            (flow, flow_past, occ, warped, target)

    def bwd(res, g):
        flow, flow_past, occ, warped, target = res
        b, h, w, c = target.shape
        inner, size_norm = _norms(cfg, target)
        masks = _masks(cfg, flow, flow_past, scale, h, w)
        scale_all = g * inner * size_norm

        d_occ = None if occ is None else jnp.zeros_like(occ)
        d_warped = []
        for f, (diff, bgx, bgy) in enumerate(_terms(warped, target), start=1):
            ch = _OCC_PAST if f <= ref else _OCC_FUTURE
            m = masks[f]
            # image gradient (OBGCCriterion.lua:200-212)
            dgy = p.der(bgy) * cfg.gamma
            dgx = p.der(bgx) * cfg.beta
            gi = cfg.alpha * p.der(diff) - dgy - dgx
            gi = gi.at[:, 1:].add(dgy[:, :-1])
            gi = gi.at[:, :, 1:].add(dgx[:, :, :-1])
            gi = gi * m[..., None]
            if occ is not None:
                gi = gi * occ[..., ch][..., None]
            d_warped.append(gi * scale_all)

            # occlusion gradient with image-gradient transpose structure and
            # out-penalty (OBGCCriterion.lua:215-219,239-250) — reference quirk
            sgy = jnp.sum(p.apply(bgy), axis=-1) * cfg.gamma
            sgx = jnp.sum(p.apply(bgx), axis=-1) * cfg.beta
            ob = cfg.alpha * jnp.sum(p.apply(diff), axis=-1) - sgy - sgx
            ob = ob.at[:, 1:].add(sgy[:, :-1])
            ob = ob.at[:, :, 1:].add(sgx[:, :, :-1])
            ob = ob * m + (1.0 - m) * cfg.penalty_out
            if occ is not None:
                d_occ = d_occ.at[..., ch].add(ob * scale_all)

        zeros = lambda a: None if a is None else jnp.zeros_like(a)
        return (jnp.zeros_like(flow), zeros(flow_past), d_occ,
                tuple(d_warped), jnp.zeros_like(target))

    obgcc.defvjp(fwd, bwd)
    return obgcc


# --------------------------------------------------------------------------
# MBCC — brightness constancy without occlusion masking
# (criterions/MBCCriterion.lua)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def make_mbcc(cfg: PhotoConfig, scale: float):
    p = make_penalty(cfg.penalty)

    def forward(flow, flow_past, occ, warped, target):
        b, h, w, c = target.shape
        inner, size_norm = _norms(cfg, target)
        masks = _masks(cfg, flow, flow_past, scale, h, w)
        acc = 0.0
        for f in range(1, cfg.frames):
            img = warped[f - 1]
            photo = jnp.sum(p.apply(img - target), axis=-1)
            acc = acc + photo * masks[f]
        return jnp.sum(acc) * inner * size_norm

    if not cfg.reference_grads:
        return forward

    @jax.custom_vjp
    def mbcc(flow, flow_past, occ, warped, target):
        return forward(flow, flow_past, occ, warped, target)

    def fwd(flow, flow_past, occ, warped, target):
        return forward(flow, flow_past, occ, warped, target), \
            (flow, flow_past, occ, warped, target)

    def bwd(res, g):
        flow, flow_past, occ, warped, target = res
        inner, size_norm = _norms(cfg, target)
        h, w = target.shape[1], target.shape[2]
        masks = _masks(cfg, flow, flow_past, scale, h, w)
        d_warped = tuple(
            p.der(warped[f - 1] - target) * masks[f][..., None] * g * inner * size_norm
            for f in range(1, cfg.frames))
        zeros = lambda a: None if a is None else jnp.zeros_like(a)
        return (jnp.zeros_like(flow), zeros(flow_past), zeros(occ),
                d_warped, jnp.zeros_like(target))

    mbcc.defvjp(fwd, bwd)
    return mbcc


# --------------------------------------------------------------------------
# SSIM family (criterions/MSSIML1Criterion.lua, OSSIML1Criterion.lua)
# --------------------------------------------------------------------------

_C1 = 0.01 ** 2  # (0.01 L)^2 with L=1
_C2 = 0.03 ** 2


def _minmax(*arrays):
    mx = arrays[0].max()
    mn = arrays[0].min()
    for a in arrays[1:]:
        mx = jnp.maximum(mx, a.max())
        mn = jnp.minimum(mn, a.min())
    return jax.lax.stop_gradient(mn), jax.lax.stop_gradient(mx)


def _ssim_terms(img_n, target_n, mu_y, sigma_y):
    mu_x = depthwise_gauss3(img_n)
    sigma_x = depthwise_gauss3(img_n * img_n) - mu_x * mu_x
    sigma_xy = depthwise_gauss3(img_n * target_n) - mu_x * mu_y
    ssim_l = (2 * mu_x * mu_y + _C1) / (mu_x * mu_x + mu_y * mu_y + _C1)
    ssim_cs = (2 * sigma_xy + _C2) / (sigma_x + sigma_y + _C2)
    return mu_x, sigma_x, ssim_l, ssim_cs


def _make_ssim(cfg: PhotoConfig, scale: float, occlusion_aware: bool):
    # SSIM variants default to L1 (their ctor, MSSIML1Criterion.lua:28), but
    # model.lua:189-193 swaps in L1/Lorentzian when -pme_penalty names one;
    # any other value (e.g. the 'Quadratic' default) keeps the L1 default.
    p = make_penalty(cfg.penalty if cfg.penalty in ("L1", "Lorentzian") else "L1")
    ref = 0.5 * (cfg.frames - 1)
    gw = gaussian3_center_weight()

    def _normalization(flow_past, occ, warped, target):
        # MSSIM: min/max over target + every input AFTER the future flow —
        # the past flow (input[2] when past_flow), occ, and the warped
        # frames (MSSIML1Criterion.lua:62-68 loops i=2..#input); OSSIM:
        # target + warped images only (OSSIML1Criterion.lua:61-67 loops
        # from warp_start)
        if occlusion_aware:
            return _minmax(target, *warped)
        extra = ()
        if cfg.past_flow and flow_past is not None:
            extra += (flow_past,)
        if occ is not None and cfg.frames > 2:
            extra += (occ,)
        return _minmax(target, *extra, *warped)

    def forward(flow, flow_past, occ, warped, target):
        b, h, w, c = target.shape
        inner, size_norm = _norms(cfg, target)
        masks = _masks(cfg, flow, flow_past, scale, h, w)
        mn, mx = _normalization(flow_past, occ, warped, target)
        rng = mx - mn
        target_n = (target - mn) / rng
        mu_y = depthwise_gauss3(target_n)
        sigma_y = depthwise_gauss3(target_n * target_n) - mu_y * mu_y
        acc = 0.0
        for f in range(1, cfg.frames):
            img_n = (warped[f - 1] - mn) / rng
            _, _, ssim_l, ssim_cs = _ssim_terms(img_n, target_n, mu_y, sigma_y)
            tmp = (cfg.alpha * jnp.sum(1.0 - ssim_l * ssim_cs, axis=-1)
                   + (1 - cfg.alpha) * jnp.sum(p.apply(img_n - target_n), axis=-1))
            m = masks[f]
            if occlusion_aware:
                ow = _occ_w(occ, f, ref)
                tmp = (tmp * m if ow is None else tmp * ow * m) \
                    + (1.0 - m) * cfg.penalty_out
            else:
                tmp = tmp * m
            acc = acc + tmp
        return jnp.sum(acc) * inner * size_norm

    if not cfg.reference_grads:
        return forward

    @jax.custom_vjp
    def crit(flow, flow_past, occ, warped, target):
        return forward(flow, flow_past, occ, warped, target)

    def fwd(flow, flow_past, occ, warped, target):
        return forward(flow, flow_past, occ, warped, target), \
            (flow, flow_past, occ, warped, target)

    def bwd(res, g):
        flow, flow_past, occ, warped, target = res
        b, h, w, c = target.shape
        inner, size_norm = _norms(cfg, target)
        masks = _masks(cfg, flow, flow_past, scale, h, w)
        mn, mx = _normalization(flow_past, occ, warped, target)
        rng = mx - mn
        target_n = (target - mn) / rng
        mu_y = depthwise_gauss3(target_n)
        sigma_y = depthwise_gauss3(target_n * target_n) - mu_y * mu_y
        scale_all = g * inner * size_norm

        d_occ = jnp.zeros_like(occ) if occ is not None else None
        d_warped = []
        for f in range(1, cfg.frames):
            img_n = (warped[f - 1] - mn) / rng
            mu_x, sigma_x, ssim_l, ssim_cs = _ssim_terms(img_n, target_n, mu_y, sigma_y)
            # center-weight derivative approximation
            # (MSSIML1Criterion.lua:216-224)
            d_l = 2 * gw * (mu_y - mu_x * ssim_l) / (mu_x * mu_x + mu_y * mu_y + _C1)
            d_cs = 2 * gw * ((target_n - mu_y) - ssim_cs * (img_n - mu_x)) \
                / (sigma_x + sigma_y + _C2)
            gi = (-cfg.alpha * (d_l * ssim_cs + ssim_l * d_cs)
                  + (1 - cfg.alpha) * p.der(img_n - target_n))
            m = masks[f]
            gi = gi * m[..., None]
            if occlusion_aware:
                ch = _OCC_PAST if f <= ref else _OCC_FUTURE
                per_pix = (cfg.alpha * jnp.sum(1.0 - ssim_l * ssim_cs, axis=-1)
                           + (1 - cfg.alpha) * jnp.sum(p.apply(img_n - target_n), axis=-1))
                ob = per_pix * m + (1.0 - m) * cfg.penalty_out
                d_occ = d_occ.at[..., ch].add(ob * scale_all)
                gi = gi * occ[..., ch][..., None]
            d_warped.append(gi * scale_all)

        zeros = lambda a: None if a is None else jnp.zeros_like(a)
        return (jnp.zeros_like(flow), zeros(flow_past),
                d_occ if d_occ is not None else None,
                tuple(d_warped), jnp.zeros_like(target))

    crit.defvjp(fwd, bwd)
    return crit


@functools.lru_cache(maxsize=None)
def make_mssim_l1(cfg: PhotoConfig, scale: float):
    return _make_ssim(cfg, scale, occlusion_aware=False)


@functools.lru_cache(maxsize=None)
def make_ossim_l1(cfg: PhotoConfig, scale: float):
    return _make_ssim(cfg, scale, occlusion_aware=True)


# --------------------------------------------------------------------------
# Simple 2-frame variants (criterions/BCCriterion.lua, SSIMCriterion.lua)
# --------------------------------------------------------------------------

def bcc(input_img, target, penalty="Quadratic"):
    """Plain brightness constancy mean penalty (BCCriterion.lua:26-36).
    The reference backward references an undefined buffer (latent bug,
    BCCriterion.lua:48); we provide the working analytic gradient."""
    p = make_penalty(penalty)
    return jnp.sum(p.apply(input_img - target)) / input_img.size


def ssim(input_img, target, size_average=True):
    """2-frame SSIM criterion (SSIMCriterion.lua:40-77); autodiff gradient."""
    mn, mx = _minmax(input_img, target)
    rng = mx - mn
    x = (input_img - mn) / rng
    y = (target - mn) / rng
    mu_y = depthwise_gauss3(y)
    sigma_y = depthwise_gauss3(y * y) - mu_y * mu_y
    _, _, ssim_l, ssim_cs = _ssim_terms(x, y, mu_y, sigma_y)
    val = jnp.sum(0.5 * (1.0 - ssim_l * ssim_cs))
    return val / x.size if size_average else val

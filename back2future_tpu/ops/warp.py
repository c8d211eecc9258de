"""Differentiable bilinear warping with pixel-offset flow semantics.

Semantics follow the reference's *modified* CUDA sampler
(extras/stnbhwd/BilinearSamplerBHWD.cu:6-20,41-115): the flow value is a
pixel-space offset added to the output pixel coordinate; the resulting
source coordinate is clamped to the image border (edge behavior), and the
four bilinear corners contribute zero when they fall outside the image
(which can only happen for the +1 corners, whose weight is then exactly 0 —
so the forward is equivalent to clipped-index gathering).

The backward pass is where the reference deviates from autodiff: the flow
gradient is the bilinear finite-difference formula evaluated at the
*clamped* coordinate (BilinearSamplerBHWD.cu:287-295), i.e. it does NOT go
to zero where the coordinate clamps at the border (autodiff through clip
would). `reference_grads=True` (default) replicates that via a custom VJP;
with False you get plain autodiff through the clamp.

Layout: NHWC images (B, H, W, C); flow (B, H, W, 2) with channels (u, v) =
(x-offset, y-offset) — the reference grid's (x, y) inner order
(BilinearSamplerBHWD.cu:69-70).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _corners(flow, h, w):
    """Clamped source coords + interpolation weights + corner in-bounds."""
    b = flow.shape[0]
    gy = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    gx = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    xc = jnp.clip(flow[..., 0] + gx, 0.0, w - 1.0)
    yc = jnp.clip(flow[..., 1] + gy, 0.0, h - 1.0)
    x0 = jnp.floor(xc)
    y0 = jnp.floor(yc)
    wx = 1.0 - (xc - x0)  # weight of the left column
    wy = 1.0 - (yc - y0)  # weight of the top row
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    # only the +1 corners can be out of bounds after clamping
    x1_in = x0i + 1 <= w - 1
    y1_in = y0i + 1 <= h - 1
    return x0i, y0i, wx, wy, x1_in, y1_in


def _pin_row_major(x):
    """Optionally pin a gather operand to row-major layout on TPU.

    Two measured-and-conflicting effects on v5e: a row-major operand
    makes each gathered row contiguous (~1.5x faster per index in the
    train step, where the quad stack is materialized for the backward
    anyway), but in the inference forward the constraint blocks XLA from
    fusing the quad build into the gather (-25% throughput). Gated by
    B2F_GATHER_LAYOUT: "rowmajor" pins, anything falsy ("none"/unset)
    leaves layout assignment alone — the measured default."""
    import os

    from .layout import pin_layout

    if os.environ.get("B2F_GATHER_LAYOUT", "").strip().lower() != "rowmajor":
        return x
    return pin_layout(x, tuple(range(x.ndim)))


def _gather(images, yi, xi):
    """images (B,H,W,C), yi/xi (B,H,W) int32 -> (B,H,W,C)."""
    b = images.shape[0]
    bi = jnp.arange(b, dtype=jnp.int32)[:, None, None]
    return _pin_row_major(images)[bi, yi, xi]


def _quad(images):
    """(B,H,W,4C) neighborhood stack [self, right, down, diag] with
    edge replication — right[y,x] = img[y, min(x+1, W-1)] etc., exactly
    the clamped +1-corner indices of the warp. Lets ONE gather at
    (y0, x0) fetch all four bilinear corners: TPU gathers are
    per-index-bound, so this quarters the gather cost (and its transpose
    becomes one scatter plus dense shift-adds)."""
    right = jnp.concatenate([images[:, :, 1:], images[:, :, -1:]], axis=2)
    down = jnp.concatenate([images[:, 1:], images[:, -1:]], axis=1)
    diag = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
    return jnp.concatenate([images, right, down, diag], axis=-1)


def _gather_corners(images, y0, x0):
    """-> (tl, tr, bl, br), each (B,H,W,C), via one quad gather."""
    c = images.shape[-1]
    g = _gather(_quad(images), y0, x0)
    return g[..., :c], g[..., c:2 * c], g[..., 2 * c:3 * c], g[..., 3 * c:]


def _warp_forward(images, flow):
    h, w = images.shape[1], images.shape[2]
    x0, y0, wx, wy, x1_in, y1_in = _corners(flow, h, w)
    tl, tr, bl, br = _gather_corners(images, y0, x0)
    wx_ = wx[..., None]
    wy_ = wy[..., None]
    # clipped +1 corners have weight exactly 0, so no masking needed here
    return (wx_ * wy_ * tl + (1 - wx_) * wy_ * tr
            + wx_ * (1 - wy_) * bl + (1 - wx_) * (1 - wy_) * br)


@jax.custom_vjp
def _warp_reference_grads(images, flow):
    return _warp_forward(images, flow)


def _warp_fwd(images, flow):
    return _warp_forward(images, flow), (images, flow)


# Budgets for the two-hot matmul transpose (see _d_images_matmul): per
# batch element, MACs = P*H*W*C and the expanded intermediate holds
# P*H*C elements. Disabled by default: measured on v5e, the XLA scatter
# runs at ~10 ns/index (1.3 ms for the level-3 feature warp at 320x640
# crops) while this path pays ~3x the expanded intermediate's HBM
# traffic (~4.5 ms) — the scatter wins at every shape the model uses.
# Kept as the reference implementation for the fused Pallas transpose
# kernel, which performs the same contraction VMEM-resident.
_MATMUL_DIMG_MAX_MACS = 0
_MATMUL_DIMG_MAX_T_ELEMS = 0


@functools.lru_cache(maxsize=1)
def _wp():
    from . import warp_pallas

    return warp_pallas


def _pallas_dimg_enabled() -> bool:
    """Opt-in only (B2F_DIMG_PALLAS): measured on v5e, the fused two-hot
    transpose kernel is VPU-bound on its (P, H*C) expansion and loses to
    the XLA scatter at every model shape (3.6 vs 2.7 ms for the level-3
    feature-warp pair at 320x640) — the scatter's ~10 ns/index is near
    the DMA-descriptor-rate floor. The kernel is kept as working evidence
    of the formulation and for hardware where scatters are slower.

    Deliberately a separate flag from B2F_FORCE_PALLAS (which forces the
    cost-volume Pallas path off-TPU for interpret-mode testing) so
    forcing one experiment doesn't silently switch the warp backward."""
    from .layout import env_flag

    return env_flag("B2F_DIMG_PALLAS")


def _d_images_matmul(g, y0, x0, wx, wy, h, w):
    """Image gradient of the warp as a two-hot MXU contraction.

    The transpose of the bilinear gather is a scatter-add. The bilinear
    splat weights factorize per axis (w_tl = wy*wx etc.), so the exact
    transpose is also expressible as

        d_img[r, X, c] = sum_p OHr[p, r] * OHX[p, X] * g[p, c]

    with OHr the row "two-hot" (wy at y0, 1-wy at y0+1) and OHX the
    column two-hot. Exact for unbounded flow: out-of-range +1 corners
    have weight exactly 0 and match no one-hot column. g is (B,H,W,C)
    with the SAME spatial dims as the source here (warp output size =
    input size), so p ranges over H*W. In XLA this materializes the
    (P, H*C) expansion through HBM and loses to the scatter (see budget
    note above); the Pallas kernel in warp_pallas.py keeps the expansion
    VMEM-resident, which is where the formulation wins.
    """
    b, ho, wo, c = g.shape
    dt = g.dtype
    rr = jnp.arange(h, dtype=jnp.int32)
    xx = jnp.arange(w, dtype=jnp.int32)
    wy = wy.astype(dt)
    wx = wx.astype(dt)
    # (B, Ho, Wo, Hsrc) / (B, Ho, Wo, Wsrc) two-hot factors
    ohr = (wy[..., None] * (y0[..., None] == rr)
           + (1.0 - wy)[..., None] * ((y0 + 1)[..., None] == rr)).astype(dt)
    ohx = (wx[..., None] * (x0[..., None] == xx)
           + (1.0 - wx)[..., None] * ((x0 + 1)[..., None] == xx)).astype(dt)
    # t[p, r, c] = OHr[p, r] * g[p, c]; then contract p on the MXU
    t = (ohr[..., :, None] * g[..., None, :]).reshape(b, ho * wo, h * c)
    ohx = ohx.reshape(b, ho * wo, w)
    d = jax.lax.dot_general(
        ohx, t, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (B, Wsrc, Hsrc*C)
    d = d.reshape(b, w, h, c).swapaxes(1, 2)
    return d.astype(dt)


def _warp_bwd(res, g):
    images, flow = res
    g = g.astype(images.dtype)
    h, w = images.shape[1], images.shape[2]
    c = images.shape[3]
    x0, y0, wx, wy, x1_in, y1_in = _corners(flow, h, w)

    # image gradient: exact transpose of the (differentiable) forward
    p = g.shape[1] * g.shape[2]
    if _pallas_dimg_enabled() and _wp().fits(h, w, c, g.dtype):
        d_images = _wp().d_images_pallas(g, y0, x0, wy, wx, h, w)
    elif (p * h * w * c <= _MATMUL_DIMG_MAX_MACS
            and p * h * c <= _MATMUL_DIMG_MAX_T_ELEMS):
        d_images = _d_images_matmul(g, y0, x0, wx, wy, h, w)
    else:
        # quad scatter-add plus dense shift-adds (the _quad transpose)
        _, im_vjp = jax.vjp(lambda im: _warp_forward(im, flow), images)
        (d_images,) = im_vjp(g)

    # flow gradient: reference formula (BilinearSamplerBHWD.cu:232-295) —
    # per-corner dot products with gradOutput, out-of-bounds corners -> 0,
    # NO zeroing at clamped borders.
    tl_v, tr_v, bl_v, br_v = _gather_corners(images, y0, x0)

    def dot(vals, in_mask):
        d = jnp.sum(vals * g, axis=-1)
        return jnp.where(in_mask, d, 0.0)

    tl = dot(tl_v, jnp.ones_like(x1_in))
    tr = dot(tr_v, x1_in)
    bl = dot(bl_v, y1_in)
    br = dot(br_v, x1_in & y1_in)

    dfx = -wy * tl + wy * tr - (1 - wy) * bl + (1 - wy) * br
    dfy = -wx * tl + wx * bl - (1 - wx) * tr + (1 - wx) * br
    d_flow = jnp.stack([dfx, dfy], axis=-1).astype(flow.dtype)
    return d_images, d_flow


_warp_reference_grads.defvjp(_warp_fwd, _warp_bwd)


def _warp_autodiff(images, flow):
    """Plain autodiff variant (clamp zeroes border flow gradients)."""
    h, w = images.shape[1], images.shape[2]
    gy = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    gx = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    xc = jnp.clip(flow[..., 0] + gx, 0.0, w - 1.0)
    yc = jnp.clip(flow[..., 1] + gy, 0.0, h - 1.0)
    x0 = jnp.floor(jax.lax.stop_gradient(xc))
    y0 = jnp.floor(jax.lax.stop_gradient(yc))
    wx = (1.0 - (xc - x0))[..., None]
    wy = (1.0 - (yc - y0))[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    tl, tr, bl, br = _gather_corners(images, y0i, x0i)
    return wx * wy * tl + (1 - wx) * wy * tr + wx * (1 - wy) * bl + (1 - wx) * (1 - wy) * br


def warp_bilinear(images: jax.Array, flow: jax.Array, *,
                  reference_grads: bool = True) -> jax.Array:
    """Warp `images` by pixel-offset `flow` (NHWC; see module docstring)."""
    if images.ndim != 4 or flow.ndim != 4 or flow.shape[-1] != 2:
        raise ValueError(f"expected NHWC images and (B,H,W,2) flow, got "
                         f"{images.shape} / {flow.shape}")
    flow = flow.astype(images.dtype)
    if reference_grads:
        return _warp_reference_grads(images, flow)
    return _warp_autodiff(images, flow)

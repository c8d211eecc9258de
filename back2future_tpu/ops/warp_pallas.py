"""Fused Pallas TPU kernel for the warp backward's image gradient.

The image gradient of the bilinear warp is the transpose of its gather:
a scatter-add that XLA lowers to a per-index loop (~10 ns/index on v5e,
~1.3 ms for a level-3 feature warp at 320x640 training crops — one of
the larger train-step costs). Because the bilinear splat weights
factorize per axis (w_tl = wy*wx, ..., BilinearSamplerBHWD.cu:161-307),
the exact transpose is a contraction against row/column "two-hot"
matrices:

    d_img[r, X, c] = sum_p OHr[p, r] * OHX[p, X] * g[p, c]
    OHr[p, r] = wy[p]*(y0[p]==r) + (1-wy[p])*(y0[p]+1==r)
    OHX[p, X] = wx[p]*(x0[p]==X) + (1-wx[p])*(x0[p]+1==X)

In XLA this loses to the scatter because the (P, H*C) expansion
round-trips HBM (see warp.py:_d_images_matmul). This kernel performs
the whole contraction VMEM-resident per output-row tile:

    build OHr (p_t, H), OHX (p_t, W) from iota compares     (VPU)
    t[p, c*H + r] = g[p, c] * OHr[p, r]                      (VPU)
    acc[X, c*H + r] += OHX^T @ t                              (MXU)

and emits (B, W, C, H); the caller transposes to NHWC. Exact for
unbounded flows: out-of-range +1 corners carry weight exactly 0 and
match no iota column.

Only worth it when P*H*W*C MACs are modest (feature maps); full-res
image warps stay on the scatter path (and are usually DCE'd anyway —
no gradient flows to raw input images).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# conservative: Mosaic stages an f32 copy of the t expansion for the MXU
# pass, roughly doubling the accounted footprint (observed on v5e)
_VMEM_BUDGET = 4 * 1024 * 1024
# per-batch-element MAC ceiling: above this the MXU contraction costs
# more than the ~10ns/index scatter (level-3 feature warps sit at ~5-19G,
# full-res image warps at ~126G)
_MAX_MACS_PER_ELEM = 24 * 1024 ** 3


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _bytes(shape, dtype) -> int:
    return int(np.prod(shape)) * np.dtype(dtype).itemsize


def pick_tile(h: int, w: int, c: int, dtype) -> Optional[int]:
    """Largest row-tile TH dividing H whose VMEM footprint fits."""
    n = c * h
    acc = _bytes((w, n), jnp.float32)
    for th in [t for t in range(h, 0, -1) if h % t == 0]:
        p_t = th * w
        need = (acc + _bytes((p_t, n), dtype)           # t expansion
                + _bytes((p_t, h), dtype) + _bytes((p_t, w), dtype)
                + 2 * (_bytes((p_t, c), dtype) + 4 * _bytes((p_t, 1), jnp.float32)))
        if need <= _VMEM_BUDGET:
            return th
    return None


def fits(h: int, w: int, c: int, dtype) -> bool:
    if (h * w) * (h * w * c) > _MAX_MACS_PER_ELEM:
        return False
    return pick_tile(h, w, c, dtype) is not None


def _kernel(h, w, c, th, g_ref, y0_ref, x0_ref, wy_ref, wx_ref,
            out_ref, acc_ref, t_ref):
    i = pl.program_id(1)
    p_t = th * w
    dt = g_ref.dtype

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    y0 = y0_ref[0]                                    # (p_t, 1) i32
    x0 = x0_ref[0]
    wy = wy_ref[0].astype(jnp.float32)                # (p_t, 1) f32
    wx = wx_ref[0].astype(jnp.float32)

    rr = jax.lax.broadcasted_iota(jnp.int32, (p_t, h), 1)
    ohr = (jnp.where(rr == y0, wy, 0.0)
           + jnp.where(rr == y0 + 1, 1.0 - wy, 0.0)).astype(dt)
    xx = jax.lax.broadcasted_iota(jnp.int32, (p_t, w), 1)
    ohx = (jnp.where(xx == x0, wx, 0.0)
           + jnp.where(xx == x0 + 1, 1.0 - wx, 0.0)).astype(dt)

    for cc in range(c):
        g_c = g_ref[0, :, cc][:, None]                # (p_t, 1)
        t_ref[:, cc * h:(cc + 1) * h] = g_c * ohr

    acc_ref[...] += jax.lax.dot_general(
        ohx, t_ref[...], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (W, C*H)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def d_images_pallas(g: jax.Array, y0: jax.Array, x0: jax.Array,
                    wy: jax.Array, wx: jax.Array,
                    h: int, w: int) -> jax.Array:
    """Image gradient of the warp; returns (B, H, W, C). See module doc."""
    b, ho, wo, c = g.shape
    assert (ho, wo) == (h, w), "warp output dims equal source dims"
    th = pick_tile(h, w, c, g.dtype)
    assert th is not None, "caller must gate on fits()"
    p_t = th * w

    gf = g.reshape(b, h * w, c)
    y0f = y0.reshape(b, h * w, 1)
    x0f = x0.reshape(b, h * w, 1)
    wyf = wy.astype(jnp.float32).reshape(b, h * w, 1)
    wxf = wx.astype(jnp.float32).reshape(b, h * w, 1)

    flat = lambda bb, ii: (bb, ii, 0)
    out = pl.pallas_call(
        functools.partial(_kernel, h, w, c, th),
        out_shape=jax.ShapeDtypeStruct((b, w, c * h), g.dtype),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, p_t, c), flat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_t, 1), flat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_t, 1), flat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_t, 1), flat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_t, 1), flat, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w, c * h), lambda bb, ii: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((w, c * h), jnp.float32),
                        pltpu.VMEM((p_t, c * h), g.dtype)],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (h * w) * h * w * c,
            bytes_accessed=2 * g.size * g.dtype.itemsize,
            transcendentals=0),
    )(gf, y0f, x0f, wyf, wxf)
    out = out.reshape(b, w, c, h)
    return jnp.transpose(out, (0, 3, 1, 2))           # (B, H, W, C)

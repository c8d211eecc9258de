"""Fused Pallas TPU kernel for the multi-frame cost volume.

The pure-XLA implementation (cost_volume.py) lowers to a win**2-iteration
scan whose every step re-reads the full reference and frame feature maps
from HBM — O(win**2) HBM traffic — and reduces over the channel (lane)
dimension with cross-lane shuffles. This kernel works channels-major:

    ref   (B, C, H, W)   pipelined VMEM blocks, one (TH, W) tile per c
    frame (B, C, Hp, Wp) stays in HBM; the kernel DMAs the whole padded
                          image of the current batch element into a VMEM
                          slab ONCE (first row-tile), then every
                          displacement/channel reads it on-chip
    out   (B, Q, H, W)   per-q writes are contiguous (TH, W) planes

so each feature map crosses HBM exactly once, the inner loop is pure
(TH, W)-tile FMAs on the VPU with f32 accumulation (no cross-lane
reductions, no per-lane masked writes), and the layout moves to/from
NHWC are plain XLA transposes outside the kernel.

Semantics (models/CostVolMulti.lua:49-108):
    out[b,y,x,q] = sum_c ref[b,y,x,c] * frame[b, y-qy(q), x-qx(q), c]
q enumerates qx outer / qy inner; displacements are dilated by the frame
distance and mirrored for past frames; zero outside the overlap.

The backward pass reuses the XLA implementation via jax.vjp (the op is
bilinear, so XLA autodiff is exact); training-step fusion of the
backward is a later optimization.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cost_volume import _displacements

_VMEM_BUDGET = 12 * 1024 * 1024


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bytes(shape, dtype) -> int:
    return int(np.prod(shape)) * np.dtype(dtype).itemsize


def _slab_dims(h: int, w: int, pad: int) -> Tuple[int, int]:
    """Padded-slab minor dims, tile-aligned so the HBM memref can be
    DMA-sliced: rows to a sublane multiple, cols to a lane multiple."""
    return _round_up(h + 2 * pad, 16), _round_up(w + 2 * pad, 128)


def pick_tile(h: int, w: int, c: int, win: int, dilation: int,
              dtype=jnp.bfloat16) -> Optional[int]:
    """Largest divisor TH of H whose VMEM footprint fits. None -> XLA."""
    p = (win - 1) // 2 * dilation
    q = win * win
    hp, wp = _slab_dims(h, w, p)
    slab = _bytes((c, hp, wp), dtype)
    if slab > _VMEM_BUDGET:
        return None
    # row tiles must keep slab loads sublane-aligned: TH a multiple of 8,
    # or a single whole-image tile (offset 0 is trivially aligned)
    cands = [d for d in range(1, h + 1)
             if h % d == 0 and (d % 8 == 0 or d == h)]
    for th in sorted(set(cands), reverse=True):
        blocks = 2 * (_bytes((c, th, w), dtype) + _bytes((q, th, w), dtype))
        acc = _bytes((q, th, w), jnp.float32)
        if slab + blocks + acc <= _VMEM_BUDGET:
            return th
    return None


def fits_vmem(h: int, w: int, c: int, win: int, dilation: int,
              dtype=jnp.bfloat16) -> bool:
    return pick_tile(h, w, c, win, dilation, dtype) is not None


def _fwd_kernel(disp, pad, th, c, ref_ref, frame_hbm, out_ref,
                slab, acc_ref, sem):
    b, i = pl.program_id(0), pl.program_id(1)

    # the slab holds the full padded image of batch element b; refresh it
    # only when b changes (i iterates fastest in the (b, i) grid)
    @pl.when(i == 0)
    def _():
        dma = pltpu.make_async_copy(frame_hbm.at[b], slab, sem)
        dma.start()
        dma.wait()

    base = pl.multiple_of(i * th, 8)  # sublane-aligned row base (th % 8 == 0)
    q, h_t, w_t = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    win_rows = th + 2 * pad
    acc_ref[...] = jnp.zeros((q, h_t, w_t), jnp.float32)

    def body(cc, carry):
        r = ref_ref[0, cc].astype(jnp.float32)                  # (TH, W)
        # aligned dynamic row window, then static halo subslices
        f_full = slab[cc, pl.ds(base, win_rows), :].astype(jnp.float32)
        for qi, (qy, qx) in enumerate(disp):
            dy = pad - int(qy)
            dx = pad - int(qx)
            acc_ref[qi] += r * f_full[dy:dy + h_t, dx:dx + w_t]
        return carry

    jax.lax.fori_loop(0, c, body, 0)
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _cv_pallas_raw(ref, frame, win, dilation, fwd):
    b, h, w, c = ref.shape
    n = (win - 1) // 2
    pad = n * dilation
    th = pick_tile(h, w, c, win, dilation, ref.dtype)
    assert th is not None, "caller must gate on fits_vmem"
    disp = tuple(map(tuple, _displacements(win, dilation, fwd)))
    q = win * win

    ref_cm = jnp.moveaxis(ref, -1, 1)                      # (B, C, H, W)
    hp, wp = _slab_dims(h, w, pad)
    frame_cm = jnp.moveaxis(frame, -1, 1)
    frame_cm = jnp.pad(frame_cm, ((0, 0), (0, 0),
                                  (pad, hp - h - pad),
                                  (pad, wp - w - pad)))    # (B, C, Hp, Wp)

    out_cm = pl.pallas_call(
        functools.partial(_fwd_kernel, disp, pad, th, c),
        out_shape=jax.ShapeDtypeStruct((b, q, h, w), ref.dtype),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, c, th, w), lambda bb, ii: (bb, 0, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, q, th, w), lambda bb, ii: (bb, 0, ii, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, hp, wp), ref.dtype),
            pltpu.VMEM((q, th, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * q,
            bytes_accessed=2 * ref.size * ref.dtype.itemsize
            + b * h * w * q * ref.dtype.itemsize,
            transcendentals=0),
    )(ref_cm, frame_cm)
    return jnp.moveaxis(out_cm, 1, -1)                     # (B, H, W, Q)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def cost_volume_pallas(ref: jax.Array, frame: jax.Array, win: int,
                       dilation: int = 1, fwd: bool = True) -> jax.Array:
    """Single-frame cost volume term (unnormalized), fused on TPU."""
    return _cv_pallas_raw(ref, frame, win, dilation, fwd)


def _cv_fwd_rule(ref, frame, win, dilation, fwd):
    return _cv_pallas_raw(ref, frame, win, dilation, fwd), (ref, frame)


def _dref_kernel(disp, pad, th, c, g_ref, frame_hbm, out_ref, slab, sem):
    """d_ref[b,y,x,c] = sum_q g[b,y,x,q] * frame[b, y-qy, x-qx, c]."""
    b, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dma = pltpu.make_async_copy(frame_hbm.at[b], slab, sem)
        dma.start()
        dma.wait()

    base = pl.multiple_of(i * th, 8)
    h_t, w_t = out_ref.shape[2], out_ref.shape[3]
    win_rows = th + 2 * pad

    def body(cc, carry):
        f_full = slab[cc, pl.ds(base, win_rows), :].astype(jnp.float32)
        acc = jnp.zeros((h_t, w_t), jnp.float32)
        for qi, (qy, qx) in enumerate(disp):
            dy = pad - int(qy)
            dx = pad - int(qx)
            acc = acc + (g_ref[0, qi].astype(jnp.float32)
                         * f_full[dy:dy + h_t, dx:dx + w_t])
        out_ref[0, cc] = acc.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, c, body, 0)


def _dframe_kernel(disp, pad, th, c, gp_hbm, refp_hbm, out_ref,
                   g_slab, r_slab, gsem, rsem):
    """d_frame[b,y,x,c] = sum_q g[b,y+qy,x+qx,q] * ref[b,y+qy,x+qx,c]."""
    b, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _():
        d1 = pltpu.make_async_copy(gp_hbm.at[b], g_slab, gsem)
        d2 = pltpu.make_async_copy(refp_hbm.at[b], r_slab, rsem)
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()

    base = pl.multiple_of(i * th, 8)
    h_t, w_t = out_ref.shape[2], out_ref.shape[3]
    win_rows = th + 2 * pad

    def body(cc, carry):
        r_full = r_slab[cc, pl.ds(base, win_rows), :].astype(jnp.float32)
        acc = jnp.zeros((h_t, w_t), jnp.float32)
        for qi, (qy, qx) in enumerate(disp):
            dy = pad + int(qy)
            dx = pad + int(qx)
            g_full = g_slab[qi, pl.ds(base, win_rows), :].astype(jnp.float32)
            acc = acc + (g_full[dy:dy + h_t, dx:dx + w_t]
                         * r_full[dy:dy + h_t, dx:dx + w_t])
        out_ref[0, cc] = acc.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, c, body, 0)


def _bwd_tile(h: int, w: int, c: int, win: int, dilation: int,
              dtype) -> Optional[int]:
    """Row tile for the backward kernels (worst case: d_frame holds both
    padded slabs)."""
    p = (win - 1) // 2 * dilation
    q = win * win
    hp, wp = _slab_dims(h, w, p)
    slabs = _bytes((q, hp, wp), dtype) + _bytes((c, hp, wp), dtype)
    if slabs > _VMEM_BUDGET:
        return None
    cands = [d for d in range(1, h + 1)
             if h % d == 0 and (d % 8 == 0 or d == h)]
    for th in sorted(set(cands), reverse=True):
        blocks = 2 * (_bytes((q, th, w), dtype) + _bytes((c, th, w), dtype))
        if slabs + blocks + _bytes((th, w), jnp.float32) <= _VMEM_BUDGET:
            return th
    return None


def _cv_bwd_rule(win, dilation, fwd, res, g):
    ref, frame = res
    b, h, w, c = ref.shape
    n = (win - 1) // 2
    pad = n * dilation
    q = win * win
    disp = tuple(map(tuple, _displacements(win, dilation, fwd)))
    th = _bwd_tile(h, w, c, win, dilation, ref.dtype)

    if th is None:
        # explicit XLA transpose (the op is bilinear, so this is exact)
        from .cost_volume import cost_volume

        _, vjp = jax.vjp(
            lambda r, f: cost_volume(r, f, win, dilation=dilation, fwd=fwd),
            ref, frame)
        return vjp(g.astype(ref.dtype))

    hp, wp = _slab_dims(h, w, pad)
    g_cm = jnp.moveaxis(g.astype(ref.dtype), -1, 1)        # (B, Q, H, W)

    frame_cm = jnp.moveaxis(frame, -1, 1)
    frame_cm = jnp.pad(frame_cm, ((0, 0), (0, 0), (pad, hp - h - pad),
                                  (pad, wp - w - pad)))
    d_ref_cm = pl.pallas_call(
        functools.partial(_dref_kernel, disp, pad, th, c),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), ref.dtype),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, q, th, w), lambda bb, ii: (bb, 0, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, c, th, w), lambda bb, ii: (bb, 0, ii, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, hp, wp), ref.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_use_interpret(),
    )(g_cm, frame_cm)

    gp_cm = jnp.pad(g_cm, ((0, 0), (0, 0), (pad, hp - h - pad),
                           (pad, wp - w - pad)))
    ref_cm = jnp.moveaxis(ref, -1, 1)
    refp_cm = jnp.pad(ref_cm, ((0, 0), (0, 0), (pad, hp - h - pad),
                               (pad, wp - w - pad)))
    d_frame_cm = pl.pallas_call(
        functools.partial(_dframe_kernel, disp, pad, th, c),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), frame.dtype),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, c, th, w), lambda bb, ii: (bb, 0, ii, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((q, hp, wp), ref.dtype),
            pltpu.VMEM((c, hp, wp), ref.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_use_interpret(),
    )(gp_cm, refp_cm)

    return (jnp.moveaxis(d_ref_cm, 1, -1),
            jnp.moveaxis(d_frame_cm, 1, -1))


cost_volume_pallas.defvjp(_cv_fwd_rule, _cv_bwd_rule)

"""Fused Pallas TPU kernel for the multi-frame cost volume.

The pure-XLA implementation (cost_volume.py) lowers to a win**2-iteration
scan whose every step re-reads the full reference and frame feature maps
from HBM — O(win**2) HBM traffic. These kernels keep a reference row-slab
and the matching haloed frame slab resident in VMEM and sweep all win**2
displacements on-chip, so each map is read from HBM exactly once
(the design target from SURVEY.md §7 "hard parts" #2; reference semantics
from models/CostVolMulti.lua:49-108).

Forward:   out[b,y,x,q] = sum_c ref[b,y,x,c] * frame[b, y-qy(q), x-qx(q), c]
Backward:  d_ref  [b,y,x,c] = sum_q g[b,y,x,q]     * frame[b, y-qy, x-qx, c]
           d_frame[b,y,x,c] = sum_q g[b,y+qy,x+qx,q] * ref[b, y+qy, x+qx, c]
(zero outside the overlap; q enumerates qx outer / qy inner, displacements
dilated by the frame distance and mirrored for past frames.)

Grid = (B, H/TH). Non-haloed operands (ref slab, grad slab, outputs) are
delivered as pipelined VMEM blocks; the haloed operand lives in HBM/ANY
and the kernel DMAs its (TH+2p) row window into scratch (halo reads
overlap between adjacent tiles, which BlockSpec pipelining cannot
express). Accumulation is f32 regardless of input dtype. Falls back to
the XLA path when no row tiling fits the VMEM budget.
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

_VMEM_BUDGET = 10 * 1024 * 1024


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_aligned(x: jax.Array, pad: int) -> Tuple[jax.Array, int, int]:
    """Zero-pad (B,H,W,C) with `pad` halo rows/cols, then align the minor
    dims (W -> sublane multiple, C -> lane multiple) so Mosaic can slice
    the HBM memref for the manual halo DMA. Extra zeros are never read by
    the logical-extent slices inside the kernels."""
    b, h, w, c = x.shape
    wp = _round_up(w + 2 * pad, 16)
    cp = _round_up(c, 128)
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, wp - (w + pad)),
                       (0, cp - c))), wp, cp


def _bytes(shape, dtype) -> int:
    return int(np.prod(shape)) * np.dtype(dtype).itemsize


def pick_tile(h: int, w: int, c: int, win: int, dilation: int,
              dtype=jnp.bfloat16) -> Optional[int]:
    """Largest divisor TH of H whose worst-kernel VMEM footprint fits.
    None -> fall back to XLA."""
    p = (win - 1) // 2 * dilation
    q = win * win
    wp = _round_up(w + 2 * p, 16)        # aligned haloed-scratch minor dims
    cp = _round_up(c, 128)
    qp = _round_up(q, 128)
    for th in sorted({d for d in range(1, h + 1) if h % d == 0},
                     reverse=True):
        # x2 on pipelined blocks (double buffering), x1 on DMA scratch
        fwd = (2 * (_bytes((th, w, c), dtype) + _bytes((th, w, q), dtype))
               + _bytes((th + 2 * p, wp, cp), dtype))
        dref = (2 * (_bytes((th, w, q), dtype) + _bytes((th, w, c), dtype))
                + _bytes((th + 2 * p, wp, cp), dtype)
                + _bytes((th, w, c), jnp.float32))
        dframe = (2 * 2 * _bytes((th, w, c), dtype)
                  + _bytes((th + 2 * p, wp, qp), dtype)
                  + _bytes((th + 2 * p, wp, cp), dtype)
                  + _bytes((th, w, c), jnp.float32))
        if max(fwd, dref, dframe) <= _VMEM_BUDGET:
            return th
    return None


def fits_vmem(h: int, w: int, c: int, win: int, dilation: int,
              dtype=jnp.bfloat16) -> bool:
    return pick_tile(h, w, c, win, dilation, dtype) is not None


def _slab(hbm_ref, b, row0, rows, scratch, sem):
    """DMA rows [row0, row0+rows) of hbm_ref[b] into scratch; blocking."""
    dma = pltpu.make_async_copy(
        hbm_ref.at[b, pl.ds(row0, rows)], scratch, sem)
    dma.start()
    dma.wait()


def _fwd_kernel(disp, pad, th, ref_ref, framep_hbm, out_ref, scratch, sem):
    b, i = pl.program_id(0), pl.program_id(1)
    _slab(framep_hbm, b, i * th, th + 2 * pad, scratch, sem)
    r = ref_ref[0].astype(jnp.float32)                 # (TH, W, C)
    h, w = r.shape[0], r.shape[1]
    c = r.shape[2]
    for qi, (qy, qx) in enumerate(disp):
        dy, dx = pad - int(qy), pad - int(qx)
        sl = scratch[dy:dy + h, dx:dx + w, :c].astype(jnp.float32)
        out_ref[0, :, :, qi] = jnp.sum(r * sl, axis=-1).astype(out_ref.dtype)


def _dref_kernel(disp, pad, th, g_ref, framep_hbm, out_ref, scratch, sem):
    b, i = pl.program_id(0), pl.program_id(1)
    _slab(framep_hbm, b, i * th, th + 2 * pad, scratch, sem)
    h, w, c = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for qi, (qy, qx) in enumerate(disp):
        dy, dx = pad - int(qy), pad - int(qx)
        sl = scratch[dy:dy + h, dx:dx + w, :c].astype(jnp.float32)
        acc = acc + g_ref[0, :, :, qi].astype(jnp.float32)[..., None] * sl
    out_ref[0] = acc.astype(out_ref.dtype)


def _dframe_kernel(disp, pad, th, gp_hbm, refp_hbm, out_ref,
                   g_scratch, r_scratch, gsem, rsem):
    b, i = pl.program_id(0), pl.program_id(1)
    _slab(gp_hbm, b, i * th, th + 2 * pad, g_scratch, gsem)
    _slab(refp_hbm, b, i * th, th + 2 * pad, r_scratch, rsem)
    h, w, c = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for qi, (qy, qx) in enumerate(disp):
        dy, dx = pad + int(qy), pad + int(qx)
        g = g_scratch[dy:dy + h, dx:dx + w, qi].astype(jnp.float32)
        r = r_scratch[dy:dy + h, dx:dx + w, :c].astype(jnp.float32)
        acc = acc + g[..., None] * r
    out_ref[0] = acc.astype(out_ref.dtype)


def _block(shape_tail, th):
    """BlockSpec for a (B, H, W, K) operand tiled over (batch, row-slab)."""
    return pl.BlockSpec((1, th) + tuple(shape_tail),
                        lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)


def _hbm_spec():
    return pl.BlockSpec(memory_space=pltpu.ANY)


def _cv_forward(ref, frame, win, dilation, fwd):
    b, h, w, c = ref.shape
    n = (win - 1) // 2
    pad = n * dilation
    th = pick_tile(h, w, c, win, dilation, ref.dtype)
    assert th is not None, "caller must gate on fits_vmem"
    disp = tuple(map(tuple, _displacements(win, dilation, fwd)))
    padded, wp, cp = _pad_aligned(frame, pad)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, disp, pad, th),
        out_shape=jax.ShapeDtypeStruct((b, h, w, win * win), ref.dtype),
        grid=(b, h // th),
        in_specs=[_block((w, c), th), _hbm_spec()],
        out_specs=_block((w, win * win), th),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * pad, wp, cp), ref.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * win * win,
            bytes_accessed=2 * ref.size * ref.dtype.itemsize
            + b * h * w * win * win * ref.dtype.itemsize,
            transcendentals=0),
    )(ref, padded)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def cost_volume_pallas(ref: jax.Array, frame: jax.Array, win: int,
                       dilation: int = 1, fwd: bool = True) -> jax.Array:
    """Single-frame cost volume term (unnormalized), fused on TPU."""
    return _cv_forward(ref, frame, win, dilation, fwd)


def _cv_fwd_rule(ref, frame, win, dilation, fwd):
    return _cv_forward(ref, frame, win, dilation, fwd), (ref, frame)


def _cv_bwd_rule(win, dilation, fwd, res, g):
    ref, frame = res
    b, h, w, c = ref.shape
    n = (win - 1) // 2
    pad = n * dilation
    th = pick_tile(h, w, c, win, dilation, ref.dtype)
    disp = tuple(map(tuple, _displacements(win, dilation, fwd)))
    g = g.astype(ref.dtype)

    framep, wp, cp = _pad_aligned(frame, pad)
    d_ref = pl.pallas_call(
        functools.partial(_dref_kernel, disp, pad, th),
        out_shape=jax.ShapeDtypeStruct(ref.shape, ref.dtype),
        grid=(b, h // th),
        in_specs=[_block((w, win * win), th), _hbm_spec()],
        out_specs=_block((w, c), th),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * pad, wp, cp), ref.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_use_interpret(),
    )(g, framep)

    gp, wp, qp = _pad_aligned(g, pad)
    refp, _, cp = _pad_aligned(ref, pad)
    d_frame = pl.pallas_call(
        functools.partial(_dframe_kernel, disp, pad, th),
        out_shape=jax.ShapeDtypeStruct(frame.shape, frame.dtype),
        grid=(b, h // th),
        in_specs=[_hbm_spec(), _hbm_spec()],
        out_specs=_block((w, c), th),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * pad, wp, qp), g.dtype),
            pltpu.VMEM((th + 2 * pad, wp, cp), ref.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_use_interpret(),
    )(gp, refp)
    return d_ref, d_frame


cost_volume_pallas.defvjp(_cv_fwd_rule, _cv_bwd_rule)

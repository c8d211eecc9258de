"""Fused Pallas TPU kernel for the small-channel feature-pyramid stem.

The first two pyramid ConvUnits (models/pwc.lua:58-65; levels 2 and 3:
3->16->16 stride-2 and 16->32->32 stride-2) are the worst-mapped ops in
the whole net for XLA's conv lowering: with C_in in {3, 16} the MXU
contraction is 27-144 deep and the NHWC channel-minor layout leaves
most lanes idle, so the four convs plus their surrounding layout
copies/converts cost ~6 ms of the 40 ms B=16 forward against a ~0.6 ms
data-movement roofline (BENCHMARKS.md "measured floor").

This kernel reformulates each conv as a block-Toeplitz matmul over the
flat row layout (H, W*C):

  * a row of NHWC memory is W*C lanes; 128 consecutive lanes hold
    128/C whole pixels, so every buffer is a (rows, nblk, 128) stack of
    "lane blocks" (plus one zero guard block per edge) with zero
    relayout cost;
  * an output block of S output columns x C_out channels is one matmul
    N-group (128 or 256 lanes, fully used);
  * its receptive field along W is a window of at most three
    consecutive lane blocks, so the conv becomes a sum of 9 matmuls
    (3 row taps x 3 block pieces), each contracting one full 128-lane
    block of a block/row-shifted slice against a sparse constant lift
    of the conv weights (built once per trace from the flax params),
    with f32 accumulation on the MXU — no gathers, no lane-granular
    slicing, no strided memory access;
  * stride 2 never strides memory: the stride-2 convs consume the free
    (H, W, C) -> (H/2, [row 2r | row 2r+1]) fold *view* of their input
    (pure reshape of contiguous NHWC memory; the 3->16 conv
    additionally needs the input channel-padded 3->4 so pixels are
    lane-aligned, done once outside the kernel where it replaces the
    existing f32->bf16 convert + copy).

Two pallas_calls (one per ConvUnit) process one batch element per grid
step with the whole image resident in VMEM; each feature map crosses
HBM exactly once.  The backward pass reuses the XLA reference chain via
jax.vjp (the fused forward computes the same convs, so autodiff through
the reference is the exact gradient modulo bf16 rounding).

Reference: models/pwc.lua:58-65 (ConvUnit), 177-186 (pyramid);
BENCHMARKS.md stem ledger entries.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def stem_pallas_enabled() -> bool:
    """Default OFF: the kernel is measured-slower than XLA's in-model
    stem lowering (BENCHMARKS.md stem ledger — the 128-lane lift's
    overcompute alone exceeds XLA's whole stem cost). B2F_STEM_PALLAS=1
    opts in (interpret mode off-TPU, for tests)."""
    v = os.environ.get("B2F_STEM_PALLAS", "").strip().lower()
    return v in ("1", "true", "yes", "on")


def stem_eligible(h: int, w: int, c_in: int, fm2: int, fm3: int) -> bool:
    """Shapes the kernel supports: the default net's stem (3->16->32)
    on inputs whose folded row buffers are lane-aligned."""
    return (c_in == 3 and fm2 == 16 and fm3 == 32
            and h % 4 == 0 and w % 64 == 0 and h >= 8 and w >= 64)


# ---------------------------------------------------------------------------
# Weight lifts: conv kernel (3,3,Ci,Co) -> (3 segs, 3 pieces, 128, N).
#
# The consuming matmul reads, for output block w, the input lane blocks
# w-1 / w / w+1 of a (rows, nblk, 128) buffer (piece index p+1) at the
# segment's row shift, and contracts each against lift[s, p+1]; entry
# (l, n) of lift[s, p+1] holds k[ky, dx, ci, co] where the window lane
# 128*p + l + off corresponds to tap (dx, ci) of output column j
# (n = Cout*j + co), off being the lane width of one input pixel.
# ---------------------------------------------------------------------------


def _accumulate(entries, nn):
    """entries: (seg, t_rel, n, (ky,dx,ci,co)) with t_rel = lane offset
    from the *block start* (may be negative / >=128)."""
    segs = 1 + max(e[0] for e in entries)
    rows, cols, kidx = [], [], []
    for s, a, n, idx in entries:
        p = a // 128 + 1
        l = a % 128
        assert 0 <= p < 3, (s, a, n)
        rows.append(((s * 3) + p) * 128 + l)
        cols.append(n)
        kidx.append(idx)
    used = np.zeros((3, 3), bool)
    for s_, a, _, _ in entries:
        used[s_, a // 128 + 1] = True
    return (np.array(rows), np.array(cols), np.array(kidx),
            segs * 3 * 128, nn, used)


def _lift_entries_fold4():
    """3->16 stride-2 conv from the H/W-folded, 4-padded input.

    Folded row r = [source row 2r | source row 2r+1], halves of W/32
    blocks (pixel c at lane 4c+ci within its half).  Output block w:
    out cols [16w, 16w+16) (N = 256), source cols 32w + 2j + dx - 1.
    Segments: even half shift 0 (ky=1), odd half shift 0 (ky=2),
    odd half shift -1 (ky=0).
    """
    entries = []
    for s, ky in enumerate([1, 2, 0]):
        for j in range(16):
            for dx in range(3):
                for ci in range(3):          # ci=3 is the zero pad channel
                    for co in range(16):
                        a = 4 * (2 * j + dx - 1) + ci
                        entries.append((s, a, 16 * j + co, (ky, dx, ci, co)))
    return _accumulate(entries, 256)


def _lift_entries_s1(c: int, co_n: int, s_cols: int):
    """Stride-1 3x3 conv on a flat (W*C)-lane buffer: block = s_cols
    out cols x co_n = 128 lanes; input cols s_cols*w + j + dx - 1.
    Segments: dy = 0,1,2 row shifts (ky = dy)."""
    entries = []
    for dy in range(3):
        for j in range(s_cols):
            for dx in range(3):
                for ci in range(c):
                    for co in range(co_n):
                        a = c * (j + dx - 1) + ci
                        entries.append((dy, a, co_n * j + co,
                                        (dy, dx, ci, co)))
    return _accumulate(entries, 128)


def _lift_entries_s2(c: int, co_n: int, s_cols: int):
    """Stride-2 3x3 conv from the H-folded view of a flat (W*C)-lane
    buffer (folded row r = [source row 2r | source row 2r+1]): block =
    s_cols out cols x co_n = 128 lanes; source cols 2*(s_cols*w + j) +
    dx - 1 (requires 2*s_cols*c == 128).  Segments: even half shift 0
    (ky=1), odd half shift 0 (ky=2), odd half shift -1 (ky=0)."""
    assert 2 * s_cols * c == 128
    entries = []
    for s, ky in enumerate([1, 2, 0]):
        for j in range(s_cols):
            for dx in range(3):
                for ci in range(c):
                    for co in range(co_n):
                        a = c * (2 * j + dx - 1) + ci
                        entries.append((s, a, co_n * j + co,
                                        (ky, dx, ci, co)))
    return _accumulate(entries, co_n * s_cols)


@functools.lru_cache(maxsize=None)
def _lift_index(which: str):
    if which == "a1":
        return _lift_entries_fold4()
    if which == "a2":
        return _lift_entries_s1(16, 16, 8)
    if which == "b1":
        return _lift_entries_s2(16, 32, 4)
    if which == "b2":
        return _lift_entries_s1(32, 32, 4)
    raise ValueError(which)


def lift_mask(which: str) -> np.ndarray:
    """(3, 3) bool: which (segment, piece) matmuls are nonzero."""
    return _lift_index(which)[5]


def _lift(k: jax.Array, which: str, dtype) -> jax.Array:
    """-> (3, 3, 128, N) per-(segment, piece) lift matrices."""
    rows, cols, kidx, kk, nn, _ = _lift_index(which)
    vals = k[kidx[:, 0], kidx[:, 1], kidx[:, 2], kidx[:, 3]]
    out = jnp.zeros((kk, nn), jnp.float32).at[rows, cols].set(
        vals.astype(jnp.float32))
    return out.reshape(3, 3, 128, nn).astype(dtype)


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------


def _leaky(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _chunks(h: int, target: int):
    out, r = [], 0
    while r < h:
        n = min(target, h - r)
        out.append((r, n))
        r += n
    return out


def _src(ref, h: int, nblk: int, b0: int, r0: int, n: int,
         shift: int, p: int):
    """Piece operand: rows [r0+shift, r0+shift+n) x blocks
    [b0+p-1, b0+p-1+nblk) of a (h, *, 128) ref, zero-filled outside
    [0, h) rows / [b0, b0+nblk) blocks (value-level concat)."""
    lo, hi = r0 + shift, r0 + shift + n
    clo, chi = max(lo, 0), min(hi, h)
    bl = b0 + p - 1
    cbl, cbh = max(bl, b0), min(bl + nblk, b0 + nblk)
    sl = ref[clo:chi, cbl:cbh, :]
    if cbl > bl:
        sl = jnp.concatenate(
            [jnp.zeros((chi - clo, cbl - bl, 128), sl.dtype), sl], axis=1)
    if bl + nblk > cbh:
        sl = jnp.concatenate(
            [sl, jnp.zeros((chi - clo, bl + nblk - cbh, 128), sl.dtype)],
            axis=1)
    if clo > lo:
        sl = jnp.concatenate(
            [jnp.zeros((clo - lo, nblk, 128), sl.dtype), sl], axis=0)
    if hi > chi:
        sl = jnp.concatenate(
            [sl, jnp.zeros((hi - chi, nblk, 128), sl.dtype)], axis=0)
    return sl


def _conv_chunk(srcs, w_ref, b_ref, n, nblk, mask):
    """One row chunk of a lifted conv.

    srcs: list of 3 segment sources, each a fn(piece) -> (n, nblk, 128)
    block/row-shifted slice; w_ref: (3, 3, 128, N); mask: (3, 3) bool
    of nonzero (segment, piece) lifts; returns the activated
    (n*nblk, N) f32 chunk."""
    acc = None
    for s, src in enumerate(srcs):
        for p in range(3):
            if not mask[s, p]:
                continue
            op = src(p).reshape(n * nblk, 128)
            d = jnp.dot(op, w_ref[s, p],
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    return _leaky(acc + b_ref[...])


# ---------------------------------------------------------------------------
# Kernel A: folded input (1, H2, WB*128) -> f2 (1, H2, WB*128)
#   H2 = H/2; WB = W/16 lane blocks of the feat-2 row (W/2 cols x 16
#   ch); input halves: blocks [0, WB/2) even source row, [WB/2, WB)
#   odd.  HBM crossings are 2-D rows (second-minor must be 8-aligned
#   for DMA); one in-kernel lane-split reshape produces the (rows,
#   blocks, 128) working layout.
# ---------------------------------------------------------------------------


def _unit_a_kernel(h2: int, wb: int, chunk: int,
                   x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_hbm,
                   x2_ref, x3_ref, mid_ref, insem, outsem):
    b = pl.program_id(0)
    nb1 = wb // 2
    m1, m2 = lift_mask("a1"), lift_mask("a2")
    din = pltpu.make_async_copy(x_hbm.at[b], x2_ref, insem)
    din.start()
    din.wait()
    x3_ref[...] = x2_ref[...].reshape(h2, wb, 128)

    # conv1: 3->16 stride 2 (both dims); N = 256 (two output blocks)
    for r0, n in _chunks(h2, chunk):
        srcs = [
            lambda p: _src(x3_ref, h2, nb1, 0, r0, n, 0, p),
            lambda p: _src(x3_ref, h2, nb1, nb1, r0, n, 0, p),
            lambda p: _src(x3_ref, h2, nb1, nb1, r0, n, -1, p),
        ]
        acc = _conv_chunk(srcs, w1_ref, b1_ref, n, nb1, m1)
        mid_ref[r0:r0 + n] = (
            acc.reshape(n, nb1, 256).astype(mid_ref.dtype)
            .reshape(n, wb, 128))

    # conv2: 16->16 stride 1; N = 128 (output reuses the input slab)
    for r0, n in _chunks(h2, chunk):
        srcs = [(lambda dy: lambda p:
                 _src(mid_ref, h2, wb, 0, r0, n, dy - 1, p))(dy)
                for dy in range(3)]
        acc = _conv_chunk(srcs, w2_ref, b2_ref, n, wb, m2)
        x2_ref[r0:r0 + n] = acc.astype(x2_ref.dtype).reshape(n, wb * 128)

    do = pltpu.make_async_copy(x2_ref, out_hbm.at[b], outsem)
    do.start()
    do.wait()


# ---------------------------------------------------------------------------
# Kernel B: f2 H-folded (1, H3, 2*WB3*128) -> f3 (1, H3, WB3*128)
#   H3 = H/4; WB3 = W/16 blocks of the feat-3 row (= W/4 cols x 32 ch);
#   input halves: blocks [0, WB3) even f2 row, [WB3, 2*WB3) odd.
# ---------------------------------------------------------------------------


def _unit_b_kernel(h3: int, wb3: int, chunk: int,
                   x_hbm, w3_ref, b3_ref, w4_ref, b4_ref, out_hbm,
                   x2_ref, x3_ref, mid_ref, out_ref, insem, outsem):
    b = pl.program_id(0)
    m3, m4 = lift_mask("b1"), lift_mask("b2")
    din = pltpu.make_async_copy(x_hbm.at[b], x2_ref, insem)
    din.start()
    din.wait()
    x3_ref[...] = x2_ref[...].reshape(h3, 2 * wb3, 128)

    # conv3: 16->32 stride 2; N = 128
    for r0, n in _chunks(h3, chunk):
        srcs = [
            lambda p: _src(x3_ref, h3, wb3, 0, r0, n, 0, p),
            lambda p: _src(x3_ref, h3, wb3, wb3, r0, n, 0, p),
            lambda p: _src(x3_ref, h3, wb3, wb3, r0, n, -1, p),
        ]
        acc = _conv_chunk(srcs, w3_ref, b3_ref, n, wb3, m3)
        mid_ref[r0:r0 + n] = acc.reshape(n, wb3, 128).astype(mid_ref.dtype)

    # conv4: 32->32 stride 1; N = 128
    for r0, n in _chunks(h3, chunk):
        srcs = [(lambda dy: lambda p:
                 _src(mid_ref, h3, wb3, 0, r0, n, dy - 1, p))(dy)
                for dy in range(3)]
        acc = _conv_chunk(srcs, w4_ref, b4_ref, n, wb3, m4)
        out_ref[r0:r0 + n] = acc.astype(out_ref.dtype).reshape(n, wb3 * 128)

    do = pltpu.make_async_copy(out_ref, out_hbm.at[b], outsem)
    do.start()
    do.wait()


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def _stem_raw(x: jax.Array, p2, p3, dtype) -> Tuple[jax.Array, jax.Array]:
    """x (B, H, W, 3) -> (f2 (B, H/2, W/2, 16), f3 (B, H/4, W/4, 32))."""
    bsz, h, w, _ = x.shape
    h2, w2, h3, w3 = h // 2, w // 2, h // 4, w // 4
    wb = w2 * 16 // 128
    wb3 = w3 * 32 // 128

    x4 = jnp.pad(x.astype(dtype), ((0, 0), (0, 0), (0, 0), (0, 1)))
    xf = x4.reshape(bsz, h2, wb * 128)         # free H/W space-to-depth view

    w1 = _lift(p2["c0"]["conv"]["kernel"], "a1", dtype)
    w2m = _lift(p2["c1"]["conv"]["kernel"], "a2", dtype)
    b1 = jnp.tile(p2["c0"]["conv"]["bias"].astype(jnp.float32), 16)
    b2 = jnp.tile(p2["c1"]["conv"]["bias"].astype(jnp.float32), 8)

    chunk_a = min(16, h2)
    f2f = pl.pallas_call(
        functools.partial(_unit_a_kernel, h2, wb, chunk_a),
        out_shape=jax.ShapeDtypeStruct((bsz, h2, wb * 128), dtype),
        grid=(bsz,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((h2, wb * 128), dtype),
            pltpu.VMEM((h2, wb, 128), dtype),
            pltpu.VMEM((h2, wb, 128), dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # whole-image-resident slabs + unrolled chunk temporaries
            # overflow the default 16 MB scoped-vmem budget at 320x1216
            # (18.5 MB); v5e has 128 MB VMEM
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h2 * w2 * 16 * (27 + 144),
            bytes_accessed=(x4.size + 2 * bsz * h2 * w2 * 16)
            * np.dtype(dtype).itemsize,
            transcendentals=0),
    )(xf, w1, b1[None, :], w2m, b2[None, :])

    w3m = _lift(p3["c0"]["conv"]["kernel"], "b1", dtype)
    w4m = _lift(p3["c1"]["conv"]["kernel"], "b2", dtype)
    b3 = jnp.tile(p3["c0"]["conv"]["bias"].astype(jnp.float32), 4)
    b4 = jnp.tile(p3["c1"]["conv"]["bias"].astype(jnp.float32), 4)

    f2fold = f2f.reshape(bsz, h3, 2 * wb3 * 128)   # free H-fold view
    chunk_b = min(16, h3)
    f3f = pl.pallas_call(
        functools.partial(_unit_b_kernel, h3, wb3, chunk_b),
        out_shape=jax.ShapeDtypeStruct((bsz, h3, wb3 * 128), dtype),
        grid=(bsz,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((h3, 2 * wb3 * 128), dtype),
            pltpu.VMEM((h3, 2 * wb3, 128), dtype),
            pltpu.VMEM((h3, wb3, 128), dtype),
            pltpu.VMEM((h3, wb3 * 128), dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h3 * w3 * 32 * (144 + 288),
            bytes_accessed=(f2f.size + bsz * h3 * w3 * 32)
            * np.dtype(dtype).itemsize,
            transcendentals=0),
    )(f2fold, w3m, b3[None, :], w4m, b4[None, :])

    f2 = f2f.reshape(bsz, h2, w2, 16)
    f3 = f3f.reshape(bsz, h3, w3, 32)
    return f2, f3


def _stem_xla(x: jax.Array, p2, p3, dtype) -> Tuple[jax.Array, jax.Array]:
    """Reference chain (same math as layers.ConvUnit) used for the
    backward pass and as the numerics oracle."""
    def conv(v, p, stride):
        k = p["conv"]["kernel"].astype(dtype)
        b = p["conv"]["bias"].astype(dtype)
        y = jax.lax.conv_general_dilated(
            v.astype(dtype), k, (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return _leaky(y + b)

    f2 = conv(conv(x, p2["c0"], 2), p2["c1"], 1)
    f3 = conv(conv(f2, p3["c0"], 2), p3["c1"], 1)
    return f2, f3


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_stem(x: jax.Array, p2, p3, dtype=jnp.bfloat16):
    """Levels-2+3 feature stem: (f2, f3) = ConvUnit3(ConvUnit2(x)).

    p2/p3 are the ConvUnit param subtrees {"c0": {"conv": {"kernel",
    "bias"}}, "c1": ...}; caller must check stem_eligible() first.
    """
    return _stem_raw(x, p2, p3, dtype)


def _stem_fwd(x, p2, p3, dtype):
    return _stem_raw(x, p2, p3, dtype), (x, p2, p3)


def _stem_bwd(dtype, res, g):
    x, p2, p3 = res
    _, vjp = jax.vjp(lambda xx, a, b: _stem_xla(xx, a, b, dtype), x, p2, p3)
    return vjp(g)


fused_stem.defvjp(_stem_fwd, _stem_bwd)

"""Multi-frame cost volume with frame-distance displacement dilation.

Semantics follow the reference CostVolMulti (models/CostVolMulti.lua:49-108):
given a reference feature map and K non-reference frames (ordered by
increasing temporal distance), for each window displacement (qx, qy) in a
win x win grid the displacement is dilated by the frame distance (k+1) and
mirrored for past frames (`fwd=False`). The per-displacement cost at
reference pixel p is the channel-summed product ref(p) * frame(p - q),
accumulated over frames, zero outside the overlap, normalized by
C * num_frames. Output channel index i enumerates qx (outer) then qy
(inner) — i = qx_idx * win + qy_idx (CostVolMulti.lua:65-93).

Layout: NHWC; output (B, H, W, win*win).

This op is linear in each input, so plain autodiff reproduces the
reference's hand-written backward (CostVolMulti.lua:111-181) exactly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _displacements(win: int, dilation: int, fwd: bool) -> np.ndarray:
    """(win*win, 2) int array of (qy, qx) in reference channel order."""
    n = (win - 1) // 2
    sign = 1 if fwd else -1
    disp = []
    for qx in range(-n, n + 1):
        for qy in range(-n, n + 1):
            disp.append((sign * qy * dilation, sign * qx * dilation))
    return np.asarray(disp, np.int32)


def cost_volume(ref: jax.Array, frame: jax.Array, win: int, dilation: int = 1,
                fwd: bool = True, unroll: bool = False,
                use_pallas: bool = False) -> jax.Array:
    """Single-frame cost volume (one term of `cost_volume_multi`, without the
    final normalization)."""
    if ref.shape != frame.shape:
        raise ValueError(f"shape mismatch {ref.shape} vs {frame.shape}")
    import os

    from .layout import env_flag
    # experiment override: B2F_CV_IMPL=pallas|unroll|scan forces the
    # implementation regardless of the model's use_pallas flag
    impl = os.environ.get("B2F_CV_IMPL", "").strip().lower()
    if impl == "unroll":
        use_pallas, unroll = False, True
    elif impl == "scan":
        use_pallas, unroll = False, False
    elif impl == "pallas":
        use_pallas = True
    # tiny pyramid levels are kernel-launch/DMA-latency bound in the
    # fused kernel; below this pixel count, the unrolled XLA form (which
    # fuses into neighbors) takes over (B2F_CV_MIN_HW, measured A/B).
    # An explicit B2F_CV_IMPL force wins over the gate.
    min_hw = 0 if impl else int(os.environ.get("B2F_CV_MIN_HW", "0"))
    if use_pallas and ref.shape[1] * ref.shape[2] < min_hw:
        use_pallas, unroll = False, True
    if use_pallas and (jax.default_backend() == "tpu"
                       or env_flag("B2F_FORCE_PALLAS")):
        # only on real TPU by default: the CPU fallback would run the
        # kernel in the (slow) interpreter; the XLA path is the CPU
        # reference anyway. B2F_FORCE_PALLAS=1 forces the kernel path
        # (interpret mode off-TPU) for SPMD-composition tests.
        from .cost_volume_pallas import cost_volume_pallas, fits_vmem
        b, h, w, c = ref.shape
        if fits_vmem(h, w, c, win, dilation, ref.dtype):
            return cost_volume_pallas(ref, frame, win, dilation, fwd)
    b, h, w, c = ref.shape
    n = (win - 1) // 2
    pad = n * dilation
    disp = _displacements(win, dilation, fwd)

    padded = jnp.pad(frame, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    if unroll:
        outs = []
        for qy, qx in disp:
            shifted = jax.lax.dynamic_slice(
                padded, (0, pad - int(qy), pad - int(qx), 0), (b, h, w, c))
            outs.append(jnp.sum(ref * shifted, axis=-1))
        return jnp.stack(outs, axis=-1)

    disp_j = jnp.asarray(disp)

    def body(carry, q):
        shifted = jax.lax.dynamic_slice(
            padded, (0, pad - q[0], pad - q[1], 0), (b, h, w, c))
        return carry, jnp.sum(ref * shifted, axis=-1)

    _, costs = jax.lax.scan(body, None, disp_j)  # (win*win, B, H, W)
    return jnp.moveaxis(costs, 0, -1)


def cost_volume_multi(ref: jax.Array, frames: Sequence[jax.Array], win: int,
                      fwd: bool = True, unroll: bool = False,
                      use_pallas: bool = False) -> jax.Array:
    """Multi-frame cost volume w.r.t. `ref`.

    `frames[k]` is the frame at temporal distance k+1 from the reference
    (future if fwd, past otherwise); its displacements are dilated by k+1
    and mirrored for past frames (CostVolMulti.lua:62-74).
    """
    c = ref.shape[-1]
    acc = None
    for k, frame in enumerate(frames):
        cv = cost_volume(ref, frame, win, dilation=k + 1, fwd=fwd,
                         unroll=unroll, use_pallas=use_pallas)
        acc = cv if acc is None else acc + cv
    return acc / (c * len(frames))

"""Differentiable image ops (pure-JAX reference implementations + Pallas).

Every op ships a pure jax.numpy/lax implementation (the correctness
reference, fully autodiff-able) and, where it is a training hot spot, a
fused Pallas TPU kernel validated against it. All tensors are NHWC.
"""

from .warp import warp_bilinear
from .cost_volume import cost_volume, cost_volume_multi
from .pyramid import (
    avg_pool2,
    subsample2,
    upsample_nearest2x,
    upsample_bilinear2x,
    resize_bilinear,
    resize_nearest,
    spatial_softmax,
)

__all__ = [
    "warp_bilinear",
    "cost_volume",
    "cost_volume_multi",
    "avg_pool2",
    "subsample2",
    "upsample_nearest2x",
    "upsample_bilinear2x",
    "resize_bilinear",
    "resize_nearest",
    "spatial_softmax",
]

"""Pyramid resampling ops with Torch-parity numerics (NHWC).

  avg_pool2             nn.SpatialAveragePooling(2,2,2,2)
  subsample2            nn.SpatialAveragePooling(1,1,2,2)  (train.lua:282)
  upsample_nearest2x    nn.SpatialUpSamplingNearest(2)
  upsample_bilinear2x   nn.SpatialUpSamplingBilinear(2) — align-corners
                        (legacy THNN convention: src = dst*(in-1)/(out-1))
  resize_bilinear       ScaleBHWD semantics (extras/spybhwd/ScaleBHWD.cu:6-20)
  resize_nearest        torch image.scale(..., 'simple') convention
  spatial_softmax       nn.SpatialSoftMax over the channel axis
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def avg_pool2(x: jax.Array) -> jax.Array:
    """2x2 mean pooling, stride 2 (floor semantics for odd sizes)."""
    b, h, w, c = x.shape
    x = x[:, : (h // 2) * 2, : (w // 2) * 2]
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return s * 0.25


def subsample2(x: jax.Array) -> jax.Array:
    """1x1 kernel stride-2 'pooling' == top-left subsampling."""
    return x[:, ::2, ::2, :]


def upsample_nearest2x(x: jax.Array) -> jax.Array:
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _axis_linear(x: jax.Array, out_size: int, axis: int) -> jax.Array:
    """Align-corners 1-D linear interpolation along `axis`."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if in_size == 1:
        return jnp.repeat(x, out_size, axis=axis)
    pos = jnp.arange(out_size, dtype=jnp.float32) * ((in_size - 1) / max(out_size - 1, 1))
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    frac = (pos - i0).astype(x.dtype)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape)
    return a * (1 - frac) + b * frac


def resize_bilinear(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Align-corners bilinear resize (separable; differentiable)."""
    return _axis_linear(_axis_linear(x, out_h, axis=1), out_w, axis=2)


def upsample_bilinear2x(x: jax.Array) -> jax.Array:
    return resize_bilinear(x, x.shape[1] * 2, x.shape[2] * 2)


def resize_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest resize with src = floor(dst * in/out) (torch 'simple')."""
    h, w = x.shape[1], x.shape[2]
    ys = jnp.minimum((jnp.arange(out_h) * (h / out_h)).astype(jnp.int32), h - 1)
    xs = jnp.minimum((jnp.arange(out_w) * (w / out_w)).astype(jnp.int32), w - 1)
    return jnp.take(jnp.take(x, ys, axis=1), xs, axis=2)


def spatial_softmax(x: jax.Array) -> jax.Array:
    """Softmax over the channel (last) axis at each spatial position."""
    return jax.nn.softmax(x, axis=-1)

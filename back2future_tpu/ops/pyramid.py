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

import functools

import jax
import jax.numpy as jnp
import numpy as np


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


@functools.lru_cache(maxsize=128)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) align-corners linear interpolation matrix (<=2 nnz/row)."""
    pos = np.arange(out_size) * ((in_size - 1) / max(out_size - 1, 1))
    i0 = np.floor(pos).astype(np.int64)
    i1 = np.minimum(i0 + 1, in_size - 1)
    fr = (pos - i0).astype(np.float32)
    m = np.zeros((out_size, in_size), np.float32)
    np.add.at(m, (np.arange(out_size), i0), 1.0 - fr)
    np.add.at(m, (np.arange(out_size), i1), fr)
    return m


@functools.lru_cache(maxsize=128)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) one-hot matrix, src = floor(dst*in/out) (torch 'simple')."""
    idx = np.minimum((np.arange(out_size) * (in_size / out_size)).astype(np.int64),
                     in_size - 1)
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), idx] = 1.0
    return m


def _apply_axis_matrix(x: jax.Array, m: np.ndarray, axis: int) -> jax.Array:
    """Resample along `axis` by the constant matrix `m` (out, in).

    Sizes are static, so the resample is a small dense matmul with a
    compile-time-constant (<=2 nnz/row) matrix — it runs on the MXU
    instead of lowering to a (slow on TPU) gather."""
    mj = jnp.asarray(m, x.dtype)
    xm = jnp.moveaxis(x, axis, -1)
    y = jax.lax.dot_general(
        xm, mj, ((( xm.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.moveaxis(y, -1, axis)


def _axis_linear(x: jax.Array, out_size: int, axis: int) -> jax.Array:
    """Align-corners 1-D linear interpolation along `axis`."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if in_size == 1:
        return jnp.repeat(x, out_size, axis=axis)
    return _apply_axis_matrix(x, _interp_matrix(in_size, out_size), axis)


def resize_bilinear(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Align-corners bilinear resize (separable; differentiable)."""
    return _axis_linear(_axis_linear(x, out_h, axis=1), out_w, axis=2)


def upsample_bilinear2x(x: jax.Array) -> jax.Array:
    return resize_bilinear(x, x.shape[1] * 2, x.shape[2] * 2)


def resize_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest resize with src = floor(dst * in/out) (torch 'simple')."""
    h, w = x.shape[1], x.shape[2]
    x = _apply_axis_matrix(x, _nearest_matrix(h, out_h), 1)
    return _apply_axis_matrix(x, _nearest_matrix(w, out_w), 2)


def spatial_softmax(x: jax.Array) -> jax.Array:
    """Softmax over the channel (last) axis at each spatial position."""
    return jax.nn.softmax(x, axis=-1)

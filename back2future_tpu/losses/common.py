"""Shared helpers for the criterion library."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def coord_grid(b: int, h: int, w: int, dtype=jnp.float32):
    """1-indexed pixel-coordinate image (B, H, W, 2) = (x, y)
    (e.g. criterions/OBCCriterion.lua:54-56)."""
    x = jnp.broadcast_to(jnp.arange(1, w + 1, dtype=dtype)[None, None, :], (b, h, w))
    y = jnp.broadcast_to(jnp.arange(1, h + 1, dtype=dtype)[None, :, None], (b, h, w))
    return jnp.stack([x, y], axis=-1)


def in_image_mask(tcoord, h: int, w: int):
    """(B,H,W) float mask of target coords inside [1,w]x[1,h]
    (criterions/OBCCriterion.lua:97-101). Non-differentiable by construction."""
    tx, ty = tcoord[..., 0], tcoord[..., 1]
    m = (tx >= 1) & (ty >= 1) & (tx <= w) & (ty <= h)
    return m.astype(tcoord.dtype)


def gaussian3_kernel() -> np.ndarray:
    """3x3 normalized gaussian of torch image.gaussian{size=3,normalize=true}
    (sigma = 0.25 * size; criterions/MSSIML1Criterion.lua:36)."""
    d = np.array([-1.0, 0.0, 1.0])
    g = np.exp(-((d / 0.75) ** 2) / 2.0)
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def gaussian3_center_weight() -> float:
    return float(gaussian3_kernel()[1, 1])


def depthwise_gauss3(x: jax.Array) -> jax.Array:
    """Replication-pad 1 + depthwise 3x3 gaussian filter (NHWC), matching the
    reference's SpatialReplicationPadding + per-channel SpatialConvolution
    (criterions/MSSIML1Criterion.lua:37-43)."""
    c = x.shape[-1]
    k = jnp.asarray(gaussian3_kernel())[:, :, None, None]          # (3,3,1,1)
    k = jnp.broadcast_to(k, (3, 3, 1, c)).astype(x.dtype)          # HWIO depthwise
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return jax.lax.conv_general_dilated(
        xp, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def fwd_diff_y(x: jax.Array) -> jax.Array:
    """Forward difference along H; zeros in the last row
    (criterions/SmoothnessCriterion.lua:45)."""
    d = x[:, 1:] - x[:, :-1]
    return jnp.pad(d, ((0, 0), (0, 1), (0, 0), (0, 0)))


def fwd_diff_x(x: jax.Array) -> jax.Array:
    """Forward difference along W; zeros in the last column."""
    d = x[:, :, 1:] - x[:, :, :-1]
    return jnp.pad(d, ((0, 0), (0, 0), (0, 1), (0, 0)))

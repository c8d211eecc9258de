"""Shared flax building blocks with Torch-parity initialization.

ConvUnit and Decoder mirror the reference blocks (models/pwc.lua:58-85);
initialization replicates torch nn.SpatialConvolution's default
uniform(-1/sqrt(kW*kH*nIn), +1/sqrt(kW*kH*nIn)) for weights AND biases, so
training-from-scratch dynamics match the Torch7 runs.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def torch_conv_init(kernel_hw: tuple, in_features: int):
    """Weight/bias initializers matching torch nn.SpatialConvolution:reset()."""
    fan_in = kernel_hw[0] * kernel_hw[1] * in_features
    stdv = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)

    return init


def _stem_im2col_enabled() -> bool:
    import os

    return os.environ.get("B2F_STEM_IM2COL", "").strip().lower() not in (
        "", "0", "false", "no", "off")


class _Im2ColConv(nn.Module):
    """3x3 conv expressed as explicit patch-extraction + one matmul.

    Experimental alternative lowering for the small-C stride-2 stem
    convs, whose XLA conv lowering runs ~5x off the HBM roofline at
    C_in=3/16 (BENCHMARKS.md). Parameter names/shapes are identical to
    the nn.Conv it replaces ("kernel"/"bias"), so checkpoints and the
    .t7 converter are unaffected; numerics agree to bf16 tolerance
    (same MXU contraction, different accumulation order)."""
    features: int
    kernel: int
    stride: int
    dtype: jnp.dtype
    kernel_init: callable = nn.initializers.lecun_normal()
    bias_init: callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel, self.stride
        in_f = x.shape[-1]
        w = self.param("kernel", self.kernel_init, (k, k, in_f, self.features))
        b = self.param("bias", self.bias_init, (self.features,))
        pad = k // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        ho = (x.shape[1] + s - 1) // s
        wo = (x.shape[2] + s - 1) // s
        cols = [xp[:, dy:dy + s * ho:s, dx:dx + s * wo:s, :]
                for dy in range(k) for dx in range(k)]
        patches = jnp.concatenate(cols, axis=-1).astype(self.dtype)
        wm = w.reshape(k * k * in_f, self.features).astype(self.dtype)
        return patches @ wm + b.astype(self.dtype)


class Conv(nn.Module):
    """3x3 (default) conv, SAME padding, torch init, NHWC."""
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        init = torch_conv_init((self.kernel, self.kernel), in_f)
        if self.stride > 1 and in_f <= 16 and _stem_im2col_enabled():
            return _Im2ColConv(self.features, self.kernel, self.stride,
                               self.dtype, kernel_init=init, bias_init=init,
                               name="conv")(x)
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            kernel_init=init, bias_init=init,
            dtype=self.dtype, name="conv",
        )(x)


def leaky_relu(x):
    """nn.LeakyReLU(0.2) (models/pwc.lua:61,63)."""
    return jnp.where(x >= 0, x, 0.2 * x)


class ConvUnit(nn.Module):
    """conv3x3(stride s) + LeakyReLU + conv3x3 + LeakyReLU
    (models/pwc.lua:58-65)."""
    features: int
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = leaky_relu(Conv(self.features, stride=self.stride,
                            dtype=self.dtype, name="c0")(x))
        x = leaky_relu(Conv(self.features, dtype=self.dtype, name="c1")(x))
        return x


class Decoder(nn.Module):
    """Six 3x3 convs 128-128-96-64-32-2 with LeakyReLU between
    (models/pwc.lua:76-85; d=16)."""
    dtype: jnp.dtype = jnp.float32
    widths: Sequence[int] = (128, 128, 96, 64, 32)
    out_features: int = 2

    @nn.compact
    def __call__(self, x):
        for i, wdt in enumerate(self.widths):
            x = leaky_relu(Conv(wdt, dtype=self.dtype, name=f"c{i}")(x))
        return Conv(self.out_features, dtype=self.dtype, name="out")(x)

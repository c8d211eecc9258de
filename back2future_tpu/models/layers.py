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

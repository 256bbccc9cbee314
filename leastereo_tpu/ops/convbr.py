"""Conv + BatchNorm + ReLU building blocks (NHWC / NDHWC, TPU-first).

The reference's universal primitive is ``ConvBR`` = Conv(bias=False) + BN +
ReLU with Kaiming(fan_out) / constant init (reference
``models/operations_2d.py:31-54``, ``models/operations_3d.py:31-55``). Here it
is a single Flax module parameterised over the number of spatial dims, with
channels-last layouts so XLA tiles the convolutions onto the MXU.

Precision policy: parameters and BN statistics live in float32; compute dtype
is configurable (bfloat16 by default on TPU). BN matches torch semantics
(momentum 0.1 on running stats == flax momentum 0.9; eps 1e-5; biased batch
variance for normalization).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .conv3d import conv3d_decomposed

__all__ = ["ConvBR", "conv_init"]

# Kaiming-normal, fan_out, relu gain — parity with torch
# nn.init.kaiming_normal_(w, mode='fan_out', nonlinearity='relu')
# (reference models/operations_2d.py:48-54).
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class _Conv3D(nn.Module):
    """Stride-1 3D conv computed depth-decomposed (see ``ops/conv3d.py``).

    Drop-in for ``nn.Conv`` (same ``kernel`` param name/shape/init, DHWIO),
    chosen by ConvBR for every stride-1 3D convolution: XLA's native 3D conv
    lowering on TPU leaves ~1.5x on the table vs the folded-2D form.
    """

    features: int
    kernel_size: tuple[int, int, int]
    padding: tuple[tuple[int, int], ...]
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            conv_init,
            (*self.kernel_size, x.shape[-1], self.features),
            jnp.float32,
        )
        return conv3d_decomposed(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            spatial_padding=(self.padding[1], self.padding[2]),
            depth_padding=self.padding[0],
        )


class ConvBR(nn.Module):
    """Conv(bias=False) + BatchNorm + ReLU over NHWC (2D) or NDHWC (3D).

    Mirrors reference ``ConvBR`` (``models/operations_2d.py:31``) including the
    ``bn``/``relu`` gates used by the network output heads
    (``retrain/new_model_2d.py:135``, ``retrain/skip_model_3d.py:132``).
    """

    features: int
    kernel_size: Sequence[int]  # e.g. (3, 3) or (3, 3, 3)
    strides: Sequence[int] | int = 1
    padding: int | Sequence[tuple[int, int]] = 0
    use_bn: bool = True
    use_relu: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        strides = self.strides
        if isinstance(strides, int):
            strides = (strides,) * len(self.kernel_size)
        padding = self.padding
        if isinstance(padding, int):
            # torch-style symmetric numeric padding: NOT XLA 'SAME' — for
            # strided convs (feature stem1, stride 3 pad 1,
            # reference retrain/new_model_2d.py:94) the two differ.
            padding = ((padding, padding),) * len(self.kernel_size)
        if len(self.kernel_size) == 3 and tuple(strides) == (1, 1, 1):
            x = _Conv3D(
                features=self.features,
                kernel_size=tuple(self.kernel_size),
                padding=tuple(padding),
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                features=self.features,
                kernel_size=tuple(self.kernel_size),
                strides=tuple(strides),
                padding=padding,
                use_bias=False,
                kernel_init=conv_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,  # torch momentum 0.1
                epsilon=1e-5,
                dtype=jnp.float32,  # normalize/stat math in fp32
                param_dtype=jnp.float32,
                name="bn",
            )(x)
            x = x.astype(self.dtype)
        if self.use_relu:
            x = nn.relu(x)
        return x

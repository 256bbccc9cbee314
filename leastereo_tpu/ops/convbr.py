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

Inference BN folding: in eval mode the BN affine is constant per channel, so
it is folded into the convolution — kernel scaled by ``scale/sqrt(var+eps)``
(a (Cout,)-broadcast on the tiny kernel) and the bias applied in the conv
epilogue. Same algebra as normalize-then-affine; removes the separate
full-volume BN pass XLA sometimes fails to fuse. Train mode keeps the
batch-statistics path bit-for-bit unchanged.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .conv3d import conv3d_decomposed

__all__ = ["ConvBR", "conv_init", "KernelParam", "BNAffine"]

# Kaiming-normal, fan_out, relu gain — parity with torch
# nn.init.kaiming_normal_(w, mode='fan_out', nonlinearity='relu')
# (reference models/operations_2d.py:48-54).
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class KernelParam(nn.Module):
    """Holds a conv kernel param named ``kernel`` — nested under a module
    named ``conv`` this reproduces ``nn.Conv``'s ``conv/kernel`` param path."""

    shape: tuple[int, ...]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", conv_init, self.shape, jnp.float32)


class BNAffine(nn.Module):
    """Declares the ``nn.BatchNorm`` variable tree (scale/bias params +
    mean/var batch_stats, identical names/shapes/inits) and returns the
    folded eval-mode per-channel affine ``(w, b)`` with
    ``w = scale * rsqrt(var + eps)``, ``b = bias - mean * w`` (fp32)."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (c,), jnp.float32)
        var = self.variable("batch_stats", "var", nn.initializers.ones, None, (c,), jnp.float32)
        w = scale * jax.lax.rsqrt(var.value + self.epsilon)
        return w, bias - mean.value * w


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

        kernel = KernelParam(
            (*self.kernel_size, x.shape[-1], self.features), name="conv"
        )()
        fold = self.use_bn and not train
        if fold:
            w, b = BNAffine(self.features, name="bn")()
            kernel = kernel * w  # fp32 fold, then one cast

        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if len(self.kernel_size) == 3 and tuple(strides) == (1, 1, 1):
            x = conv3d_decomposed(
                x,
                kernel,
                spatial_padding=(tuple(padding)[1], tuple(padding)[2]),
                depth_padding=tuple(padding)[0],
            )
        else:
            x = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=tuple(strides),
                padding=tuple(padding),
                dimension_numbers=("NHWC", "HWIO", "NHWC")
                if len(self.kernel_size) == 2
                else ("NDHWC", "DHWIO", "NDHWC"),
            )
        if fold:
            x = x + b.astype(self.dtype)
        elif self.use_bn:
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

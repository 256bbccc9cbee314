"""Depth-decomposed 3D convolution for TPU.

XLA's native 3D convolution lowering on TPU is far off speed-of-light for
this model's shapes (measured 16.3 TFLOP/s for the matching stem vs
24.2 TFLOP/s decomposed, on v5e). A stride-1 KxKxK convolution over
``(B, D, H, W, C)`` decomposes exactly into K 2D convolutions with the depth
axis folded into the batch::

    y[:, d] = sum_kd  conv2d(x[:, d + kd - pd], kernel[kd])

so each 2D conv runs as one big implicit GEMM with batch ``B*D`` — the form
the TPU conv emitter tiles best — and the depth shifts become fused pad/slice
ops. Exact same arithmetic as ``lax.conv_general_dilated`` in NDHWC
(same multiply set, summation reassociated over kd only).

Used by :class:`~leastereo_tpu.ops.convbr.ConvBR` for every 3D conv in the
matching net (reference ``models/operations_3d.py:31-55`` gets these from
cuDNN; this is the TPU-native equivalent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["conv3d_decomposed"]


def conv3d_decomposed(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    spatial_padding: tuple[tuple[int, int], tuple[int, int]],
    depth_padding: tuple[int, int],
) -> jnp.ndarray:
    """Stride-1 3D convolution ``(B, D, H, W, Cin) -> (B, D', H', W', Cout)``.

    Args:
      x: NDHWC input.
      kernel: ``(KD, KH, KW, Cin, Cout)`` (DHWIO).
      spatial_padding: ((ph, ph), (pw, pw)) numeric padding for H/W.
      depth_padding: (pd_lo, pd_hi) numeric padding for D.
    """
    b, d, h, w, c = x.shape
    kd = kernel.shape[0]
    pd_lo, pd_hi = depth_padding
    d_out = d + pd_lo + pd_hi - kd + 1

    xb = x.reshape(b * d, h, w, c)
    out = None
    for k in range(kd):
        y = jax.lax.conv_general_dilated(
            xb,
            kernel[k],
            window_strides=(1, 1),
            padding=spatial_padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y.reshape(b, d, y.shape[1], y.shape[2], y.shape[3])
        # Output plane d' consumes input plane d' + k - pd_lo.
        lo = k - pd_lo  # input index for output plane 0
        # Valid output planes: 0 <= lo + d' < d  =>  d' in [-lo, d - lo).
        start = max(0, -lo)
        stop = min(d_out, d - lo)
        ysl = y[:, start + lo : stop + lo]
        if start > 0 or stop < d_out:
            ysl = jnp.pad(ysl, ((0, 0), (start, d_out - stop), (0, 0), (0, 0), (0, 0)))
        out = ysl if out is None else out + ysl
    return out

"""Interpolation ops with exact PyTorch ``F.interpolate`` semantics, TPU-first.

The reference model's accuracy depends on bit-level interpolation semantics
(see reference ``retrain/new_model_2d.py:47`` — ``align_corners=True`` cell
resizes with the odd-dimension ``scale_dimension`` rule — and
``models/build_model_2d.py:53`` — ``align_corners=False`` trilinear upsample
in the disparity head). ``jax.image.resize`` implements neither, so we build
linear interpolation from scratch.

TPU-first design: instead of gathers (slow on TPU), each axis resize is a
dense matmul with a precomputed ``(out_size, in_size)`` interpolation matrix
(≤2 non-zeros per row). XLA lowers these to MXU matmuls and fuses the
per-axis contractions; for the sizes in this model (≤ ~1k) this is far
faster than gather-based resampling and trivially differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "scale_dimension",
    "interp_matrix",
    "resize2d",
    "resize3d",
    "upsample2x_2d",
    "upsample2x_3d",
]


def scale_dimension(dim: int, scale: float) -> int:
    """Reference's odd-dimension-aware scaling rule.

    Mirrors ``Cell.scale_dimension`` (reference ``retrain/new_model_2d.py:38-39``):
    odd dims map ``d -> (d-1)*s + 1`` so that align_corners=True resizing stays
    exactly on the corner grid; even dims map ``d -> int(d*s)``.
    """
    return int((float(dim) - 1.0) * scale + 1.0) if dim % 2 == 1 else int(float(dim) * scale)


@functools.lru_cache(maxsize=None)
def interp_matrix(in_size: int, out_size: int, align_corners: bool, dtype=np.float32) -> np.ndarray:
    """Dense ``(out_size, in_size)`` 1-D linear interpolation matrix.

    Row ``o`` holds the two lerp weights for output sample ``o``:

    * align_corners=True:  ``src = o * (in-1) / (out-1)``
    * align_corners=False: ``src = max((o + 0.5) * in/out - 0.5, 0)``

    matching PyTorch's bilinear/trilinear kernels (verified against torch in
    ``tests/test_resize.py``).
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=dtype)
    o = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = o * (in_size - 1) / max(out_size - 1, 1) if out_size > 1 else o * 0.0
    else:
        src = (o + 0.5) * (in_size / out_size) - 0.5
        src = np.maximum(src, 0.0)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    w_lo = 1.0 - w_hi
    m = np.zeros((out_size, in_size), dtype=np.float64)
    m[np.arange(out_size), lo] += w_lo
    m[np.arange(out_size), hi] += w_hi
    return m.astype(dtype)


def _resize_axis(x: jnp.ndarray, axis: int, out_size: int, align_corners: bool) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = jnp.asarray(interp_matrix(in_size, out_size, align_corners), dtype=x.dtype)
    # Contract the resized axis against the interp matrix; MXU-friendly.
    # precision=HIGHEST: sub-pixel disparity accuracy depends on exact lerp
    # weights — the default TPU bf16 matmul costs ~1e-2 absolute error, and
    # these contractions are a negligible share of model FLOPs.
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.matmul(moved, m.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out, -1, axis)


def resize2d(x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = True) -> jnp.ndarray:
    """Bilinear resize of an NHWC tensor to ``out_hw``.

    Parity with torch ``F.interpolate(x, out_hw, mode='bilinear',
    align_corners=...)`` (reference ``retrain/new_model_2d.py:47-50``).
    """
    b, h, w, c = x.shape
    x = _resize_axis(x, 1, out_hw[0], align_corners)
    x = _resize_axis(x, 2, out_hw[1], align_corners)
    return x


def resize3d(x: jnp.ndarray, out_dhw: tuple[int, int, int], align_corners: bool = True) -> jnp.ndarray:
    """Trilinear resize of an NDHWC tensor to ``out_dhw``.

    Parity with torch trilinear ``F.interpolate`` (reference
    ``retrain/skip_model_3d.py:48-51``, ``models/build_model_2d.py:53``).
    """
    x = _resize_axis(x, 1, out_dhw[0], align_corners)
    x = _resize_axis(x, 2, out_dhw[1], align_corners)
    x = _resize_axis(x, 3, out_dhw[2], align_corners)
    return x


def upsample2x_2d(x: jnp.ndarray, align_corners: bool = True) -> jnp.ndarray:
    """2x bilinear upsample (NHWC) with the reference's odd-dim rule."""
    _, h, w, _ = x.shape
    return resize2d(x, (scale_dimension(h, 2), scale_dimension(w, 2)), align_corners)


def upsample2x_3d(x: jnp.ndarray, align_corners: bool = True) -> jnp.ndarray:
    """2x trilinear upsample (NDHWC) with the reference's odd-dim rule."""
    _, d, h, w, _ = x.shape
    return resize3d(
        x,
        (scale_dimension(d, 2), scale_dimension(h, 2), scale_dimension(w, 2)),
        align_corners,
    )

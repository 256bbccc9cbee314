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
def interp_matrix(in_size: int, out_size: int, align_corners: bool, dtype=np.float64) -> np.ndarray:
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


def _resize_axes(x: jnp.ndarray, axes: tuple[int, ...], out_sizes: tuple[int, ...], align_corners: bool) -> jnp.ndarray:
    """Resize several axes with ONE final transpose.

    Each contraction (``dot_general`` over the resized axis, fp32-accurate —
    sub-pixel disparity accuracy depends on exact lerp weights, and the TPU's
    default bf16 matmul costs ~1e-2 absolute error) moves the produced axis to
    the end; a single transpose at the end restores logical order. The naive
    moveaxis-matmul-moveaxis per axis costs 2 HBM copies per axis — measured
    at ~1/3 of total inference time — this shape costs at most one.
    """
    order = list(range(x.ndim))  # logical axis id at each physical position
    for axis, out_size in zip(axes, out_sizes):
        pos = order.index(axis)
        in_size = x.shape[pos]
        if in_size == out_size:
            continue
        m = jnp.asarray(interp_matrix(in_size, out_size, align_corners), dtype=x.dtype)
        x = jax.lax.dot_general(
            x,
            m,
            dimension_numbers=(((pos,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        order.pop(pos)
        order.append(axis)
    perm = [order.index(i) for i in range(len(order))]
    if perm != list(range(len(order))):
        x = jnp.transpose(x, perm)
    return x


def resize2d(x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = True) -> jnp.ndarray:
    """Bilinear resize of an NHWC tensor to ``out_hw``.

    Parity with torch ``F.interpolate(x, out_hw, mode='bilinear',
    align_corners=...)`` (reference ``retrain/new_model_2d.py:47-50``).
    """
    return _resize_axes(x, (1, 2), tuple(out_hw), align_corners)


def resize3d(x: jnp.ndarray, out_dhw: tuple[int, int, int], align_corners: bool = True) -> jnp.ndarray:
    """Trilinear resize of an NDHWC tensor to ``out_dhw``.

    Parity with torch trilinear ``F.interpolate`` (reference
    ``retrain/skip_model_3d.py:48-51``, ``models/build_model_2d.py:53``).
    """
    return _resize_axes(x, (1, 2, 3), tuple(out_dhw), align_corners)


def upsample3x_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 3x linear upsample along ``axis``, align_corners=False.

    Phase-decomposed: output position ``3i + r`` has source ``i + (r-1)/3``,
    so each phase is a fixed 2-tap blend of ``x`` and a +/-1 shift — pure
    shift/add/interleave, no matmuls or transposes. Identical math to
    ``interp_matrix(n, 3n, align_corners=False)`` (covered by the torch-parity
    resize tests); used by the disparity head's 3x trilinear upsample
    (reference models/build_model_2d.py:52-53).
    """
    n = x.shape[axis]

    def shift(arr, delta):  # clamp-padded shift along `axis`
        lo = [slice(None)] * arr.ndim
        if delta == -1:  # x[i-1]
            lo[axis] = slice(0, n - 1)
            first = [slice(None)] * arr.ndim
            first[axis] = slice(0, 1)
            return jnp.concatenate([arr[tuple(first)], arr[tuple(lo)]], axis=axis)
        lo[axis] = slice(1, n)  # x[i+1]
        last = [slice(None)] * arr.ndim
        last[axis] = slice(n - 1, n)
        return jnp.concatenate([arr[tuple(lo)], arr[tuple(last)]], axis=axis)

    third = jnp.asarray(1.0 / 3.0, x.dtype)
    two_third = jnp.asarray(2.0 / 3.0, x.dtype)
    r0 = third * shift(x, -1) + two_third * x
    r2 = two_third * x + third * shift(x, +1)
    out = jnp.stack([r0, x, r2], axis=axis + 1)
    return out.reshape(x.shape[: axis] + (3 * n,) + x.shape[axis + 1 :])


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

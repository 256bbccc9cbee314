"""Stereo feature/cost-volume construction, TPU-first.

Reference semantics (``retrain/LEAStereo.py:30-48``, ``models/build_model.py:56-65``):
a zero-initialised 5-D volume over candidate disparities ``d`` in
``[0, maxdisp/3)``; at disparity ``d`` the left features are written at
columns ``w >= d`` and the right features are written shifted by ``d``
(``vol[:, :C, d, :, d:] = x[..., d:]``, ``vol[:, C:, d, :, d:] = y[..., :-d]``).
Columns ``w < d`` stay zero *in both halves*.

TPU-first: the volume is laid out **NDHWC** ``(B, D, H, W, 2C)`` so the 3-D
matching convolutions hit the MXU in channels-last form. Construction avoids
per-disparity dynamic writes: the right half is one batched gather along W
(indices ``w - d`` clipped, zero-masked), the left half a broadcast + mask —
both fuse into a single pass over HBM under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["build_cost_volume"]


def build_cost_volume(left: jnp.ndarray, right: jnp.ndarray, num_disp: int) -> jnp.ndarray:
    """Build the concat feature volume.

    Args:
      left, right: NHWC feature maps ``(B, H, W, C)`` (1/3-resolution features).
      num_disp: number of candidate disparities at feature resolution
        (``maxdisp // 3`` in the reference).

    Returns:
      NDHWC volume ``(B, num_disp, H, W, 2C)`` with
      ``vol[b, d, h, w] = concat(left[b, h, w], right[b, h, w - d])`` where
      ``w >= d``, zeros elsewhere (both halves) — parity with
      ``retrain/LEAStereo.py:42-48``.
    """
    b, h, w, c = left.shape
    d = jnp.arange(num_disp)[:, None]  # (D, 1)
    wi = jnp.arange(w)[None, :]  # (1, W)
    src = wi - d  # (D, W): right-feature column feeding (d, w)
    valid = (src >= 0).astype(left.dtype)  # (D, W)
    src = jnp.clip(src, 0, w - 1)

    # One gather along W: (B, H, D, W, C) -> transpose-free via axis ordering.
    # take(right, src, axis=2) yields (B, H, D, W, C); we build directly in
    # (B, D, H, W, C) by gathering with take on a transposed view instead:
    right_dhw = jnp.take(right, src.reshape(-1), axis=2)  # (B, H, D*W, C)
    right_dhw = right_dhw.reshape(b, h, num_disp, w, c).transpose(0, 2, 1, 3, 4)
    mask = valid[None, :, None, :, None]  # (1, D, 1, W, 1)
    right_part = right_dhw * mask

    left_part = left[:, None] * mask  # (B, 1, H, W, C) * mask -> (B, D, H, W, C)
    return jnp.concatenate([left_part, right_part], axis=-1)

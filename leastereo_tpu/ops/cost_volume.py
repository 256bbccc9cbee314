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
    x = jnp.concatenate([left, right], axis=-1)  # (B, H, W, 2C)
    pad = [(0, 0), (0, 0), (0, 0), (0, 0)]

    # Static unroll over D: each disparity slice is a zero-pad of static
    # slices — no gathers, no transposes; XLA fuses the pads/concats into the
    # volume materialization in (B, D, H, W, 2C) layout directly.
    slices = []
    for d in range(num_disp):
        if d == 0:
            slices.append(x)
            continue
        left_d = left[:, :, d:]  # left columns w >= d keep their position
        right_d = right[:, :, : w - d]  # right shifted by d
        sl = jnp.concatenate([left_d, right_d], axis=-1)
        pad[2] = (d, 0)
        slices.append(jnp.pad(sl, pad))
    return jnp.stack(slices, axis=1)

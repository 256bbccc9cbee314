"""Disparity regression head: trilinear upsample + softmin + soft-argmin.

Reference semantics (``models/build_model_2d.py:27-57``): the 1-channel
matching cost ``(B, 1, D, h, w)`` is trilinearly upsampled with
``align_corners=False`` to ``(B, maxdisp, 3h, 3w)``, softmin'd over the
disparity axis, and reduced to the expectation ``sum_d d * p(d)``.

Two modes:

* ``soft_argmin`` — exact parity; materialises the upsampled volume once
  (kept in the compute dtype, softmax math in fp32).
* ``soft_argmin_fast`` — TPU-fast reordering: softmin + expectation at 1/3
  resolution first, then a bilinear 3x spatial upsample of the 1-channel
  disparity map (scaled by 3 to account for the disparity-axis upsample).
  Mathematically different from parity mode (documented in SURVEY.md §7
  "hard parts" #2) — used for high-throughput serving.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .resize import resize2d, upsample3x_axis

__all__ = ["soft_argmin", "soft_argmin_fast", "disparity_entropy"]


def _edge_shift(x: jnp.ndarray, axis: int, delta: int) -> jnp.ndarray:
    """x[i + delta] with edge replication along ``axis`` (delta in {-1, +1})."""
    n = x.shape[axis]
    sl = [slice(None)] * x.ndim
    edge = [slice(None)] * x.ndim
    if delta == -1:
        sl[axis] = slice(0, n - 1)
        edge[axis] = slice(0, 1)
        return jnp.concatenate([x[tuple(edge)], x[tuple(sl)]], axis=axis)
    sl[axis] = slice(1, n)
    edge[axis] = slice(n - 1, n)
    return jnp.concatenate([x[tuple(sl)], x[tuple(edge)]], axis=axis)


def soft_argmin(cost: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """Exact-parity disparity regression.

    Args:
      cost: ``(B, D, h, w, 1)`` NDHWC matching-net output (D = maxdisp//3).
      maxdisp: full-resolution disparity count.

    Returns:
      ``(B, 3h, 3w)`` disparity map, parity with reference ``Disp.forward``
      (``models/build_model_2d.py:52-57``).

    The trilinear align_corners=False upsample is exactly 3x in every axis,
    so it decomposes into three phase-interleaved shift-adds per axis. The
    spatial axes are upsampled with the disparity axis kept innermost (TPU
    lane dimension); the disparity-axis upsample, softmin and expectation
    are then computed phase-wise so the ``(B, maxdisp, 3h, 3w)`` tensor —
    the reference implementation's biggest memory spike — never exists:
    for phase costs ``a_r[i]`` (r in {0,1,2}, the align_corners=False 3x
    blends of adjacent low-res costs), softmin expectation over d' = 3i+r
    reassociates into sums of ``(3i+r) * exp(m - a_r[i])`` over i. Same
    real-number math as the reference, fp32 throughout: sub-pixel
    expectation accuracy is the model's headline metric.
    """
    dn = cost.shape[1]
    if maxdisp != 3 * dn:
        raise ValueError(f"maxdisp {maxdisp} != 3 * D ({cost.shape[1]})")
    x = cost[..., 0].astype(jnp.float32)  # (B, D, h, w)
    x = upsample3x_axis(x, 2)  # H
    x = upsample3x_axis(x, 3)  # W -> (B, D, 3h, 3w); w stays lane-minor

    # Disparity-axis 3x phases (align_corners=False, edge-clamped).
    xm1 = _edge_shift(x, 1, -1)
    xp1 = _edge_shift(x, 1, +1)
    third = jnp.float32(1.0 / 3.0)
    a0 = (xm1 + 2.0 * x) * third  # cost at d' = 3i
    a1 = x                        # cost at d' = 3i + 1
    a2 = (2.0 * x + xp1) * third  # cost at d' = 3i + 2

    # Softmin over all 3*D phases: p(d') = exp(m - a) / sum exp(m - a),
    # m = min over d' (numerical stabiliser, matches max-subtracted softmax).
    m = jnp.min(jnp.minimum(jnp.minimum(a0, a1), a2), axis=1, keepdims=True)
    e0 = jnp.exp(m - a0)
    e1 = jnp.exp(m - a1)
    e2 = jnp.exp(m - a2)
    i3 = 3.0 * jnp.arange(dn, dtype=jnp.float32)[None, :, None, None]
    den = jnp.sum(e0 + e1 + e2, axis=1)
    num = jnp.sum(i3 * e0 + (i3 + 1.0) * e1 + (i3 + 2.0) * e2, axis=1)
    return num / den


def soft_argmin_fast(cost: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """Fast mode: softmin at feature resolution, then upsample the disparity map.

    ~27x less softmax work and no (B, maxdisp, 3h, 3w) intermediate. The
    disparity-axis upsample folds analytically: the align_corners=False 3x
    upsample places source plane ``i`` at output ``3i + 1`` (phases 3i and
    3i+2 are 1/3-2/3 blends of neighbours), so the full-res expectation is
    ``3 * E_lowres + 1`` up to the softmax's response to interpolated (vs
    exact) costs. Without the +1 the mode carries a systematic ~1.0 px bias
    against parity mode; with it, measured |fast - parity| on trained-like
    unimodal cost volumes is ~0.01-0.15 px (``tests/test_cost_volume.py::
    test_soft_argmin_fast_characterization``). Use for high-throughput
    serving; the parity head remains the reference semantics
    (``models/build_model_2d.py:52-57``).
    """
    b, d, h, w, _ = cost.shape
    x = cost[..., 0].astype(jnp.float32)
    p = jnp.exp(-x - jnp.max(-x, axis=1, keepdims=True))
    p = p / jnp.sum(p, axis=1, keepdims=True)
    disp = jnp.arange(d, dtype=jnp.float32)[None, :, None, None]
    low = jnp.sum(p * disp, axis=1) * (maxdisp / d) + 1.0  # (B, h, w)
    up = resize2d(low[..., None], (3 * h, 3 * w), align_corners=False)[..., 0]
    return up


def disparity_entropy(cost: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """Per-pixel softmin-normalized entropy of the disparity distribution —
    a confidence map (low entropy = confident match).

    Parity with reference ``DispEntropy`` (models/build_model_2d.py:11-24)
    minus its cuda-only tensor bug: trilinear upsample to full resolution,
    entropy of softmax over disparities (NaN-masked to 0), softmin-normalized
    over the disparity axis collapsed to (B, 3h, 3w).
    """
    if maxdisp != 3 * cost.shape[1]:
        raise ValueError(f"maxdisp {maxdisp} != 3 * D ({cost.shape[1]})")
    x = cost[..., 0].astype(jnp.float32)  # (B, D, h, w)
    x = upsample3x_axis(x, 1)
    x = upsample3x_axis(x, 2)
    x = upsample3x_axis(x, 3)
    logp = jax.nn.log_softmax(x, axis=1)
    e = -jnp.sum(jnp.exp(logp) * logp, axis=1)  # (B, 3h, 3w)
    e = jnp.where(jnp.isnan(e), 0.0, e)
    # Softmin over the spatial entropy map (reference applies Softmin(dim=1)
    # to the (B, 3h, 3w) map, i.e. across rows).
    return jax.nn.softmax(-e, axis=1)

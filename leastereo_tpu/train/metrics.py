"""Evaluation metrics — jit-friendly ports of reference ``utils/metrics.py``."""

from __future__ import annotations

import jax.numpy as jnp

from .losses import validity_mask

__all__ = ["epe", "three_px_error", "bad_pixel_frac"]


def epe(pred: jnp.ndarray, target: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """Mean absolute disparity error over valid pixels."""
    mask = validity_mask(target, maxdisp)
    return jnp.sum(jnp.abs(pred - target) * mask) / jnp.maximum(jnp.sum(mask), 1)


def three_px_error(pred: jnp.ndarray, target: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """Fraction of valid pixels wrong by >=3px AND >=5% of GT
    (reference utils/metrics.py:11-21)."""
    mask = validity_mask(target, maxdisp)
    diff = jnp.abs(pred - target)
    correct = ((diff < 3) | (diff < target * 0.05)) & mask
    return 1.0 - jnp.sum(correct) / jnp.maximum(jnp.sum(mask), 1)


def bad_pixel_frac(pred: jnp.ndarray, target: jnp.ndarray, maxdisp: int, threshold: float) -> jnp.ndarray:
    """Fraction of valid pixels with |err| > threshold
    (reference utils/metrics.py:37-46)."""
    mask = validity_mask(target, maxdisp)
    diff = jnp.abs(pred - target)
    correct = (diff <= threshold) & mask
    return 1.0 - jnp.sum(correct) / jnp.maximum(jnp.sum(mask), 1)

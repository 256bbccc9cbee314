"""Training losses (reference ``train.py:116-160``, ``search.py:176-183``,
``edge_detection/edge_detection.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "validity_mask",
    "masked_smooth_l1",
    "sobel_gradients",
    "gradient_aware_loss",
    "edge_aware_smoothness_loss",
]


def validity_mask(target: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """0.001 < d < maxdisp; zeros are occlusions (reference utils/metrics.py:6-8,
    train.py:116-118)."""
    return (target > 0.001) & (target < maxdisp)


def smooth_l1(diff: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    a = jnp.abs(diff)
    return jnp.where(a < beta, 0.5 * a * a / beta, a - 0.5 * beta)


def masked_smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """Mean smooth-L1 over valid pixels — parity with
    ``F.smooth_l1_loss(disp[mask], target[mask])`` (reference train.py:148-156)."""
    mask = validity_mask(target, maxdisp)
    loss = smooth_l1(pred - target) * mask
    return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1)


def sobel_gradients(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sobel x/y gradients of a (B, H, W) map via fixed-kernel conv
    (reference edge_detection.py:32-57)."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], x.dtype)
    ky = kx.T
    img = x[..., None]  # NHWC, C=1

    def conv(img, k):
        return jax.lax.conv_general_dilated(
            img,
            k[..., None, None],
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[..., 0]

    return conv(img, kx), conv(img, ky)


def gradient_aware_loss(pred: jnp.ndarray, target: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """Smooth-L1 between prediction and GT Sobel gradients
    (reference edge_detection.py:60-65), masked by validity."""
    mask = validity_mask(target, maxdisp)
    px, py = sobel_gradients(pred)
    tx, ty = sobel_gradients(target)
    loss = (smooth_l1(px - tx) + smooth_l1(py - ty)) * mask
    return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1)


def edge_aware_smoothness_loss(pred: jnp.ndarray, target: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """|grad pred| * exp(-|grad GT|) (reference edge_detection.py:68-74)."""
    mask = validity_mask(target, maxdisp)
    px, py = sobel_gradients(pred)
    tx, ty = sobel_gradients(target)
    loss = (jnp.abs(px) * jnp.exp(-jnp.abs(tx)) + jnp.abs(py) * jnp.exp(-jnp.abs(ty))) * mask
    return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1)

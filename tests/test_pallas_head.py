"""Fused conv + soft-argmin head kernel (ops/pallas_head.py) vs the jnp path.

Interpreter mode covers the kernel math on CPU; the compiled path runs on the
TPU via bench.py / the driver's entry() check. The in-model wiring is gated by
``fused_head_supported`` (False off-TPU), so model-level CPU tests keep
exercising the XLA chain the backward also uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leastereo_tpu.ops.pallas_head import (
    _jnp_reference,
    conv_soft_argmin_pallas,
    fused_head_supported,
)
from leastereo_tpu.ops.packed3d import pack


@pytest.mark.parametrize(
    "shape",
    [
        # (b, d, h, w, c, g) with g*c = 128
        (1, 8, 16, 24, 32, 4),
        (2, 16, 16, 16, 16, 8),
        (1, 16, 24, 48, 32, 4),
    ],
)
def test_matches_jnp_reference(shape):
    b, d, h, w, c, g = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, d, h, w, c) * 0.5, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, c, 1) * 0.2, jnp.float32)
    p = pack(x, g)

    ref = _jnp_reference(p.data, k, g, c, 3 * d)
    got = conv_soft_argmin_pallas(p.data, k, g, c, 3 * d, True)
    assert got.shape == (b, 3 * h, 3 * w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


def test_edge_clamp_matches_interior():
    # A volume whose cost is constant per-disparity: every output pixel
    # (borders included) must produce the same expectation.
    b, d, h, w, c, g = 1, 8, 16, 24, 32, 4
    rng = np.random.RandomState(1)
    x = jnp.asarray(
        np.broadcast_to(rng.randn(1, d, 1, 1, c), (b, d, h, w, c)), jnp.float32
    )
    k = jnp.asarray(rng.randn(3, 3, 3, c, 1) * 0.2, jnp.float32)
    p = pack(x, g)
    out = np.asarray(conv_soft_argmin_pallas(p.data, k, g, c, 3 * d, True))
    # Interior pixels see the same stencil everywhere; compare the center
    # value to the full-reference (which handles borders the reference way).
    ref = np.asarray(_jnp_reference(p.data, k, g, c, 3 * d))
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_supported_gate():
    assert not fused_head_supported(1, 64, 128, 416, 32, 2)  # g*c != 128
    assert not fused_head_supported(1, 136, 336, 504, 32, 4)  # d > 128
    assert not fused_head_supported(1, 64, 127, 416, 32, 4)  # h % 8

"""Fused cost-volume+stem and depth-decomposed conv3d vs the reference path.

The reference path is ``conv3d_same(build_cost_volume(L, R, D), K)``
(reference ``models/build_model.py:56-65`` + ``retrain/skip_model_3d.py:137``);
the fused op must reproduce it element-exactly in fp32 (only summation
order differs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leastereo_tpu.ops.conv3d import conv3d_decomposed
from leastereo_tpu.ops.cost_volume import build_cost_volume
from leastereo_tpu.ops.fused_stem import fused_cost_volume_stem

pytestmark = pytest.mark.quick  # sub-2-minute ops/data tier


def _conv3d_ref(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@pytest.mark.parametrize(
    "b,d,h,w,cin,cout,kd",
    [
        (1, 6, 8, 10, 4, 5, 3),
        (2, 4, 5, 7, 3, 2, 3),
        (1, 5, 6, 6, 2, 3, 1),
        (1, 1, 4, 4, 2, 2, 3),  # single depth plane: both pads clip
    ],
)
def test_conv3d_decomposed_matches_native(b, d, h, w, cin, cout, kd):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, d, h, w, cin), jnp.float32)
    k = jnp.asarray(rng.randn(kd, 3, 3, cin, cout), jnp.float32)
    pd = kd // 2
    got = conv3d_decomposed(x, k, ((1, 1), (1, 1)), (pd, pd))
    if kd == 3:
        ref = _conv3d_ref(x, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
    else:
        # kd=1: equivalent to a plain per-plane 2D conv
        ref2 = jax.lax.conv_general_dilated(
            x.reshape(b * d, h, w, cin), k[0], (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).reshape(b, d, h, w, cout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref2), rtol=1e-5, atol=1e-5)


def test_conv3d_decomposed_1x1x1():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, 5, 6, 8), jnp.float32)
    k = jnp.asarray(rng.randn(1, 1, 1, 8, 3), jnp.float32)
    ref = jnp.einsum("bdhwc,cf->bdhwf", x, k[0, 0, 0])
    got = conv3d_decomposed(x, k, ((0, 0), (0, 0)), (0, 0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "b,h,w,c,f,num_disp",
    [
        (1, 8, 12, 4, 6, 5),
        (1, 6, 9, 3, 4, 9),   # num_disp == w: diagonal reaches the full width
        (2, 5, 16, 2, 3, 4),
        (1, 4, 7, 2, 2, 7),
        (1, 4, 6, 2, 2, 1),   # single disparity: both d-pads clip
        (1, 4, 6, 2, 2, 2),
    ],
)
def test_fused_stem_matches_reference_path(b, h, w, c, f, num_disp):
    rng = np.random.RandomState(2)
    left = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    right = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    kernel = jnp.asarray(rng.randn(3, 3, 3, 2 * c, f), jnp.float32)

    vol = build_cost_volume(left, right, num_disp)
    ref = _conv3d_ref(vol, kernel)
    got = fused_cost_volume_stem(left, right, kernel, num_disp)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.quick
@pytest.mark.parametrize(
    "b,h,w,c,f,num_disp,g",
    [
        (1, 8, 12, 4, 6, 8, 4),   # generic: interior + both edge planes
        (1, 6, 9, 3, 4, 9, 3),    # num_disp == w: diagonal reaches full width
        (2, 5, 16, 2, 3, 4, 2),
        (1, 4, 7, 2, 2, 6, 6),    # one tile holds every depth plane
        (1, 4, 6, 2, 2, 2, 2),    # only the two edge planes exist
    ],
)
def test_fused_stem_packed_epilogue_matches(b, h, w, c, f, num_disp, g):
    """The eval-mode slice-based packed assembly (bias+relu epilogue) ==
    relu(conv3d(volume) + bias), packed. Covers the per-diagonal left maps
    (base/q1/q0/qm1/qm2 + first/last-plane variants) that replace the
    select-tree assembly on the serving path."""
    from leastereo_tpu.ops.packed3d import Packed, unpack

    rng = np.random.RandomState(4)
    left = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    right = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    kernel = jnp.asarray(rng.randn(3, 3, 3, 2 * c, f), jnp.float32)
    bias = jnp.asarray(rng.randn(f), jnp.float32)

    ref = _conv3d_ref(build_cost_volume(left, right, num_disp), kernel)
    ref = jnp.maximum(ref + bias, 0.0)
    got = fused_cost_volume_stem(
        left, right, kernel, num_disp, pack_g=g, bias=bias, relu=True
    )
    got = unpack(Packed(got, g=g, channels=f))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_fused_stem_grads_flow():
    rng = np.random.RandomState(3)
    left = jnp.asarray(rng.randn(1, 5, 8, 3), jnp.float32)
    right = jnp.asarray(rng.randn(1, 5, 8, 3), jnp.float32)
    kernel = jnp.asarray(rng.randn(3, 3, 3, 6, 4), jnp.float32)

    def loss_fused(k, l, r):
        return jnp.sum(fused_cost_volume_stem(l, r, k, 4) ** 2)

    def loss_ref(k, l, r):
        return jnp.sum(_conv3d_ref(build_cost_volume(l, r, 4), k) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(kernel, left, right)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(kernel, left, right)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-3)

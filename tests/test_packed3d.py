"""Depth-packed layout ops and the packed matching net.

Covers ``ops/packed3d.py`` (pure-function parity vs the plain NDHWC ops) and
``models/matching_packed.py`` (identical param tree + output parity vs
``MatchingNet``, eval and train, including batch-stats updates). The packed
net is the production execution path (``LEAStereoConfig.packed_matching``);
reference semantics come from ``retrain/skip_model_3d.py:78-174`` via the
unpacked net, which has its own torch-oracle parity test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leastereo_tpu.models.genotypes import BEST_SCENEFLOW
from leastereo_tpu.models.matching_net import MatchingNet
from leastereo_tpu.models.matching_packed import PackedMatchingNet
from leastereo_tpu.ops.conv3d import conv3d_decomposed
from leastereo_tpu.ops.cost_volume import build_cost_volume
from leastereo_tpu.ops.fused_stem import fused_cost_volume_stem
from leastereo_tpu.ops.packed3d import (
    Packed,
    choose_pack,
    concat_lanes,
    conv1x1_packed,
    conv3x3_packed,
    pack,
    repack,
    resize_packed,
    unpack,
)
from leastereo_tpu.ops.resize import resize3d


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def test_pack_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 8, 6, 10, 5), jnp.float32)
    for g in (1, 2, 4, 8):
        np.testing.assert_allclose(unpack(pack(x, g)), x)


def test_conv3x3_packed_matches_conv3d(rng):
    x = jnp.asarray(rng.randn(2, 8, 6, 10, 5), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 5, 7) * 0.3, jnp.float32)
    ref = conv3d_decomposed(x, k, ((1, 1), (1, 1)), (1, 1))
    for g in (1, 2, 4, 8):
        got = unpack(conv3x3_packed(pack(x, g), k))
        np.testing.assert_allclose(got, ref, atol=2e-5)


def test_conv3x3_packed_collapse_matches_conv3d(rng):
    from leastereo_tpu.ops.packed3d import conv3x3_packed_collapse

    x = jnp.asarray(rng.randn(2, 8, 6, 10, 5), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 5, 1) * 0.3, jnp.float32)
    ref = conv3d_decomposed(x, k, ((1, 1), (1, 1)), (1, 1))[..., 0]
    for g in (1, 2, 4, 8):
        got = conv3x3_packed_collapse(pack(x, g), k)
        np.testing.assert_allclose(got, ref, atol=2e-5)
    # Non-canonical input (lane concat) must canonicalise first.
    pa, pb = pack(x[..., :2], 4), pack(x[..., 2:], 4)
    got = conv3x3_packed_collapse(concat_lanes([pa, pb]), k)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_conv1x1_packed(rng):
    x = jnp.asarray(rng.randn(2, 8, 6, 10, 5), jnp.float32)
    k = jnp.asarray(rng.randn(5, 3), jnp.float32)
    ref = jnp.einsum("bdhwc,cf->bdhwf", x, k)
    got = unpack(conv1x1_packed(pack(x, 4), k))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_lane_concat_and_mapped_consumers(rng):
    """Lane-concat is free (non-canonical map); convs must see through it."""
    a = jnp.asarray(rng.randn(1, 8, 6, 10, 5), jnp.float32)
    b = jnp.asarray(rng.randn(1, 8, 6, 10, 3), jnp.float32)
    pc = concat_lanes([pack(a, 4), pack(b, 4)])
    xc = jnp.concatenate([a, b], axis=-1)
    np.testing.assert_allclose(unpack(pc), xc)

    k3 = jnp.asarray(rng.randn(3, 3, 3, 8, 4) * 0.3, jnp.float32)
    ref = conv3d_decomposed(xc, k3, ((1, 1), (1, 1)), (1, 1))
    np.testing.assert_allclose(unpack(conv3x3_packed(pc, k3)), ref, atol=2e-5)

    k1 = jnp.asarray(rng.randn(8, 6), jnp.float32)
    ref1 = jnp.einsum("bdhwc,cf->bdhwf", xc, k1)
    np.testing.assert_allclose(unpack(conv1x1_packed(pc, k1)), ref1, atol=2e-5)


@pytest.mark.parametrize("align_corners", [True, False])
def test_resize_packed_matches_resize3d(rng, align_corners):
    x = jnp.asarray(rng.randn(1, 8, 6, 10, 5), jnp.float32)
    p = pack(x, 4)
    cases = [
        ((4, 3, 5), 2),   # down + g change
        ((16, 12, 20), 8),  # up + g change
        ((8, 12, 20), 4),  # H/W only (lane map preserved)
        ((4, 6, 10), 2),   # D only
    ]
    for out_dhw, g_out in cases:
        got = unpack(resize_packed(p, out_dhw, g_out, align_corners=align_corners))
        ref = resize3d(x, out_dhw, align_corners=align_corners)
        np.testing.assert_allclose(got, ref, atol=2e-5)


def test_fused_stem_packed_emission(rng):
    left = jnp.asarray(rng.randn(1, 6, 12, 4), jnp.float32)
    right = jnp.asarray(rng.randn(1, 6, 12, 4), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 8, 5) * 0.3, jnp.float32)
    ref = fused_cost_volume_stem(left, right, k, 8)
    got = unpack(Packed(fused_cost_volume_stem(left, right, k, 8, pack_g=4), g=4, channels=5))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_choose_pack():
    assert choose_pack(64, 16) == 8
    assert choose_pack(64, 32) == 4
    assert choose_pack(64, 8) == 16
    # Wide concats re-tile to the smallest g >= 2 that fills the lanes.
    assert choose_pack(32, 128) == 2
    assert choose_pack(32, 64) == 2
    # Middlebury maxdisp-408 depths: 136/68/34 — graceful divisors only
    assert choose_pack(68, 16) == 4
    assert choose_pack(34, 32) == 2
    assert choose_pack(7, 16) == 1


def test_repack(rng):
    x = jnp.asarray(rng.randn(2, 16, 4, 6, 5), jnp.float32)
    for g_in in (1, 2, 4, 8):
        for g_out in (1, 2, 4, 8, 16):
            np.testing.assert_allclose(unpack(repack(pack(x, g_in), g_out)), x)
    # Non-canonical input (lane concat) re-tiles to canonical too.
    a, b = x[..., :3], x[..., 3:]
    pc = concat_lanes([pack(a, 4), pack(b, 4)])
    for g_out in (1, 2, 8):
        got = repack(pc, g_out)
        assert got.is_canonical()
        np.testing.assert_allclose(unpack(got), x)


@pytest.mark.parametrize("align_corners", [True, False])
def test_resize_packed_noncanonical_input(rng, align_corners):
    """Resize must see through a lane-concat (non-canonical) layout."""
    x = jnp.asarray(rng.randn(1, 8, 6, 10, 8), jnp.float32)
    pc = concat_lanes([pack(x[..., :5], 4), pack(x[..., 5:], 4)])
    for out_dhw, g_out in [((4, 3, 5), 2), ((16, 12, 20), 8), ((8, 6, 10), 2)]:
        got = unpack(resize_packed(pc, out_dhw, g_out, align_corners=align_corners))
        ref = resize3d(x, out_dhw, align_corners=align_corners)
        np.testing.assert_allclose(got, ref, atol=2e-5)


class TestPackedMatchingNet:
    B, D, H, W, C = 1, 8, 24, 24, 16

    @pytest.fixture(scope="class")
    def nets(self, request):
        rng = np.random.RandomState(1)
        geno = BEST_SCENEFLOW["matching"]
        kw = dict(genotype=geno, filter_multiplier=8, block_multiplier=4, steps=3, dtype=jnp.float32)
        net_u, net_p = MatchingNet(**kw), PackedMatchingNet(**kw)
        left = jnp.asarray(rng.randn(self.B, self.H, self.W, self.C), jnp.float32)
        right = jnp.asarray(rng.randn(self.B, self.H, self.W, self.C), jnp.float32)
        x = (left, right, self.D)
        v = net_u.init(jax.random.PRNGKey(0), x)
        return net_u, net_p, x, v

    def test_param_tree_identical(self, nets):
        net_u, net_p, x, v = nets
        v_p = net_p.init(jax.random.PRNGKey(0), x)
        pu = {jax.tree_util.keystr(k): l.shape for k, l in jax.tree_util.tree_leaves_with_path(v)}
        pp = {jax.tree_util.keystr(k): l.shape for k, l in jax.tree_util.tree_leaves_with_path(v_p)}
        assert pu == pp

    def test_eval_parity_fused(self, nets):
        net_u, net_p, x, v = nets
        y_u = np.asarray(net_u.apply(v, x))
        y_p = np.asarray(net_p.apply(v, x))
        assert np.abs(y_u - y_p).max() / np.abs(y_u).max() < 1e-4

    def test_eval_parity_explicit_volume(self, nets):
        net_u, net_p, x, v = nets
        vol = build_cost_volume(x[0], x[1], self.D)
        y_u = np.asarray(net_u.apply(v, vol))
        y_p = np.asarray(net_p.apply(v, vol))
        assert np.abs(y_u - y_p).max() / np.abs(y_u).max() < 1e-4

    def test_train_parity_and_batch_stats(self, nets):
        net_u, net_p, x, v = nets
        y_u, mu = net_u.apply(v, x, train=True, mutable=["batch_stats"])
        y_p, mp = net_p.apply(v, x, train=True, mutable=["batch_stats"])
        assert np.abs(np.asarray(y_u) - np.asarray(y_p)).max() / np.abs(np.asarray(y_u)).max() < 1e-3
        for a, b in zip(jax.tree.leaves(mu), jax.tree.leaves(mp)):
            np.testing.assert_allclose(a, b, atol=1e-4)

    def test_gradients_finite(self, nets):
        net_u, net_p, x, v = nets

        def loss_fn(params):
            y = net_p.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )[0]
            return jnp.mean(jnp.square(y))

        g = jax.grad(loss_fn)(v["params"])
        norms = [float(jnp.sum(jnp.square(l))) for l in jax.tree.leaves(g)]
        assert np.isfinite(sum(norms)) and sum(norms) > 0

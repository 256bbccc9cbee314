"""Decoded 3D Matching Net with long skip connections
(reference ``retrain/skip_model_3d.py:78-174``).

Filters the NDHWC feature volume ``(B, D, H, W, 2C)`` through two 3D-conv
stems, ``num_layers`` decoded 3D cells along the searched resolution path —
with two long skip concats (``out4_cat = conv1(cat(out1, out4))`` feeding
cell 5, ``out8_cat = conv2(cat(out4, out8))`` feeding cell 9) — and a
level-dependent trilinear-upsample head producing the 1-channel matching
cost at the volume's native resolution.

``skips=()`` yields the reference's legacy non-skip matching net
(``retrain/new_model_3d.py:77-159`` ``newMatching``), whose only difference
from the skip net is the absence of the two ``conv1``/``conv2`` fusions;
oracle-verified in ``tests/test_reference_parity.py::test_legacy_matching_parity``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.convbr import ConvBR, conv_init
from ..ops.fused_stem import fused_cost_volume_stem
from ..ops.resize import resize3d
from .cells import FixedCell
from .genotypes import FILTER_SCALE, Architecture

# (source_cell, target_cell): after target's concat, fuse with source's concat
# through a 3x3x3 ConvBR before feeding the next cell
# (reference skip_model_3d.py:150-156).
DEFAULT_SKIPS = ((1, 4), (4, 8))


class _FusedVolumeConv(nn.Module):
    """The stem0 convolution computed straight from the stereo features via
    ``ops/fused_stem.py`` — the 5-D cost volume never materialises. Parameter
    tree identical to the ``nn.Conv`` inside ``ConvBR`` (``conv/kernel``,
    DHWIO ``(3,3,3,2C,F)``) so checkpoints are interchangeable with the
    unfused path."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, left: jnp.ndarray, right: jnp.ndarray, num_disp: int) -> jnp.ndarray:
        kernel = self.param(
            "kernel", conv_init, (3, 3, 3, 2 * left.shape[-1], self.features), jnp.float32
        )
        return fused_cost_volume_stem(
            left.astype(self.dtype), right.astype(self.dtype), kernel.astype(self.dtype), num_disp
        )


class FusedStem0(nn.Module):
    """Cost-volume + stem0 ConvBR (conv + BN + ReLU), fused. Drop-in for
    ``ConvBR(ifm, (3,3,3), 1, 1)`` applied to ``build_cost_volume(L, R, D)``
    (reference ``models/build_model.py:56-65`` + ``skip_model_3d.py:137``)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, left: jnp.ndarray, right: jnp.ndarray, num_disp: int, *, train: bool = False
    ) -> jnp.ndarray:
        x = _FusedVolumeConv(self.features, self.dtype, name="conv")(left, right, num_disp)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x.astype(self.dtype))


class MatchingNet(nn.Module):
    genotype: Architecture
    filter_multiplier: int = 8
    block_multiplier: int = 4
    steps: int = 3
    skips: tuple[tuple[int, int], ...] = DEFAULT_SKIPS
    dtype: jnp.dtype = jnp.bfloat16
    # Optional PartitionSpec axes constraining the (B, D, H, W, C) volume
    # after stem0 — the disparity-sharded CP analog (SURVEY.md §2.4).
    volume_pspec: tuple | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> jnp.ndarray:
        """``x``: either the materialised cost volume ``(B, D, H, W, 2C)`` or a
        ``(left_features, right_features, num_disp)`` tuple, in which case the
        volume construction fuses into stem0 (never materialised)."""
        kw = dict(dtype=self.dtype)
        ifm = self.filter_multiplier * self.block_multiplier
        skips = {tgt: src for src, tgt in self.skips}

        if isinstance(x, tuple):
            left, right, num_disp = x
            d, h, w = num_disp, left.shape[1], left.shape[2]
            stem0 = FusedStem0(ifm, name="stem0", **kw)(left, right, num_disp, train=train)
        else:
            d, h, w = x.shape[1], x.shape[2], x.shape[3]
            stem0 = ConvBR(ifm, (3, 3, 3), 1, 1, name="stem0", **kw)(x, train=train)
        if self.volume_pspec is not None:
            stem0 = jax.lax.with_sharding_constraint(
                stem0, jax.sharding.PartitionSpec(*self.volume_pspec)
            )
        stem1 = ConvBR(ifm, (3, 3, 3), 1, 1, name="stem1", **kw)(stem0, train=train)

        concats: list[jnp.ndarray] = []  # original concat output of each cell
        s0, s1 = stem0, stem1
        for i, level in enumerate(self.genotype.network_path):
            prev_raw, concat = FixedCell(
                steps=self.steps,
                block_multiplier=self.block_multiplier,
                c_out=self.filter_multiplier * FILTER_SCALE[level],
                downup_sample=self.genotype.downup(i),
                genotype=self.genotype,
                ndim=3,
                name=f"cell_{i}",
                **kw,
            )(s0, s1, train=train)
            concats.append(concat)
            if i in skips:
                src = concats[skips[i]]
                fused = jnp.concatenate([src, concat], axis=-1)
                concat = ConvBR(ifm * 2, (3, 3, 3), 1, 1, name=f"skip_conv_{i}", **kw)(
                    fused, train=train
                )
            s0, s1 = prev_raw, concat

        last = concats[-1]
        level = self.genotype.network_path[-1]

        if level >= 3:
            last = ConvBR(ifm * 4, (1, 1, 1), 1, 0, name="last_24", **kw)(last, train=train)
            last = resize3d(last, (d // 4, h // 4, w // 4), align_corners=True)
        if level >= 2:
            last = ConvBR(ifm * 2, (1, 1, 1), 1, 0, name="last_12", **kw)(last, train=train)
            last = resize3d(last, (d // 2, h // 2, w // 2), align_corners=True)
        if level >= 1:
            last = ConvBR(ifm, (1, 1, 1), 1, 0, name="last_6", **kw)(last, train=train)
            last = resize3d(last, (d, h, w), align_corners=True)
        mat = ConvBR(1, (3, 3, 3), 1, 1, use_bn=False, use_relu=False, name="last_3", **kw)(
            last, train=train
        )
        return mat

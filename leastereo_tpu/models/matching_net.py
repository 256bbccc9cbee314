"""Decoded 3D Matching Net with long skip connections
(reference ``retrain/skip_model_3d.py:78-174``).

Filters the NDHWC feature volume ``(B, D, H, W, 2C)`` through two 3D-conv
stems, ``num_layers`` decoded 3D cells along the searched resolution path —
with two long skip concats (``out4_cat = conv1(cat(out1, out4))`` feeding
cell 5, ``out8_cat = conv2(cat(out4, out8))`` feeding cell 9) — and a
level-dependent trilinear-upsample head producing the 1-channel matching
cost at the volume's native resolution.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.convbr import ConvBR
from ..ops.resize import resize3d
from .cells import FixedCell
from .genotypes import FILTER_SCALE, Architecture

# (source_cell, target_cell): after target's concat, fuse with source's concat
# through a 3x3x3 ConvBR before feeding the next cell
# (reference skip_model_3d.py:150-156).
DEFAULT_SKIPS = ((1, 4), (4, 8))


class MatchingNet(nn.Module):
    genotype: Architecture
    filter_multiplier: int = 8
    block_multiplier: int = 4
    steps: int = 3
    skips: tuple[tuple[int, int], ...] = DEFAULT_SKIPS
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype)
        ifm = self.filter_multiplier * self.block_multiplier
        skips = {tgt: src for src, tgt in self.skips}

        stem0 = ConvBR(ifm, (3, 3, 3), 1, 1, name="stem0", **kw)(x, train=train)
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
        d, h, w = x.shape[1], x.shape[2], x.shape[3]
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

"""Decoded 2D Feature Net (reference ``retrain/new_model_2d.py:78-165``).

Embeds an RGB image at 1/3 resolution: a 3-conv stem (stride 1, 3, 1), then
``num_layers`` decoded cells along the searched resolution path, then a
level-dependent 1x1-conv + bilinear upsample head that returns the features
at 1/3 resolution.

TPU-first: NHWC throughout; every resize is an MXU matmul (ops/resize.py);
all cells are statically unrolled at trace time.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.convbr import ConvBR
from ..ops.resize import resize2d
from .cells import FixedCell
from .genotypes import FILTER_SCALE, Architecture


class FeatureNet(nn.Module):
    genotype: Architecture
    filter_multiplier: int = 8
    block_multiplier: int = 4
    steps: int = 3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype)
        ifm = self.filter_multiplier * self.block_multiplier
        half_ifm = ifm // 2

        stem0 = ConvBR(half_ifm, (3, 3), 1, 1, name="stem0", **kw)(x, train=train)
        stem1 = ConvBR(ifm, (3, 3), 3, 1, name="stem1", **kw)(stem0, train=train)
        stem2 = ConvBR(ifm, (3, 3), 1, 1, name="stem2", **kw)(stem1, train=train)

        s0, s1 = stem1, stem2
        for i, level in enumerate(self.genotype.network_path):
            s0, s1 = FixedCell(
                steps=self.steps,
                block_multiplier=self.block_multiplier,
                c_out=self.filter_multiplier * FILTER_SCALE[level],
                downup_sample=self.genotype.downup(i),
                genotype=self.genotype,
                ndim=2,
                name=f"cell_{i}",
                **kw,
            )(s0, s1, train=train)

        last = s1
        h, w = stem2.shape[1], stem2.shape[2]
        level = self.genotype.network_path[-1]

        # Level-dependent upsample head (reference new_model_2d.py:150-163):
        # note the //2, //4 targets use integer division of the stem size.
        if level >= 3:
            last = ConvBR(ifm * 4, (1, 1), 1, 0, name="last_24", **kw)(last, train=train)
            last = resize2d(last, (h // 4, w // 4), align_corners=True)
        if level >= 2:
            last = ConvBR(ifm * 2, (1, 1), 1, 0, name="last_12", **kw)(last, train=train)
            last = resize2d(last, (h // 2, w // 2), align_corners=True)
        if level >= 1:
            last = ConvBR(ifm, (1, 1), 1, 0, name="last_6", **kw)(last, train=train)
            last = resize2d(last, (h, w), align_corners=True)
        fea = ConvBR(ifm, (1, 1), 1, 0, use_bn=False, use_relu=False, name="last_3", **kw)(
            last, train=train
        )
        return fea

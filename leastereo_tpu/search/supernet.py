"""Multi-resolution trellis supernets + full search model.

Re-designs the reference's unrolled 400-line supernet forwards
(``models/build_model_2d.py:180-418``, ``build_model_3d.py:129-364``) as one
generic trellis: levels {0:1/3, 1:1/6, 2:1/12, 3:1/24}, level ``v`` first
populated at layer ``v-1``, every (layer, level) node combining down/same/up
branch outputs with normalized beta weights.

Beta normalization follows the reference's *single-device* path
(build_model_2d.py:219-238) — row 0 softmaxes entries [1:] x 2/3, rows 1-2
full softmax, row 3 softmaxes [:2] x 2/3 — minus two documented reference
bugs we do not replicate (SURVEY.md "Known reference bugs"): uninitialized
``torch.randn`` rows (we use zeros; those entries are never read) and the
layer-1 use of beta[1][1][2] where the trellis pattern calls for beta[1][1][1].

Arch parameters (alphas, betas) live in the same flax "params" collection as
the weights, under fixed names — :func:`arch_label_tree` partitions them for
the bilevel optimizers.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.genotypes import FILTER_SCALE, PRIMITIVES
from ..ops.convbr import ConvBR
from ..ops.cost_volume import build_cost_volume
from ..ops.resize import resize2d, resize3d
from ..ops.softargmin import soft_argmin
from .cells import SearchCell, num_edges

__all__ = [
    "SupernetConfig",
    "FeatureSupernet",
    "MatchingSupernet",
    "AutoStereoSupernet",
    "normalize_betas",
    "arch_label_tree",
]


def first_layer(level: int) -> int:
    """Layer at which a level first produces output (stem = level 0 at -1)."""
    return -1 if level == 0 else level - 1


def normalize_betas(betas: jnp.ndarray, num_layers: int) -> jnp.ndarray:
    """(L, 4, 3) raw betas -> normalized transition weights.

    Row layout: betas[l][u][k], k in {0: up, 1: same, 2: down} — the weight of
    the edge leaving level ``u`` at layer ``l`` in direction ``k``
    (reference build_model_2d.py:222-238, single-GPU path; bug-free variant).
    """
    out = jnp.zeros_like(betas)
    for layer in range(num_layers):
        # Row 0 cannot go up: softmax over (same, down), scaled 2/3.
        row0 = jax.nn.softmax(betas[layer, 0, 1:]) * (2.0 / 3.0)
        out = out.at[layer, 0, 1:].set(row0)
        top = min(layer + 1, 3)  # highest level with output at layer-1
        for u in (1, 2):
            if u <= top:
                out = out.at[layer, u].set(jax.nn.softmax(betas[layer, u]))
        if top == 3:
            # Row 3 cannot go down: softmax over (up, same), scaled 2/3.
            out = out.at[layer, 3, :2].set(jax.nn.softmax(betas[layer, 3, :2]) * (2.0 / 3.0))
    return out


@dataclasses.dataclass(frozen=True)
class SupernetConfig:
    num_layers: int
    filter_multiplier: int
    block_multiplier: int
    steps: int = 3
    # Rematerialize each search cell in the backward pass (jax.checkpoint).
    # Required to fit the reference-scale 192x384 filter-4/block-3 bilevel
    # search on one chip (SURVEY.md §7 hard-part 3); costs ~1 extra forward.
    remat: bool = True


class _Trellis(nn.Module):
    """Shared trellis machinery for the 2D / 3D supernets."""

    cfg: SupernetConfig
    ndim: int
    dtype: jnp.dtype

    def trellis(self, stem_out: jnp.ndarray, *, train: bool) -> list:
        cfg = self.cfg
        fm = cfg.filter_multiplier
        alphas = self.param(
            "alphas",
            lambda key: 1e-3 * jax.random.normal(key, (num_edges(cfg.steps), len(PRIMITIVES))),
        )
        betas = self.param(
            "betas",
            lambda key: 1e-3 * jax.random.normal(key, (cfg.num_layers, 4, 3)),
        )
        a = jax.nn.softmax(alphas, axis=-1).astype(self.dtype)
        b = normalize_betas(betas, cfg.num_layers).astype(self.dtype)

        # prev[v], prev_prev[v]: level outputs at layer-1 / layer-2.
        prev = {0: stem_out}
        prev_prev: dict[int, jnp.ndarray] = {}

        for layer in range(cfg.num_layers):
            top = min(layer + 1, 3)
            new: dict[int, jnp.ndarray] = {}
            # Cache per-source-cell outputs: the cell at target level v
            # produces one output per branch.
            for v in range(top + 1):
                has_s0 = layer - first_layer(v) >= 2
                s1_down = prev.get(v - 1)
                s1_same = prev.get(v)
                s1_up = prev.get(v + 1)
                if s1_down is None and s1_same is None and s1_up is None:
                    continue
                # static_argnums counts self at 0; 6 = the train flag.
                cell_cls = nn.remat(SearchCell, static_argnums=(6,)) if cfg.remat else SearchCell
                cell = cell_cls(
                    steps=cfg.steps,
                    block_multiplier=cfg.block_multiplier,
                    c_out=fm * FILTER_SCALE[v],
                    has_s0=has_s0,
                    ndim=self.ndim,
                    dtype=self.dtype,
                    name=f"cell_{layer}_{v}",
                )
                outs = cell(
                    prev_prev.get(v) if has_s0 else None,
                    s1_down,
                    s1_same,
                    s1_up,
                    a,
                    train,
                )
                # Branch order mirrors availability order (down, same, up);
                # weight each with the beta of its transition.
                weights = []
                if s1_down is not None:
                    weights.append(b[layer, v - 1, 2])
                if s1_same is not None:
                    weights.append(b[layer, v, 1])
                if s1_up is not None:
                    weights.append(b[layer, v + 1, 0])
                new[v] = sum(w * o for w, o in zip(weights, outs))
            prev_prev = prev
            prev = new
        return prev

    def fuse_head(self, levels: dict, stem_size, *, last_3, last_6, last_12, last_24, train: bool):
        """Progressive 4-level fusion (reference build_model_2d.py:406-418):
        each level is projected down the channel ladder and upsampled
        (align_corners=True) through the chain, then all four are summed."""
        resize = resize2d if self.ndim == 2 else resize3d

        def up(x, size):
            return resize(x, tuple(size), align_corners=True)

        half = tuple(d // 2 for d in stem_size)
        quarter = tuple(d // 4 for d in stem_size)
        r3 = last_3(levels[0], train=train)
        r6 = last_3(up(last_6(levels[1], train=train), stem_size), train=train)
        r12 = last_3(
            up(last_6(up(last_12(levels[2], train=train), half), train=train), stem_size),
            train=train,
        )
        r24 = last_3(
            up(
                last_6(
                    up(last_12(last_24(levels[3], train=train), train=train), half),
                    train=train,
                ),
                stem_size,
            ),
            train=train,
        )
        return r3 + r6 + r12 + r24


class FeatureSupernet(_Trellis):
    """2D feature supernet (reference ``AutoFeature`` build_model_2d.py:60)."""

    cfg: SupernetConfig = SupernetConfig(6, 8, 4)
    ndim: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        num_end = cfg.filter_multiplier * cfg.block_multiplier
        half = (cfg.filter_multiplier // 2) * cfg.block_multiplier
        kw = dict(dtype=self.dtype)
        x = ConvBR(half, (3, 3), 1, 1, name="stem0", **kw)(x, train=train)
        x = ConvBR(half, (3, 3), 3, 1, name="stem1", **kw)(x, train=train)
        stem2 = ConvBR(num_end, (3, 3), 1, 1, name="stem2", **kw)(x, train=train)

        levels = self.trellis(stem2, train=train)

        last_3 = ConvBR(num_end, (1, 1), 1, 0, use_bn=False, use_relu=False, name="last_3", **kw)
        last_6 = ConvBR(num_end, (1, 1), 1, 0, name="last_6", **kw)
        last_12 = ConvBR(num_end * 2, (1, 1), 1, 0, name="last_12", **kw)
        last_24 = ConvBR(num_end * 4, (1, 1), 1, 0, name="last_24", **kw)
        return self.fuse_head(
            levels,
            stem2.shape[1:-1],
            last_3=last_3,
            last_6=last_6,
            last_12=last_12,
            last_24=last_24,
            train=train,
        )


class MatchingSupernet(_Trellis):
    """3D matching supernet (reference ``AutoMatching`` build_model_3d.py:10)."""

    cfg: SupernetConfig = SupernetConfig(12, 8, 4)
    ndim: int = 3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, volume: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        num_end = cfg.filter_multiplier * cfg.block_multiplier
        kw = dict(dtype=self.dtype)
        stem = ConvBR(num_end, (3, 3, 3), 1, 1, name="stem0", **kw)(volume, train=train)

        levels = self.trellis(stem, train=train)

        last_3 = ConvBR(1, (3, 3, 3), 1, 1, use_bn=False, use_relu=False, name="last_3", **kw)
        last_6 = ConvBR(num_end, (1, 1, 1), 1, 0, name="last_6", **kw)
        last_12 = ConvBR(num_end * 2, (1, 1, 1), 1, 0, name="last_12", **kw)
        last_24 = ConvBR(num_end * 4, (1, 1, 1), 1, 0, name="last_24", **kw)
        return self.fuse_head(
            levels,
            stem.shape[1:-1],
            last_3=last_3,
            last_6=last_6,
            last_12=last_12,
            last_24=last_24,
            train=train,
        )


class AutoStereoSupernet(nn.Module):
    """Full search-stage stereo model (reference ``AutoStereo``
    build_model.py:10-79): feature supernet on both views, shifted-concat
    feature volume, matching supernet, soft-argmin head."""

    maxdisp: int = 192
    fea: SupernetConfig = SupernetConfig(6, 8, 4)
    mat: SupernetConfig = SupernetConfig(12, 8, 4)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, left: jnp.ndarray, right: jnp.ndarray, *, train: bool = False):
        feature = FeatureSupernet(cfg=self.fea, dtype=self.dtype, name="feature")
        matching = MatchingSupernet(cfg=self.mat, dtype=self.dtype, name="matching")
        fl = feature(left, train=train)
        fr = feature(right, train=train)
        volume = build_cost_volume(fl, fr, self.maxdisp // 3)
        cost = matching(volume, train=train)
        return soft_argmin(cost, self.maxdisp)


def arch_label_tree(params) -> dict:
    """Label each leaf 'arch' (alphas/betas) or 'weight' — the partition the
    bilevel optimizers use (reference arch_parameters()/weight_parameters(),
    build_model_2d.py:438-442)."""
    def label(path, _):
        keys = [getattr(p, "key", None) for p in path]
        return "arch" if ("alphas" in keys or "betas" in keys) else "weight"

    return jax.tree_util.tree_map_with_path(label, params)

"""Searchable (DARTS-style) cell shared by the 2D and 3D supernets.

Re-designs reference ``models/cell_level_search_2d.py`` /
``cell_level_search_3d.py`` (byte-identical modulo 2D/3D) as one rank-generic
Flax module. A cell owns one set of mixed-op weights for its DAG and applies
it independently to each *branch* (the down/same/up-resampled outputs of the
previous layer), returning one tensor per branch; the supernet combines the
branch outputs with beta weights.

Every mixed edge computes BOTH primitives (skip + conv3x3) weighted by the
softmaxed alphas — the DARTS relaxation — so the supernet is a static XLA
graph with no data-dependent control flow.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.convbr import ConvBR
from ..ops.resize import resize2d, resize3d, scale_dimension
from ..models.genotypes import PRIMITIVES

__all__ = ["SearchCell", "num_edges", "s0_edge_indices"]


def num_edges(steps: int) -> int:
    """Total DAG edges: node i has 2+i inputs (reference
    build_model_2d.py:421)."""
    return sum(2 + i for i in range(steps))


def s0_edge_indices(steps: int) -> tuple[int, ...]:
    """Edge indices fed by the layer-2 state s0 (first input of each node's
    first-two states block): {0, 2, 5} for steps=3."""
    out, offset, n = [], 0, 2
    for _ in range(steps):
        out.append(offset)
        offset += n
        n += 1
    return tuple(out)


def _resize(x: jnp.ndarray, size, ndim: int) -> jnp.ndarray:
    return (resize2d if ndim == 2 else resize3d)(x, tuple(size), align_corners=True)


class SearchCell(nn.Module):
    """One searchable cell at a (layer, level) trellis node.

    Parity with reference ``Cell.forward`` (cell_level_search_2d.py:99-155):
    branch inputs are resampled with the align_corners=True /
    ``scale_dimension`` rule, 1x1-projected to ``c_out`` per branch, and the
    shared DAG runs per branch. ``has_s0=False`` cells skip the s0 edges
    entirely (reference builds ``op=None`` for those edges,
    cell_level_search_2d.py:63-70).
    """

    steps: int
    block_multiplier: int
    c_out: int
    has_s0: bool
    ndim: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        s0,
        s1_down,
        s1_same,
        s1_up,
        alphas: jnp.ndarray,  # (num_edges, num_ops), already softmaxed
        train: bool = False,  # positional so nn.remat can mark it static
    ) -> list[jnp.ndarray]:
        one = (1,) * self.ndim
        k3 = (3,) * self.ndim
        kw = dict(dtype=self.dtype)

        branches = []
        target_size = None
        if s1_down is not None:
            size = tuple(scale_dimension(d, 0.5) for d in s1_down.shape[1:-1])
            x = _resize(s1_down, size, self.ndim)
            x = ConvBR(self.c_out, one, 1, 0, name="preprocess_down", **kw)(x, train=train)
            branches.append(x)
            target_size = x.shape[1:-1]
        if s1_same is not None:
            x = ConvBR(self.c_out, one, 1, 0, name="preprocess_same", **kw)(s1_same, train=train)
            branches.append(x)
            target_size = x.shape[1:-1]
        if s1_up is not None:
            size = tuple(scale_dimension(d, 2.0) for d in s1_up.shape[1:-1])
            x = _resize(s1_up, size, self.ndim)
            x = ConvBR(self.c_out, one, 1, 0, name="preprocess_up", **kw)(x, train=train)
            branches.append(x)
            target_size = x.shape[1:-1]

        if self.has_s0:
            if s0.shape[1:-1] != target_size:
                s0 = _resize(s0, target_size, self.ndim)
            if s0.shape[-1] != self.c_out:
                s0 = ConvBR(self.c_out, one, 1, 0, name="pre_preprocess", **kw)(s0, train=train)

        # Shared mixed ops: one conv per active edge, reused across branches.
        skip_edges = set() if self.has_s0 else set(s0_edge_indices(self.steps))
        assert len(PRIMITIVES) == 2  # (skip_connect, conv_3x3)
        convs = {
            e: ConvBR(self.c_out, k3, 1, 1, name=f"op_{e}_conv", **kw)
            for e in range(num_edges(self.steps))
            if e not in skip_edges
        }

        outs = []
        for branch in branches:
            states = [s0 if self.has_s0 else None, branch]
            offset = 0
            for _ in range(self.steps):
                acc = []
                for j, h in enumerate(states):
                    edge = offset + j
                    if edge in skip_edges or h is None:
                        continue
                    w = alphas[edge]
                    acc.append(w[0] * h + w[1] * convs[edge](h, train=train))
                offset += len(states)
                states.append(sum(acc))
            outs.append(jnp.concatenate(states[-self.block_multiplier :], axis=-1))
        return outs

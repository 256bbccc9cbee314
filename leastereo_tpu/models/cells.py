"""Fixed (decoded-genotype) cell, shared by the 2D feature and 3D matching nets.

Re-designs reference ``retrain/new_model_2d.py:12-76`` and
``retrain/skip_model_3d.py:12-75`` (which are byte-identical modulo 2D/3D) as
one rank-generic Flax module: the cell receives the two predecessor feature
maps, rescales them onto its resolution (align_corners=True, odd-dim
``scale_dimension`` rule), 1x1-projects both to ``C_out``, then runs a 3-step
DAG whose active edges and primitives come from the decoded genotype, and
concatenates the last ``block_multiplier`` DAG states.

All shapes are static at trace time (genotype + crop fixed per jit
specialization), so XLA sees a flat graph of MXU convolutions.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.convbr import ConvBR
from ..ops.resize import resize2d, resize3d, scale_dimension
from .genotypes import OP_CONV, OP_SKIP, Architecture


def _resize(x: jnp.ndarray, size: tuple[int, ...], ndim: int) -> jnp.ndarray:
    if ndim == 2:
        return resize2d(x, size, align_corners=True)
    return resize3d(x, size, align_corners=True)


class FixedCell(nn.Module):
    """One decoded cell (reference ``Cell`` in retrain/new_model_2d.py:12)."""

    steps: int
    block_multiplier: int
    c_out: int  # filter multiplier at this cell's level
    downup_sample: int  # -1 down, 0 same, +1 up
    genotype: Architecture
    ndim: int = 2  # 2 -> NHWC feature cell, 3 -> NDHWC matching cell
    dtype: jnp.dtype = jnp.bfloat16

    def _project_resize(
        self,
        x: jnp.ndarray,
        size: tuple[int, ...],
        name: str,
        *,
        project: bool,
        train: bool,
    ) -> jnp.ndarray:
        """Resize ``x`` to ``size`` and 1x1-project to ``c_out``.

        Reference order is resize -> conv -> BN -> ReLU
        (retrain/new_model_2d.py:47-54). In eval mode, conv1x1 + running-stat
        BN are channel-affine-linear and the (bi/tri)linear resize is a convex
        spatial combination, so they commute *exactly*; when upsampling we
        therefore project first and resize the (usually 4-8x narrower)
        projected tensor — identical output, a fraction of the resize
        traffic. Train mode keeps the reference order so BN batch statistics
        are computed on the same tensor as the reference.
        """
        kw = dict(dtype=self.dtype)
        one = (1,) * self.ndim
        need_resize = x.shape[1:-1] != tuple(size)
        upsample = need_resize and size[-1] > x.shape[-2]
        if not project:
            return _resize(x, size, self.ndim) if need_resize else x
        if need_resize and upsample and not train:
            x = ConvBR(self.c_out, one, 1, 0, use_relu=False, name=name, **kw)(x, train=False)
            x = _resize(x, size, self.ndim)
            return nn.relu(x)
        if need_resize:
            x = _resize(x, size, self.ndim)
        return ConvBR(self.c_out, one, 1, 0, name=name, **kw)(x, train=train)

    @nn.compact
    def __call__(self, s0: jnp.ndarray, s1: jnp.ndarray, *, train: bool = False):
        kw = dict(dtype=self.dtype)
        prev_input = s1

        if self.downup_sample != 0:
            scale = 0.5 if self.downup_sample == -1 else 2.0
            size = tuple(scale_dimension(d, scale) for d in s1.shape[1:-1])
        else:
            size = tuple(s1.shape[1:-1])
        s0 = self._project_resize(
            s0, size, "pre_preprocess", project=s0.shape[-1] != self.c_out, train=train
        )
        s1 = self._project_resize(s1, size, "preprocess", project=True, train=train)

        # DAG: node i sums the op outputs of its active incoming edges
        # (reference retrain/new_model_2d.py:55-72). Ops pair with edges
        # positionally: row-order ops consumed in ascending-edge order.
        active = dict()  # edge -> (op_index_in_sequence, op_kind)
        for seq, (edge, op) in enumerate(self.genotype.active_edges()):
            active[edge] = (seq, op)

        k3 = (3,) * self.ndim
        states = [s0, s1]
        offset = 0
        for _ in range(self.steps):
            new_states = []
            for j, h in enumerate(states):
                edge = offset + j
                if edge in active:
                    seq, op = active[edge]
                    if op == OP_SKIP:
                        new_states.append(h)
                    else:
                        assert op == OP_CONV
                        out = ConvBR(self.c_out, k3, 1, 1, name=f"op_{seq}", **kw)(h, train=train)
                        new_states.append(out)
            offset += len(states)
            states.append(sum(new_states))

        concat = jnp.concatenate(states[-self.block_multiplier :], axis=-1)
        return prev_input, concat

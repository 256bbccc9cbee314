"""Depth-packed 3D Matching Net — the TPU-fast execution of MatchingNet.

Identical math and *identical parameter tree* to
:class:`~leastereo_tpu.models.matching_net.MatchingNet` (reference
``retrain/skip_model_3d.py:78-174``): checkpoints are interchangeable between
the two implementations. The difference is purely layout: all activations
live depth-packed as ``(B, D/G, H, W, G*C)`` (see ``ops/packed3d.py``) so the
net's narrow 8/16/32-channel tensors fill the TPU's 128-lane tiles instead of
being padded 4-16x, and every 3x3x3 convolution runs as one block-banded MXU
GEMM. Measured: the unpacked cells cost 3.6-10 ms each at the KITTI shape
against ~0.15 ms of useful FLOPs — pure lane-padding bandwidth.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.convbr import conv_init
from ..ops.fused_stem import fused_cost_volume_stem
from ..ops.packed3d import (
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
from ..ops.resize import scale_dimension
from .genotypes import FILTER_SCALE, OP_CONV, OP_SKIP, Architecture


class _KernelParam(nn.Module):
    """Holds a conv kernel param named ``kernel`` — nested under a module
    named ``conv`` this reproduces ``nn.Conv``'s ``conv/kernel`` param path."""

    shape: tuple[int, ...]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", conv_init, self.shape, jnp.float32)


class PackedBatchNorm(nn.Module):
    """BatchNorm over the logical channel axis of a packed volume.

    Param/batch_stats tree identical to ``nn.BatchNorm`` (scale/bias +
    mean/var of shape ``(C,)``); statistics reduce over (B, Dg, H, W, G) —
    exactly the unpacked (B, D, H, W) reduction. Normalisation math in fp32
    like ``ConvBR``'s BN (momentum 0.9 == torch 0.1, eps 1e-5, biased batch
    variance; reference ``models/operations_3d.py:31-55``).
    """

    channels: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, p: Packed | None, *, train: bool = False, fold: bool = False):
        c = self.channels
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (c,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones, None, (c,), jnp.float32)

        if fold:
            # Eval-mode folded affine: the caller scales its conv kernel by w
            # and adds b in the conv epilogue (see PackedConvBR). Same algebra.
            assert not train, "BN folding is eval-only"
            w_c = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            return w_c, bias - ra_mean.value * w_c

        assert p.channels == c, (p.channels, c)
        if train:
            assert p.is_canonical(), "train-mode BN requires canonical lane layout"
            x32 = p.data.astype(jnp.float32)
            b, dg, h, w, _ = x32.shape
            xr = x32.reshape(b, dg, h, w, p.g, c)
            mean = jnp.mean(xr, axis=(0, 1, 2, 3, 4))
            mean2 = jnp.mean(jnp.square(xr), axis=(0, 1, 2, 3, 4))
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        # Fold into a per-lane affine (same algebra as normalize-then-affine).
        w_c = scale * jax.lax.rsqrt(var + self.epsilon)
        b_c = bias - mean * w_c
        lane_c = jnp.asarray(np.asarray([pc for _, pc in p.map()]))
        w_l = w_c[lane_c]
        b_l = b_c[lane_c]
        y = (p.data.astype(jnp.float32) * w_l + b_l).astype(self.dtype)
        return Packed(y, g=p.g, channels=c, lane_map=p.lane_map)


class PackedConvBR(nn.Module):
    """Conv(bias=False) + BN + ReLU on packed volumes; param tree identical to
    :class:`~leastereo_tpu.ops.convbr.ConvBR` (``conv/kernel`` DHWIO +
    ``bn/{scale,bias,mean,var}``)."""

    features: int
    kernel_size: Sequence[int] = (3, 3, 3)
    use_bn: bool = True
    use_relu: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, p: Packed, *, train: bool = False) -> Packed:
        ks = tuple(self.kernel_size)
        kernel = _KernelParam((*ks, p.channels, self.features), name="conv")()
        fold = self.use_bn and not train
        if fold:
            bn = PackedBatchNorm(self.features, dtype=self.dtype, name="bn")
            w_c, b_c = bn(None, fold=True)
            kernel = kernel * w_c  # fp32 fold over the tiny kernel
        kernel = kernel.astype(self.dtype)
        if ks == (3, 3, 3):
            # (A Pallas banded-conv kernel replacing the XLA form — in-VMEM
            # halo assembly, exact-lane contraction, fused epilogue — was
            # built and validated in r5, but LOST to XLA's conv everywhere
            # (stem1 6.5 vs 4.7 ms, L1 cell 0.45 vs 0.21, skip 3.2 vs 1.6):
            # without cross-program DMA pipelining the serial band loads
            # dominate, and XLA's banded conv already runs the MXU at ~peak
            # for this formulation. Details in the r5 commit
            # "Evaluate and reject a Pallas banded-conv kernel".)
            y = conv3x3_packed(p, kernel)
        elif ks == (1, 1, 1):
            y = conv1x1_packed(p, kernel.reshape(p.channels, self.features))
        else:
            raise NotImplementedError(ks)
        if fold:
            # Conv outputs are canonical: bias tiles straight across lanes.
            b_l = jnp.tile(b_c.astype(self.dtype), y.g)
            y = Packed(y.data + b_l, g=y.g, channels=y.channels)
        elif self.use_bn:
            y = PackedBatchNorm(self.features, dtype=self.dtype, name="bn")(y, train=train)
        if self.use_relu:
            y = Packed(nn.relu(y.data), g=y.g, channels=y.channels, lane_map=y.lane_map)
        return y


class PackedFusedStem0(nn.Module):
    """Cost-volume + stem0 ConvBR fused, emitting a packed volume directly
    (drop-in for ``matching_net.FusedStem0``; same param tree)."""

    features: int
    pack_g: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, left: jnp.ndarray, right: jnp.ndarray, num_disp: int, *, train: bool = False) -> Packed:
        kernel = _KernelParam((3, 3, 3, 2 * left.shape[-1], self.features), name="conv")()
        bn = PackedBatchNorm(self.features, dtype=self.dtype, name="bn")
        fold = not train
        if fold:
            # The whole assembly is linear in the kernel, so the eval BN
            # scale folds into it exactly; bias+relu ride the per-tile
            # assembly epilogue inside the fused stem (a separate full-volume
            # pass cost ~0.9 ms at the KITTI shape — trace fusion.71).
            w_c, b_c = bn(None, fold=True)
            out = fused_cost_volume_stem(
                left.astype(self.dtype),
                right.astype(self.dtype),
                (kernel * w_c).astype(self.dtype),
                num_disp,
                pack_g=self.pack_g,
                bias=b_c,
                relu=True,
            )
            return Packed(out, g=self.pack_g, channels=self.features)
        out = fused_cost_volume_stem(
            left.astype(self.dtype),
            right.astype(self.dtype),
            kernel.astype(self.dtype),
            num_disp,
            pack_g=self.pack_g,
        )
        p = bn(Packed(out, g=self.pack_g, channels=self.features), train=train)
        return Packed(nn.relu(p.data), g=p.g, channels=p.channels)


class PackedFixedCell(nn.Module):
    """Decoded cell on packed volumes (mirrors ``models/cells.py:FixedCell``
    and reference ``retrain/skip_model_3d.py:12-75``; same param tree)."""

    steps: int
    block_multiplier: int
    c_out: int
    downup_sample: int
    genotype: Architecture
    dtype: jnp.dtype = jnp.bfloat16

    def _project_resize(
        self, p: Packed, size: tuple[int, int, int], g_out: int, name: str,
        *, project: bool, train: bool,
    ) -> Packed:
        """Packed analog of FixedCell._project_resize: resize + 1x1-project
        with the same eval-mode project-before-upsample commutation."""
        need_resize = p.size != tuple(size) or p.g != g_out
        upsample = need_resize and size[-1] > p.data.shape[3]
        if not project:
            return resize_packed(p, size, g_out) if need_resize else p
        if need_resize and upsample and not train:
            p = PackedConvBR(self.c_out, (1, 1, 1), use_relu=False, dtype=self.dtype, name=name)(
                p, train=False
            )
            p = resize_packed(p, size, g_out)
            return Packed(nn.relu(p.data), g=p.g, channels=p.channels, lane_map=p.lane_map)
        if need_resize:
            p = resize_packed(p, size, g_out)
        return PackedConvBR(self.c_out, (1, 1, 1), dtype=self.dtype, name=name)(p, train=train)

    @nn.compact
    def __call__(self, s0: Packed, s1: Packed, *, train: bool = False):
        prev_input = s1
        if self.downup_sample != 0:
            scale = 0.5 if self.downup_sample == -1 else 2.0
            size = tuple(scale_dimension(d, scale) for d in s1.size)
        else:
            size = s1.size
        g = choose_pack(size[0], self.c_out)

        s0 = self._project_resize(
            s0, size, g, "pre_preprocess", project=s0.channels != self.c_out, train=train
        )
        s1 = self._project_resize(s1, size, g, "preprocess", project=True, train=train)

        active = dict()
        for seq, (edge, op) in enumerate(self.genotype.active_edges()):
            active[edge] = (seq, op)

        states = [s0, s1]
        offset = 0
        for _ in range(self.steps):
            new_data = []
            for j, h in enumerate(states):
                edge = offset + j
                if edge in active:
                    seq, op = active[edge]
                    if op == OP_SKIP:
                        new_data.append(h.data)
                    else:
                        assert op == OP_CONV
                        out = PackedConvBR(self.c_out, (3, 3, 3), dtype=self.dtype, name=f"op_{seq}")(
                            h, train=train
                        )
                        new_data.append(out.data)
            offset += len(states)
            states.append(Packed(sum(new_data), g=g, channels=self.c_out))

        # The concat stays a free lane-concat (non-canonical map): successor
        # cells repack it to their own g inside preprocess anyway, so an
        # eager repack here would just round-trip transposes. Consumers that
        # do suffer from the over-packed layout (the 3x3x3 skip convs) repack
        # at their own input instead.
        concat = concat_lanes(states[-self.block_multiplier :])
        return prev_input, concat


class PackedMatchingNet(nn.Module):
    """Packed-layout MatchingNet (same interface/params as
    ``matching_net.MatchingNet``; reference ``retrain/skip_model_3d.py:78``)."""

    genotype: Architecture
    filter_multiplier: int = 8
    block_multiplier: int = 4
    steps: int = 3
    skips: tuple[tuple[int, int], ...] = ((1, 4), (4, 8))
    dtype: jnp.dtype = jnp.bfloat16
    volume_pspec: tuple | None = None
    # Profiling hook (scripts/profile_forward.py): truncate the net right
    # after the named stage ("stem0", "stem1", "cell_<i>", "last_<s>") and
    # return that stage's raw packed data. Stage deltas then time the REAL
    # model's layers — no replica drift (the failure mode of the retired
    # profile_matching_trunc.py). None = normal full forward.
    profile_stop: str | None = None
    # Fused-head hook: when set, called as ``head_fn(last: Packed, kernel)``
    # with the pre-head packed volume and the ``last_3/conv/kernel`` param
    # (created either way, so the parameter tree is identical) and its result
    # is returned INSTEAD of the last_3 conv + unpack. LEAStereo uses this to
    # run the Pallas conv+soft-argmin head (ops/pallas_head.py) in one kernel.
    head_fn: Callable | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype)
        ifm = self.filter_multiplier * self.block_multiplier
        skips = {tgt: src for src, tgt in self.skips}

        if isinstance(x, tuple):
            left, right, num_disp = x
            d, h, w = num_disp, left.shape[1], left.shape[2]
            g0 = choose_pack(d, ifm)
            stem0 = PackedFusedStem0(ifm, g0, name="stem0", **kw)(left, right, num_disp, train=train)
        else:
            d, h, w = x.shape[1], x.shape[2], x.shape[3]
            g0 = choose_pack(d, ifm)
            from .matching_net import ConvBR  # unpacked stem on the explicit volume

            stem0 = pack(ConvBR(ifm, (3, 3, 3), 1, 1, name="stem0", **kw)(x, train=train), g0)
        if self.volume_pspec is not None:
            stem0 = Packed(
                jax.lax.with_sharding_constraint(
                    stem0.data, jax.sharding.PartitionSpec(*self.volume_pspec)
                ),
                g=stem0.g,
                channels=stem0.channels,
                lane_map=stem0.lane_map,
            )
        if self.profile_stop == "stem0":
            return stem0.data
        stem1 = PackedConvBR(ifm, (3, 3, 3), name="stem1", **kw)(stem0, train=train)
        if self.profile_stop == "stem1":
            return stem1.data

        concats: list[Packed] = []
        s0, s1 = stem0, stem1
        for i, level in enumerate(self.genotype.network_path):
            prev_raw, concat = PackedFixedCell(
                steps=self.steps,
                block_multiplier=self.block_multiplier,
                c_out=self.filter_multiplier * FILTER_SCALE[level],
                downup_sample=self.genotype.downup(i),
                genotype=self.genotype,
                name=f"cell_{i}",
                **kw,
            )(s0, s1, train=train)
            concats.append(concat)
            if i in skips:
                fused = concat_lanes([concats[skips[i]], concat])
                fused = repack(fused, choose_pack(fused.depth, fused.channels))
                concat = PackedConvBR(ifm * 2, (3, 3, 3), name=f"skip_conv_{i}", **kw)(
                    fused, train=train
                )
            s0, s1 = prev_raw, concat
            if self.profile_stop == f"cell_{i}":
                return concat.data

        last = concats[-1]
        level = self.genotype.network_path[-1]

        if level >= 3:
            last = PackedConvBR(ifm * 4, (1, 1, 1), name="last_24", **kw)(last, train=train)
            last = resize_packed(last, (d // 4, h // 4, w // 4), choose_pack(d // 4, ifm * 4))
            if self.profile_stop == "last_24":
                return last.data
        if level >= 2:
            last = PackedConvBR(ifm * 2, (1, 1, 1), name="last_12", **kw)(last, train=train)
            last = resize_packed(last, (d // 2, h // 2, w // 2), choose_pack(d // 2, ifm * 2))
            if self.profile_stop == "last_12":
                return last.data
        if level >= 1:
            last = PackedConvBR(ifm, (1, 1, 1), name="last_6", **kw)(last, train=train)
            last = resize_packed(last, (d, h, w), choose_pack(d, ifm))
            if self.profile_stop == "last_6":
                return last.data
        if self.head_fn is not None:
            kernel = _HeadKernel((3, 3, 3, last.channels, 1), name="last_3")()
            if not last.is_canonical():
                last = repack(last, last.g)
            return self.head_fn(last, kernel.astype(self.dtype))
        mat = PackedConvBR(1, (3, 3, 3), use_bn=False, use_relu=False, name="last_3", **kw)(
            last, train=train
        )
        return unpack(mat)


class _HeadKernel(nn.Module):
    """Bare ``conv/kernel`` param holder named ``last_3`` — reproduces the
    exact ``last_3/conv/kernel`` path of the ConvBR head it substitutes."""

    shape: tuple[int, ...]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return _KernelParam(self.shape, name="conv")()

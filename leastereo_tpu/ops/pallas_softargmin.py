"""Pallas TPU kernel: fused trilinear-3x-upsample + softmin + soft-argmin.

Same real-number math as :func:`leastereo_tpu.ops.softargmin.soft_argmin`
(reference ``models/build_model_2d.py:52-57``): the 1-channel matching cost
``(B, D, h, w)`` is trilinearly upsampled 3x in D/H/W (align_corners=False),
softmin'd over the 3D disparity planes and reduced to the expectation — but
as ONE fused kernel that never leaves VMEM between the upsample and the
reduction.

Why a kernel: the XLA path holds the ``(B, D, 3h, 3w)`` fp32 phase tensors in
HBM (~122 MB each at the KITTI shape) across the two softmax passes (min,
exp-sum) — several full-volume HBM round trips. Here each grid program DMAs
one ``(D, th+2, w+2)`` halo band (~1 MB), produces all 9 (row-phase,
col-phase) output planes for the band in VMEM, and writes only the final
``(th, w)`` expectations. HBM traffic drops from O(GB) to
``read (B,D,h,w) + write (B,3h,3w)`` ≈ 15 MB.

Layout notes (see /opt/skills/guides/pallas_guide.md):
  * blocks keep ``w`` on the 128-lane axis; the halo is one edge-replicated
    pad done host-side so every band DMA has a static shape;
  * output is written phase-planar ``(B, 3, 3, h, w)``; the final
    ``out[b, 3i+rh, 3j+rw] = p[b, rh, rw, i, j]`` interleave is one tiny
    (2 MB) XLA transpose outside the kernel;
  * the disparity axis stays resident per band (D = maxdisp/3 = 64 planes),
    so the 3x d-phase blends and the softmin reduction are VPU-local.

Differentiation: the kernel is forward-only; :func:`soft_argmin_fused` wraps
it in ``jax.custom_vjp`` whose backward re-derives gradients through the
reference jnp implementation (rematerialised), so training paths can use the
fused head too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["soft_argmin_fused", "soft_argmin_pallas", "pallas_supported"]


def _band_kernel(x_hbm, out_ref, band, sem, *, th: int, d: int, w: int):
    """One H-band: DMA ``(D, th+2, w+2)`` halo, emit 9 phase planes."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    # DMA an 8-row-aligned superset of the halo band (Mosaic requires DMA
    # slices aligned to the sublane tiling); the true ±1 halo is taken with
    # static sub-slices below. Host side pads H by 8 on each side.
    cp = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * th, th + 16), :],
        band,
        sem,
    )
    cp.start()
    cp.wait()

    x = band[:, 7 : th + 9, :].astype(jnp.float32)  # (D, th+2, w+2)
    third = jnp.float32(1.0 / 3.0)
    two_third = jnp.float32(2.0 / 3.0)

    # 3*d' disparity index factored as sum(i3 * s + t): i3 = 3d.
    i3 = 3.0 * jax.lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0).astype(jnp.float32)

    for rh in range(3):
        # H-phase blend (align_corners=False 3x): rows of the output band.
        if rh == 0:
            ch = third * x[:, 0:th, :] + two_third * x[:, 1 : th + 1, :]
        elif rh == 1:
            ch = x[:, 1 : th + 1, :]
        else:
            ch = two_third * x[:, 1 : th + 1, :] + third * x[:, 2 : th + 2, :]
        for rw in range(3):
            # W-phase blend on the halo'd columns.
            if rw == 0:
                cw = third * ch[:, :, 0:w] + two_third * ch[:, :, 1 : w + 1]
            elif rw == 1:
                cw = ch[:, :, 1 : w + 1]
            else:
                cw = two_third * ch[:, :, 1 : w + 1] + third * ch[:, :, 2 : w + 2]
            # D-phase costs (edge-clamped neighbours), matching
            # softargmin.soft_argmin's (xm1 + 2x)/3 form exactly.
            cm1 = jnp.concatenate([cw[0:1], cw[: d - 1]], axis=0)
            cp1 = jnp.concatenate([cw[1:], cw[d - 1 : d]], axis=0)
            a0 = (cm1 + 2.0 * cw) * third
            a2 = (2.0 * cw + cp1) * third
            # Softmin over all 3D phases; m is the per-pixel stabiliser.
            m = jnp.min(jnp.minimum(jnp.minimum(a0, cw), a2), axis=0, keepdims=True)
            e0 = jnp.exp(m - a0)
            e1 = jnp.exp(m - cw)
            e2 = jnp.exp(m - a2)
            s = e0 + e1 + e2
            den = jnp.sum(s, axis=0)
            num = jnp.sum(i3 * s + (e1 + 2.0 * e2), axis=0)
            out_ref[0, rh, rw] = num / den


def pallas_supported(shape: tuple[int, ...]) -> bool:
    """True when the fused kernel handles this ``(B, D, h, w)`` cost shape."""
    if len(shape) != 4:
        return False
    _, _, h, _ = shape
    # Single-device only: pallas_call has no GSPMD partitioning rule, so
    # multi-device meshes (data/disp sharding) keep the jnp parity path.
    return h % 8 == 0 and jax.default_backend() == "tpu" and jax.device_count() == 1


@functools.partial(jax.jit, static_argnums=(1, 2))
def soft_argmin_pallas(x: jnp.ndarray, maxdisp: int, interpret: bool = False) -> jnp.ndarray:
    """Fused-kernel disparity regression. ``x``: (B, D, h, w) cost planes.

    Numerically equivalent to the jnp parity path up to fp32 reassociation
    (blend order W/H swapped); validated to <1e-3 px in
    ``tests/test_pallas_softargmin.py``.
    """
    bsz, d, h, w = x.shape
    if maxdisp != 3 * d:
        raise ValueError(f"maxdisp {maxdisp} != 3 * D ({d})")
    th = 8
    if h % th:
        raise ValueError(f"h={h} not divisible by band height {th}")
    # H padded 8 each side (DMA sublane alignment; true halo is ±1), W padded
    # to the next multiple of 128 (DMA lane alignment; cols beyond w+2 unused).
    wp = -(-(w + 2) // 128) * 128
    xp = jnp.pad(x, ((0, 0), (0, 0), (8, 8), (1, wp - w - 1)), mode="edge")

    kernel = functools.partial(_band_kernel, th=th, d=d, w=w)
    phases = pl.pallas_call(
        kernel,
        grid=(bsz, h // th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, 3, 3, th, w), lambda b, i: (b, 0, 0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, 3, 3, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((d, th + 16, wp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp)
    # Interleave phases: out[b, 3i+rh, 3j+rw] = phases[b, rh, rw, i, j].
    out = jnp.transpose(phases, (0, 3, 1, 4, 2))
    return out.reshape(bsz, 3 * h, 3 * w)


def _jnp_soft_argmin(cost: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    from .softargmin import soft_argmin

    return soft_argmin(cost, maxdisp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def soft_argmin_fused(cost: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """Drop-in ``soft_argmin`` with the fused Pallas forward.

    Args mirror :func:`leastereo_tpu.ops.softargmin.soft_argmin`:
    ``cost`` is the NDHWC matching output ``(B, D, h, w, 1)``.
    """
    x = cost[..., 0].astype(jnp.float32)
    return soft_argmin_pallas(x, maxdisp)


def _fused_fwd(cost, maxdisp):
    return soft_argmin_fused(cost, maxdisp), cost


def _fused_bwd(maxdisp, cost, g):
    # Gradients via the (rematerialised) jnp reference path — identical math.
    _, vjp = jax.vjp(lambda c: _jnp_soft_argmin(c, maxdisp), cost)
    return vjp(g)


soft_argmin_fused.defvjp(_fused_fwd, _fused_bwd)

"""Pallas TPU kernel: fused matching-head — final 1-channel 3x3x3 conv +
trilinear-3x-upsample soft-argmin, straight off the depth-packed volume.

Replaces the chain ``PackedConvBR(last_3) -> unpack -> soft_argmin_pallas``
(reference ``retrain/skip_model_3d.py:174`` ``conv_out`` then
``models/build_model_2d.py:52-57`` ``Disp``). That chain is dominated not by
math but by layout: a 1-output-channel conv emits a G-lane (128/G-times
padded) tensor, the unpack transposes a 1-channel NDHWC volume, and XLA's
layout assignment — pulled between the packed producer and the head consumer
— picks bitcast layouts that run the conv at ~30 GB/s (measured 13.6 ms of
the 56 ms KITTI forward; every XLA-level restructuring attempt just moved the
pathology, see PROFILE_r04.json / the round-4 commit log).

The kernel owns the whole head instead:

  * each grid program DMAs a ``(th+4, tw+16, D*C)`` halo band straight from
    the UNPADDED packed volume (clamped 3-branch DMA; the H/W conv zero
    padding is zero-filled in VMEM) — one lane-block DMA per depth tile, so
    the flattened lane axis is exactly ``(d, c)`` and the "transpose"
    happens inside the DMA for free;
  * the 1-channel 3x3x3 conv collapses to 3 MXU contractions (one per kw)
    against a kh-blocked ``(D*C, 3D)`` band matrix
    (``M2[kw][(d_in, c), kh*D + d_out] = K[d_in-d_out+1, kh, kw, c]``),
    producing the cost band ``(th+2, tw+2, D)`` in VMEM with disparity on
    lanes;
  * the trilinear 3x upsample + softmin + expectation then runs per output
    phase exactly as in :mod:`leastereo_tpu.ops.pallas_softargmin`, with the
    d-phase blends as lane rolls — the ``(B, D, h, w)`` cost volume never
    exists in HBM at all.

HBM traffic for the entire head: read the packed volume once (+halo
amplification ~1.7x) + write the (B, 3h, 3w) disparity map.

Differentiation: forward-only; :func:`conv_soft_argmin_fused` wraps it in
``jax.custom_vjp`` whose backward re-derives through the jnp reference path
(eval-serving uses the kernel; training keeps the XLA-fused path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "conv_soft_argmin_fused",
    "conv_soft_argmin_pallas",
    "fused_head_supported",
    "fused_head_gate_reason",
]

_TH = 8  # H rows per grid program (output band height)


def _band_bytes(d: int, w: int, channels: int, itemsize: int) -> int:
    """VMEM bytes of one full-width input halo band."""
    return (_TH + 4) * (w + 16) * d * channels * itemsize


def fused_head_gate_reason(
    b: int, d: int, h: int, w: int, channels: int, g: int, itemsize: int = 2
) -> str | None:
    """``None`` when the fused head kernel handles this packed cost shape;
    otherwise a human-readable reason for falling back to the XLA head
    (~2x slower at the KITTI shape — worth a log line, see cli/predict.py)."""
    if d % g != 0:
        return f"depth {d} not divisible by packing g={g}"
    if g * channels % 128 != 0:
        return f"lanes g*C={g * channels} not a multiple of 128 (lane-block DMA)"
    if d > 128:
        return f"maxdisp/3={d} > 128 lanes (disparity must fit on lanes)"
    if h % _TH != 0 or h < 2 * _TH:
        return f"1/3-res height {h} not a multiple of {_TH} (>= {2 * _TH})"
    if w % 8 != 0:
        return f"1/3-res width {w} not a multiple of 8 (MXU window alignment)"
    if 2 * _band_bytes(d, w, channels, itemsize) > 56 * 1024 * 1024:
        return f"halo bands need {2 * _band_bytes(d, w, channels, itemsize) >> 20} MB VMEM > 56 MB"
    if jax.default_backend() != "tpu":
        return f"backend is {jax.default_backend()!r}, kernel is TPU-only"
    if jax.device_count() != 1:
        return f"{jax.device_count()} devices (kernel is single-device; sharded paths use jnp)"
    return None


def fused_head_supported(
    b: int, d: int, h: int, w: int, channels: int, g: int, itemsize: int = 2
) -> bool:
    """True when the fused head kernel handles this packed cost shape."""
    return fused_head_gate_reason(b, d, h, w, channels, g, itemsize) is None


def _head_kernel(
    x_hbm, m_ref, out_ref, band, shifted, sems, *, t_tiles, th, tw, d, hh, ww, l
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = hh // th  # grid height (>= 2 by support gate)
    conv_w = tw + 8  # sublane-aligned conv width (tw % 8 == 0 by support gate)

    # DMA the (th+4)-row halo band straight from the UNPADDED volume — a
    # host-side pad of the full volume costs ~0.7 ms of pure HBM copy at the
    # KITTI shape (trace_forward pad.162). The 2-row H halos beyond the frame
    # (conv zero padding) are zero-filled in VMEM for the first/last band;
    # the 8-col W halos are zero-filled always. Data lands at band[:, 8:8+w].
    band[:, 0:8, :] = jnp.zeros((th + 4, 8, band.shape[-1]), band.dtype)
    band[:, 8 + tw :, :] = jnp.zeros(
        (th + 4, band.shape[1] - 8 - tw, band.shape[-1]), band.dtype
    )

    @pl.when(i == 0)
    def _():
        band[0:2, 8 : 8 + tw, :] = jnp.zeros((2, tw, band.shape[-1]), band.dtype)

    @pl.when(i == nb - 1)
    def _():
        band[th + 2 :, 8 : 8 + tw, :] = jnp.zeros((2, tw, band.shape[-1]), band.dtype)

    def dma(t, method):
        mid = jnp.logical_and(i > 0, i < nb - 1)

        @pl.when(mid)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[b, t, pl.ds(i * th - 2, th + 4), :, :],
                band.at[:, pl.ds(8, tw), t * l : (t + 1) * l],
                sems.at[t],
            )
            getattr(cp, method)()

        @pl.when(i == 0)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[b, t, pl.ds(0, th + 2), :, :],
                band.at[pl.ds(2, th + 2), pl.ds(8, tw), t * l : (t + 1) * l],
                sems.at[t],
            )
            getattr(cp, method)()

        @pl.when(i == nb - 1)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[b, t, pl.ds(i * th - 2, th + 2), :, :],
                band.at[pl.ds(0, th + 2), pl.ds(8, tw), t * l : (t + 1) * l],
                sems.at[t],
            )
            getattr(cp, method)()

    for t in range(t_tiles):
        dma(t, "start")
    for t in range(t_tiles):
        dma(t, "wait")

    # Cost band: local (a, c) covers global (i*th - 1 + a, c - 1); the zeroed
    # halo strips reproduce the conv's zero padding at frame borders.
    #
    # MXU operands must be sublane-aligned: a dot_general whose leading dims
    # flatten to a non-multiple-of-8 extent (e.g. the natural (th+2, tw+2)
    # window) makes Mosaic emit per-row relayout code with superlinear compile
    # cost (one such dot: 40 s; nine: the compile service OOMs). So every dot
    # runs on an aligned (*, cw, D*C) window: the kw = 2 tap reads the band at
    # sublane offset 8 directly, the kw = 0/1 taps go through one aligned
    # VPU copy each, and the ragged (tw+2)-wide cost is sliced out afterwards.
    #
    # The three kh taps of one kw share the same operand window, so they run
    # as ONE dot against the kh-blocked (D*C, 3D) matrix — 3 MXU launches
    # with N = 3D instead of 9 with N = D (D = 64 fills half a lane tile;
    # blocking raises MXU occupancy 1.5x). Block kh lands at lanes [kh*D).
    acc = jnp.zeros((th + 2, conv_w, d), jnp.float32)
    for kw in range(3):
        if kw == 2:
            src = band
            off = 8
        else:
            shifted[:, :, :] = band[:, 6 + kw : 6 + kw + conv_w, :]
            src = shifted
            off = 0
        out = jax.lax.dot_general(
            src[:, off : off + conv_w, :],
            m_ref[kw],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (th+4, conv_w, 3D): out[r, :, kh*D + j] = cost tap kh at row r-kh
        acc = (
            acc
            + out[0 : th + 2, :, 0:d]
            + out[1 : th + 3, :, d : 2 * d]
            + out[2 : th + 4, :, 2 * d : 3 * d]
        )
    acc = acc[:, : tw + 2, :]

    # Edge-replicate the cost halo (the upsample clamps at frame borders,
    # unlike the conv's zero padding): only border grid programs hit these.
    ri = i * th - 1 + jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    cost = jnp.where(ri < 0, jnp.roll(acc, -1, axis=0), acc)
    cost = jnp.where(ri > hh - 1, jnp.roll(cost, 1, axis=0), cost)
    ci = -1 + jax.lax.broadcasted_iota(jnp.int32, (1, tw + 2, 1), 1)
    cost = jnp.where(ci < 0, jnp.roll(cost, -1, axis=1), cost)
    cost = jnp.where(ci > ww - 1, jnp.roll(cost, 1, axis=1), cost)

    third = jnp.float32(1.0 / 3.0)
    two_third = jnp.float32(2.0 / 3.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (th, tw, d), 2)
    i3 = 3.0 * lane.astype(jnp.float32)

    for rh in range(3):
        if rh == 0:
            ch = third * cost[0:th] + two_third * cost[1 : th + 1]
        elif rh == 1:
            ch = cost[1 : th + 1]
        else:
            ch = two_third * cost[1 : th + 1] + third * cost[2 : th + 2]
        for rw in range(3):
            if rw == 0:
                cw = third * ch[:, 0:tw] + two_third * ch[:, 1 : tw + 1]
            elif rw == 1:
                cw = ch[:, 1 : tw + 1]
            else:
                cw = two_third * ch[:, 1 : tw + 1] + third * ch[:, 2 : tw + 2]
            # D-phase costs (edge-clamped lane rolls), then softmin over all
            # 3D phases — identical math to ops/softargmin.soft_argmin.
            cm1 = jnp.where(lane == 0, cw, jnp.roll(cw, 1, axis=2))
            cp1 = jnp.where(lane == d - 1, cw, jnp.roll(cw, -1, axis=2))
            a0 = (cm1 + 2.0 * cw) * third
            a2 = (2.0 * cw + cp1) * third
            m = jnp.min(jnp.minimum(jnp.minimum(a0, cw), a2), axis=2, keepdims=True)
            e0 = jnp.exp(m - a0)
            e1 = jnp.exp(m - cw)
            e2 = jnp.exp(m - a2)
            s = e0 + e1 + e2
            den = jnp.sum(s, axis=2)
            num = jnp.sum(i3 * s + (e1 + 2.0 * e2), axis=2)
            out_ref[0, rh, rw] = num / den


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def conv_soft_argmin_pallas(
    data: jnp.ndarray,
    kernel: jnp.ndarray,
    g: int,
    channels: int,
    maxdisp: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused head on a canonical packed volume.

    Args:
      data: ``(B, D/g, H, W, g*channels)`` canonical depth-packed volume.
      kernel: ``(3, 3, 3, channels, 1)`` DHWIO head-conv kernel.
      g, channels: packing descriptor (``g * channels`` must be 128).
      maxdisp: full-resolution disparity count (= 3 * D).

    Returns:
      ``(B, 3H, 3W)`` fp32 disparity map.
    """
    b, dg, h, w, li = data.shape
    d = dg * g
    c = channels
    assert li == g * c, (li, g, c)
    if maxdisp != 3 * d:
        raise ValueError(f"maxdisp {maxdisp} != 3 * D ({d})")
    th = _TH
    tw = w
    assert h % th == 0 and h >= 2 * th, h

    # Band matrix M[(d_in, c), d_out] = K[d_in - d_out + 1, kh, kw, c],
    # kh-blocked for the grouped conv dots: m2[kw][:, kh*D + j] = M[kh, kw, :, j].
    m = None
    for kd in range(3):
        bandm = jnp.asarray(np.eye(d, k=1 - kd, dtype=np.float32), kernel.dtype)
        term = bandm[None, None, :, None, :] * kernel[kd, :, :, None, :, 0, None]
        m = term if m is None else m + term  # (3, 3, d, C, d)
    m = m.reshape(3, 3, d * c, d)
    m2 = jnp.concatenate([m[0], m[1], m[2]], axis=-1)  # (3=kw, D*C, 3D)

    kern = functools.partial(_head_kernel, t_tiles=dg, th=th, tw=tw, d=d, hh=h, ww=w, l=li)
    phases = pl.pallas_call(
        kern,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, d * c, 3 * d), lambda bb, ii: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, 3, th, tw), lambda bb, ii: (bb, 0, 0, ii, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, 3, 3, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((th + 4, tw + 16, dg * li), data.dtype),
            pltpu.VMEM((th + 4, tw + 8, dg * li), data.dtype),
            pltpu.SemaphoreType.DMA((dg,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(data, m2)
    out = jnp.transpose(phases, (0, 3, 1, 4, 2))
    return out.reshape(b, 3 * h, 3 * w)


def _jnp_reference(data, kernel, g, channels, maxdisp):
    """XLA path with identical math (backward + fallback): collapse conv to
    an explicit (B, D, h, w, 1) cost, then the jnp parity soft-argmin."""
    from .packed3d import Packed, conv3x3_packed_collapse
    from .softargmin import soft_argmin

    cost = conv3x3_packed_collapse(Packed(data, g=g, channels=channels), kernel)
    return soft_argmin(cost[..., None], maxdisp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv_soft_argmin_fused(data, kernel, g: int, channels: int, maxdisp: int):
    """Drop-in fused head: Pallas forward, jnp-reference backward."""
    return conv_soft_argmin_pallas(data, kernel, g, channels, maxdisp)


def _fused_fwd(data, kernel, g, channels, maxdisp):
    return conv_soft_argmin_fused(data, kernel, g, channels, maxdisp), (data, kernel)


def _fused_bwd(g, channels, maxdisp, res, grad):
    data, kernel = res
    _, vjp = jax.vjp(lambda dd, kk: _jnp_reference(dd, kk, g, channels, maxdisp), data, kernel)
    return vjp(grad)


conv_soft_argmin_fused.defvjp(_fused_fwd, _fused_bwd)

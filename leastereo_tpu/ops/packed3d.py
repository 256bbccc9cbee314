"""Depth-packed NDHWC layout: the TPU-native representation of 5-D volumes.

The matching net's tensors are narrow — 8/16/32 channels (reference
``retrain/skip_model_3d.py:78-174`` with filter_multiplier 8). TPU HBM tiling
pads the minormost (lane) dimension to 128, so an NDHWC tensor with C=16
physically occupies 8x its logical bytes and every elementwise/BN/conv pass
pays that multiple in bandwidth (measured: level-1 matching cells cost
3.6-10 ms each against ~0.15 ms of useful FLOPs).

The fix: fold ``G`` consecutive depth planes into the channel dimension so
tensors are stored as ``(B, D/G, H, W, G*C)`` with ``G*C`` a multiple of (or
close to) 128 lanes. All ops then run at full lane utilisation:

* elementwise / BN: lane-tiled scale/bias, zero layout overhead;
* 1x1x1 convs: block-diagonal lane matmul (same math, dense MXU GEMM);
* 3x3x3 convs: a *block-banded* 2-D convolution — output plane ``g`` reads
  input planes ``g-1..g+1``, so a ``(3,3,(G+2)C, GC)`` kernel whose band
  blocks are the canonical ``(3,3,3,C,C')`` kernel reproduces the 3-D conv
  exactly (one zero-padded halo plane from each neighbouring tile). The
  zero blocks waste ``(G+2)/3`` FLOPs but raise the GEMM contraction to
  ``>=128`` lanes, which on TPU is a large net win (measured 3.4x on the
  stem-shaped conv, 64 -> 219 useful TFLOP/s);
* trilinear resize: H/W stay ordinary interpolation matmuls; the depth axis
  becomes a joint (tile, lane) -> (tile', lane') contraction with a static
  operator built from the interpolation matrix.

Lane bookkeeping: concatenating two packed tensors along lanes produces a
valid but *non-canonical* layout (source-major instead of plane-major). A
``lane_map`` records which (plane g, channel c) each lane holds; every
consumer builds its kernel/operator through the map, so concats are free.
Ops always *emit* canonical (g-major) layout.

This module is pure-function; the Flax modules live in
``models/matching_packed.py``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .resize import interp_matrix

__all__ = [
    "Packed",
    "pack",
    "unpack",
    "repack",
    "choose_pack",
    "conv3x3_packed",
    "conv3x3_packed_collapse",
    "conv1x1_packed",
    "resize_packed",
]


def canonical_lane_map(g: int, c: int) -> tuple[tuple[int, int], ...]:
    """Plane-major layout: lane ``i*c + j`` holds (plane i, channel j)."""
    return tuple((i, j) for i in range(g) for j in range(c))


@dataclasses.dataclass
class Packed:
    """A ``(B, D/G, H, W, L)`` depth-packed volume.

    ``lane_map[l] = (g, c)``: lane ``l`` holds channel ``c`` of depth plane
    ``tile*G + g``. ``channels`` is the logical channel count C (lanes = G*C).
    """

    data: jnp.ndarray
    g: int
    channels: int
    lane_map: tuple[tuple[int, int], ...] | None = None  # None = canonical

    def __post_init__(self):
        assert self.data.ndim == 5, self.data.shape
        assert self.data.shape[-1] == self.g * self.channels, (
            self.data.shape,
            self.g,
            self.channels,
        )

    @property
    def lanes(self) -> int:
        return self.g * self.channels

    @property
    def depth(self) -> int:
        return self.data.shape[1] * self.g

    @property
    def size(self) -> tuple[int, int, int]:
        """Logical (D, H, W)."""
        return (self.depth, self.data.shape[2], self.data.shape[3])

    def map(self) -> tuple[tuple[int, int], ...]:
        return self.lane_map or canonical_lane_map(self.g, self.channels)

    def is_canonical(self) -> bool:
        return self.lane_map is None or self.lane_map == canonical_lane_map(
            self.g, self.channels
        )


def concat_lanes(parts: list[Packed]) -> Packed:
    """Channel-concat of same-(size, g) packed tensors: a free lane concat.

    The result's logical channels are ``sum(p.channels)`` with part ``k``'s
    channels offset by the cumulative channel count (matching
    ``jnp.concatenate`` on the unpacked C axis)."""
    g = parts[0].g
    assert all(p.g == g and p.data.shape[:4] == parts[0].data.shape[:4] for p in parts)
    lane_map = []
    off = 0
    for p in parts:
        lane_map.extend((pg, off + pc) for pg, pc in p.map())
        off += p.channels
    return Packed(
        data=jnp.concatenate([p.data for p in parts], axis=-1),
        g=g,
        channels=off,
        lane_map=tuple(lane_map),
    )


def pack(x: jnp.ndarray, g: int) -> Packed:
    """``(B, D, H, W, C)`` -> canonical ``(B, D/g, H, W, g*C)``."""
    b, d, h, w, c = x.shape
    assert d % g == 0, (d, g)
    x = x.reshape(b, d // g, g, h, w, c)
    x = jnp.transpose(x, (0, 1, 3, 4, 2, 5))
    return Packed(x.reshape(b, d // g, h, w, g * c), g=g, channels=c)


def take_lanes(x: jnp.ndarray, order, axis: int = -1) -> jnp.ndarray:
    """``x[..., order, ...]`` along ``axis`` — TPU gathers are slow, so lane
    permutations lower to either a 0/1 permutation MATMUL (bf16 minor axis:
    the MXU streams it at full HBM bandwidth, where the equivalent
    slice-concat reads sub-lane-block strips at ~160 GB/s — measured 5x
    slower in-model, trace_forward concatenate.2x) or a concat of contiguous
    static slices (everything else; the maps here are run-structured)."""
    order = list(order)
    runs = _chan_runs(order)
    if len(runs) == 1 and runs[0] == (0, x.shape[axis]):
        return x
    minor = axis == x.ndim - 1 or axis == -1
    # Lane cap 1024: the one-hot dot wastes FLOPs linearly in lane count, but
    # even the 1024-lane skip-fusion reorder (runs of 16) costs ~0.56 ms of
    # MXU vs ~1.2 ms of 16-lane strided concats (trace_forward
    # concatenate.22-29); beyond 1k lanes assume the slice path wins.
    if minor and x.dtype == jnp.bfloat16 and len(order) <= 1024 and len(runs) > 1:
        # One-hot is exact in bf16 and f32 accumulation reproduces the
        # values bit-exactly (sum of a single product).
        perm = np.zeros((x.shape[axis], len(order)), np.float32)
        perm[order, np.arange(len(order))] = 1.0
        return jax.lax.dot_general(
            x,
            jnp.asarray(perm, x.dtype),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        )
    parts = [jax.lax.slice_in_dim(x, a, z, axis=axis) for a, z in runs]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)


def _canonical_order(p: Packed) -> np.ndarray:
    return np.argsort([pg * p.channels + pc for pg, pc in p.map()], kind="stable")


def unpack(p: Packed) -> jnp.ndarray:
    """Inverse of :func:`pack` (handles non-canonical maps)."""
    b, dg, h, w, _ = p.data.shape
    x = p.data
    if not p.is_canonical():
        x = take_lanes(x, _canonical_order(p), axis=-1)
    x = x.reshape(b, dg, h, w, p.g, p.channels)
    x = jnp.transpose(x, (0, 1, 4, 2, 3, 5))
    return x.reshape(b, dg * p.g, h, w, p.channels)


def repack(p: Packed, g_out: int) -> Packed:
    """Re-tile a packed volume to packing factor ``g_out`` (canonical output).

    A pure layout change: one lane slice-concat (if the map is non-canonical)
    plus one tile<->lane transpose. Used at concat/skip boundaries so wide
    concats (C >= 32) drop to the smallest g with ``g*C >= 128`` lanes —
    over-packed tensors make the banded 3x3x3 conv pay a ``(g+2)/3`` FLOP
    blowup on an already-lane-full operand."""
    d, c, g = p.depth, p.channels, p.g
    assert d % g_out == 0, (d, g_out)
    if g == g_out and p.is_canonical():
        return p
    b, dg, h, w, _ = p.data.shape
    x = p.data
    if not p.is_canonical():
        x = take_lanes(x, _canonical_order(p), axis=-1)
    if g_out < g:
        r = g // g_out
        x = x.reshape(b, dg, h, w, r, g_out * c)
        x = jnp.transpose(x, (0, 1, 4, 2, 3, 5))
        x = x.reshape(b, dg * r, h, w, g_out * c)
    elif g_out > g:
        r = g_out // g
        x = x.reshape(b, dg // r, r, h, w, g * c)
        x = jnp.transpose(x, (0, 1, 3, 4, 2, 5))
        x = x.reshape(b, dg // r, h, w, g_out * c)
    return Packed(x, g=g_out, channels=c)


def choose_pack(depth: int, channels: int, max_lanes: int = 512) -> int:
    """Packing factor for a (depth, channels) volume: the smallest g dividing
    ``depth`` with ``g*channels >= 128`` lanes (minimising the banded conv's
    ``(g+2)/3`` FLOP factor), else the largest divisor under ``max_lanes``.

    Falls back gracefully for awkward depths (e.g. Middlebury maxdisp 408 ->
    D = 136/68/34 per level, where only g in {2, 4, 8} divide). ``g = 1``
    is never chosen when any g >= 2 divides: the banded conv's halo concat
    reads ``(g+2)/g`` x the input, which is worst (3x) at g = 1 — measured
    slower than g = 2 even for lane-full C = 128 operands."""
    # A 256-lane target looks better for the banded conv in isolation (halo
    # amplification (g+2)/g: 1.36 -> 1.07 ms on the stem shape) but loses
    # end-to-end: the resize operators, repack boundaries and the fused head
    # all get slower at g=8 (bench 16.2 -> 14.4 fps). Keep 128.
    divisors = [g for g in (2, 4, 8, 16) if depth % g == 0 and g * channels <= max_lanes]
    full = [g for g in divisors if g * channels >= 128]
    if full:
        return full[0]
    return divisors[-1] if divisors else 1


def _chan_runs(chans) -> list[tuple[int, int]]:
    """Split a channel-index sequence into maximal consecutive runs
    [start, stop) — so a kernel row gather becomes a concat of slices
    (TPU gathers are slow; slices are free)."""
    runs = []
    i = 0
    while i < len(chans):
        j = i + 1
        while j < len(chans) and chans[j] == chans[j - 1] + 1:
            j += 1
        runs.append((chans[i], chans[j - 1] + 1))
        i = j
    return runs


def _rows_for(kernel_c: jnp.ndarray, chans) -> jnp.ndarray:
    """``kernel_c[..., chans, :]`` via static slices (no gather). ``chans``
    indexes the second-to-last axis."""
    parts = [kernel_c[..., a:z, :] for a, z in _chan_runs(list(chans))]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-2)


def _plane_runs(lane_map, g_sel: int) -> list[tuple[int, int]]:
    """Contiguous lane runs [start, stop) whose plane index == g_sel."""
    runs = []
    start = None
    for l, (pg, _) in enumerate(lane_map):
        if pg == g_sel and start is None:
            start = l
        elif pg != g_sel and start is not None:
            runs.append((start, l))
            start = None
    if start is not None:
        runs.append((start, len(lane_map)))
    return runs


def conv3x3_packed(p: Packed, kernel: jnp.ndarray) -> Packed:
    """3x3x3 stride-1 pad-1 conv on a packed volume via a block-banded 2-D conv.

    ``kernel``: canonical DHWIO ``(3, 3, 3, Cin, Cout)``. Exact same multiply
    set as ``conv3d`` on the unpacked volume (summation reassociated only).
    Output is canonical ``(B, Dg, H, W, G*Cout)``.
    """
    kd_, kh_, kw_, cin, cout = kernel.shape
    assert (kd_, kh_, kw_) == (3, 3, 3) and cin == p.channels, (kernel.shape, p.channels)
    g = p.g
    lane_map = p.map()
    b, dg, h, w, li = p.data.shape

    # Halo: previous tile's plane g-1 lanes and next tile's plane 0 lanes
    # (zero at the depth boundary — conv depth padding).
    halo_prev_runs = _plane_runs(lane_map, g - 1)
    halo_next_runs = _plane_runs(lane_map, 0)
    x = p.data

    def shift_tiles(arr, delta):
        if delta == -1:  # previous tile
            return jnp.pad(arr[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
        return jnp.pad(arr[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))

    ext_parts = [shift_tiles(x[..., a:z], -1) for a, z in halo_prev_runs]
    ext_parts.append(x)
    ext_parts += [shift_tiles(x[..., a:z], +1) for a, z in halo_next_runs]
    ext = jnp.concatenate(ext_parts, axis=-1) if len(ext_parts) > 1 else ext_parts[0]

    # Ext lane e -> (plane offset relative to tile, channel).
    ext_planes, ext_chans = [], []
    for a, z in halo_prev_runs:
        for l in range(a, z):
            ext_planes.append(lane_map[l][0] - g)  # = -1
            ext_chans.append(lane_map[l][1])
    for pg, pc in lane_map:
        ext_planes.append(pg)
        ext_chans.append(pc)
    for a, z in halo_next_runs:
        for l in range(a, z):
            ext_planes.append(lane_map[l][0] + g)  # = g
            ext_chans.append(lane_map[l][1])
    ext_planes = np.asarray(ext_planes)
    ext_chans = np.asarray(ext_chans)
    le = len(ext_planes)

    # banded[kh, kw, e, go*Cout + co] = kernel[kd, kh, kw, c(e), co]
    # where kd = plane(e) - go + 1, zero outside [0, 3). Built gather-free:
    # T = kernel rows re-ordered to ext lanes via static slices, then one
    # static 0/1 selector mask per kd (TPU gathers are slow; selects fuse).
    kd_idx = ext_planes[:, None] - np.arange(g)[None, :] + 1  # (Le, G)
    t = _rows_for(kernel, ext_chans)  # (3, 3, 3, Le, Cout)
    banded = None
    for kd in range(3):
        mask = jnp.asarray((kd_idx == kd).astype(np.float32), kernel.dtype)  # (Le, G)
        term = t[kd][:, :, :, None, :] * mask[None, None, :, :, None]  # (3,3,Le,G,Cout)
        banded = term if banded is None else banded + term
    banded = banded.reshape(3, 3, le, g * cout)

    y = jax.lax.conv_general_dilated(
        ext.reshape(b * dg, h, w, le),
        banded,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return Packed(y.reshape(b, dg, h, w, g * cout), g=g, channels=cout)


def conv3x3_packed_collapse(p: Packed, kernel: jnp.ndarray) -> jnp.ndarray:
    """3x3x3 stride-1 pad-1 conv with Cout == 1, emitting ``(B, D, H, W)``.

    The matching head's final convolution (reference
    ``retrain/skip_model_3d.py:174`` ``self.conv_out``) has a single output
    channel, so the banded form (:func:`conv3x3_packed`) would emit a
    ``G``-lane tensor — 128/G-times lane-padded — and the subsequent
    :func:`unpack` transposes a 1-channel NDHWC volume; together measured
    13.6 ms of the 56 ms KITTI forward (PROFILE_r04.json). Instead: transpose
    the packed volume once to spatial-major ``(B, H, W, D*C)`` (for a
    canonical map the flattened lane axis IS ``(d, c)``), then contract the
    entire depth axis in one 3x3 2-D convolution against a ``(3, 3, D*C, D)``
    band matrix ``M[(d_in, c), d_out] = K[d_in - d_out + 1, kh, kw, c]``
    (zero off the +-1 depth band). The output lands ``(B, H, W, D)`` with
    depth on lanes and is transposed to the head's ``(B, D, H, W)``; no
    narrow-lane tensor ever exists. The dense band matrix wastes D/3 of the
    MACs, but on lane-full MXU tiles that is still ~7x faster than the
    lane-starved exact form.
    """
    kd_, kh_, kw_, cin, cout = kernel.shape
    assert (kd_, kh_, kw_) == (3, 3, 3) and cout == 1 and cin == p.channels, (
        kernel.shape,
        p.channels,
    )
    b, dg, h, w, li = p.data.shape
    d, c = p.depth, p.channels
    x = p.data
    if not p.is_canonical():
        x = take_lanes(x, _canonical_order(p), axis=-1)
    x = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, d * c)
    # Force a PHYSICAL relayout: without the 1-D round trip, layout assignment
    # turns the transpose into a bitcast (T(2,128)-tiled {3,0,2,1} buffer) and
    # the conv reads physically-scattered data at ~30 GB/s. A rank-1 buffer
    # admits only the trivial layout, so the copy really happens and the conv
    # sees a standard T(8,128) operand. optimization_barrier alone does NOT
    # stop layout propagation.
    x = jax.lax.optimization_barrier(x.reshape(-1)).reshape(b, h, w, d * c)
    # M_kd[(d_in, c), d_out] = kernel[kd, kh, kw, c, 0] iff d_in == d_out + kd - 1.
    m = None
    for kd in range(3):
        band = jnp.asarray(np.eye(d, k=1 - kd, dtype=np.float32), kernel.dtype)
        term = band[None, None, :, None, :] * kernel[kd, :, :, None, :, 0, None]
        m = term if m is None else m + term  # (3, 3, d, C, d)
    # Materialise the band matrix BEFORE the conv: without the barrier XLA
    # fuses the (3, 3, D*C, D) construction into the convolution as an operand
    # fusion and recomputes it per output tile — measured 7.0 ms at 30 GB/s
    # for the conv (trace_forward fusion.2324) vs 0.64 ms with the operand
    # materialised. The matrix itself is 2.4 MB; building it costs ~nothing.
    m = jax.lax.optimization_barrier(m.reshape(3, 3, d * c, d))
    y = jax.lax.conv_general_dilated(
        x,
        m,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # ... and isolate the conv OUTPUT from its consumers: the downstream
    # (B, D, H, W) head transpose otherwise folds into the conv's dim_labels
    # and layout assignment picks a transposed T(2,128)-tiled output (seen as
    # convolution.1157 bf01/T(2,128) in the HLO dump), again ~10x slow. With
    # both barriers the conv runs b01f with default tiling; the transpose is
    # an explicit ~14 MB copy.
    y = jax.lax.optimization_barrier(y)
    return jnp.transpose(y, (0, 3, 1, 2))


def conv1x1_packed(p: Packed, kernel: jnp.ndarray) -> Packed:
    """1x1x1 conv: block-diagonal lane matmul. ``kernel``: ``(Cin, Cout)``."""
    cin, cout = kernel.shape
    assert cin == p.channels, (kernel.shape, p.channels)
    g = p.g
    lane_map = p.map()
    g_map = np.asarray([pg for pg, _ in lane_map])
    c_map = [pc for _, pc in lane_map]
    # flat[l, go*Cout + co] = kernel[c(l), co] * (g(l) == go); gather-free.
    rows = _rows_for(kernel, c_map)  # (Li, Cout)
    onehot = jnp.asarray((g_map[:, None] == np.arange(g)[None, :]).astype(np.float32), kernel.dtype)
    flat = (rows[:, None, :] * onehot[:, :, None]).reshape(len(lane_map), g * cout)
    y = jax.lax.dot_general(
        p.data, flat, dimension_numbers=(((4,), (0,)), ((), ()))
    )
    return Packed(y, g=g, channels=cout)


@functools.lru_cache(maxsize=None)
def _depth_tile_operator(
    d_in: int, g_in: int, d_out: int, g_out: int, align_corners: bool
) -> np.ndarray:
    """Static ``(Dg_in, g_in, Dg_out * g_out)`` depth interpolation operator:
    Q[t, g, t'*g_out + g'] = M[t'*g_out + g', t*g_in + g] — the interp matrix
    re-tiled. Channels stay a free (batch-like) axis of the contraction, so
    the cost is the true depth-interp FLOPs, not a dense (tile x lane)^2
    blowup carrying a C x C identity."""
    m = interp_matrix(d_in, d_out, align_corners)  # (d_out, d_in)
    return np.ascontiguousarray(m.T.reshape(d_in // g_in, g_in, d_out))


@functools.lru_cache(maxsize=None)
def _depth_mix_operator(
    d_in: int,
    g_in: int,
    d_out: int,
    g_out: int,
    channels: int,
    lane_map: tuple[tuple[int, int], ...],
    align_corners: bool,
) -> np.ndarray:
    """Static ``(Dg_in, L_in, Dg_out, L_out)`` joint depth+lane interpolation
    operator: Q[t, l, t', g'*C + c(l)] = M[t'*g_out + g', t*g_in + g(l)].

    Dense over lanes (carries a C x C identity, ~C x more FLOPs than the
    factored form) but emits the packed layout straight out of the MXU with
    no narrow-minor transpose — faster than the factored path whenever the
    output volume is no bigger than the input (downsampling)."""
    m = interp_matrix(d_in, d_out, align_corners)  # (d_out, d_in)
    dgi, dgo = d_in // g_in, d_out // g_out
    li = len(lane_map)
    q = np.zeros((dgi, li, dgo, g_out * channels), np.float32)
    out_rows = np.arange(d_out).reshape(dgo, g_out)
    in_cols = np.arange(d_in).reshape(dgi, g_in)
    for l, (pg, pc) in enumerate(lane_map):
        for gp in range(g_out):
            # (dgo, dgi) block of M for output plane-in-tile gp, input plane pg
            q[:, l, :, gp * channels + pc] = m[out_rows[:, gp][:, None], in_cols[:, pg][None, :]].T
    return q


def resize_packed(
    p: Packed,
    out_dhw: tuple[int, int, int],
    g_out: int,
    align_corners: bool = True,
) -> Packed:
    """Trilinear resize of a packed volume to ``out_dhw`` with output packing
    ``g_out``. Same interpolation math as ``ops.resize.resize3d`` (torch
    align_corners semantics; fp32-accurate contractions); like
    ``ops.resize._resize_axes``, each contraction moves its produced axis to
    the end and ONE final transpose restores logical order. Output canonical
    whenever the depth/lane mix runs; otherwise the lane_map is preserved.
    """
    d_out, h_out, w_out = out_dhw
    assert d_out % g_out == 0, (d_out, g_out)
    b, dg, h, w, li = p.data.shape
    d_in = p.depth
    mix_depth = d_in != d_out or p.g != g_out or not p.is_canonical()
    if mix_depth and d_in == d_out and h == h_out and w == w_out:
        return repack(p, g_out)  # pure layout change, no interpolation
    x = p.data
    if mix_depth and d_out > d_in and not p.is_canonical():
        # The upsample branch needs canonical lanes; reorder NOW while the
        # lane axis is still minor so take_lanes uses its permutation-matmul
        # path (post-contraction the lane axis sits mid-tensor and the
        # reorder falls back to strided slice-concats at ~165 GB/s —
        # trace_forward concatenate.2x).
        x = take_lanes(x, _canonical_order(p), axis=-1)
        p = Packed(x, g=p.g, channels=p.channels)

    # (Tried and rejected: an apply_interp_axis helper — 2-tap strided-slice
    # arithmetic with axes in place. Exact same math, but end-to-end it LOST
    # 2.8 fps: the per-phase strided reads + interleave defeat XLA fusion
    # worse than the dot lowering it was meant to replace. The interp dots
    # stay in matmul form; the helper was removed in r5 — see git history.)

    # Logical axis names at each physical position.
    ids = ["b", "dg", "h", "w", "l"]

    def contract(x, ids, name, mat, rhs_contract=None):
        pos = ids.index(name)
        dims = (pos,) if rhs_contract is None else (pos, ids.index("g"))
        rdims = (1,) if rhs_contract is None else rhs_contract
        # f32 operands + DEFAULT precision: on the TPU MXU, DEFAULT truncates
        # the f32 operands to bf16 and accumulates in f32 — i.e. effective
        # bf16-operand / f32-accumulate math (matching the model's bf16
        # activations; an exact-f32 caller would need HIGHEST). HIGHEST was
        # rejected: it drives XLA's TPU dot lowering into a giant-window
        # convolution emitter measured 2-9x off the bandwidth roofline
        # in-model (trace_forward fusion.51); the converts fuse into the
        # dot's operand reads.
        y = jax.lax.dot_general(
            x.astype(jnp.float32),
            jnp.asarray(mat, jnp.float32),
            dimension_numbers=((dims, rdims), ((), ())),
        ).astype(x.dtype)
        ids = [n for i, n in enumerate(ids) if i not in dims] + [name]
        return y, ids

    if h != h_out:
        x, ids = contract(x, ids, "h", interp_matrix(h, h_out, align_corners))
    if w != w_out:
        x, ids = contract(x, ids, "w", interp_matrix(w, w_out, align_corners))

    if mix_depth and d_out <= d_in:
        # Downsample/same-depth: the dense joint (tile, lane) operator. It
        # carries a C x C identity (~C x the interp FLOPs) but lands the
        # packed layout straight out of the MXU — measured faster than the
        # factored form + narrow-minor transpose when the output is small.
        q = _depth_mix_operator(d_in, p.g, d_out, g_out, p.channels, p.map(), align_corners)
        dg_pos, l_pos = ids.index("dg"), ids.index("l")
        dtype = x.dtype
        x = jax.lax.dot_general(
            x.astype(jnp.float32),
            jnp.asarray(q.reshape(q.shape[0], q.shape[1], -1), jnp.float32),
            dimension_numbers=(((dg_pos, l_pos), (0, 1)), ((), ())),
        ).astype(dtype)  # free axes + joint (Dg_out * L_out)
        shape = list(x.shape)
        shape[-1:] = [d_out // g_out, g_out * p.channels]
        x = x.reshape(shape)
        ids = [n for i, n in enumerate(ids) if i not in (dg_pos, l_pos)] + ["dg", "l"]
        perm = [ids.index(n) for n in ("b", "dg", "h", "w", "l")]
        x = jnp.transpose(x, perm)
        return Packed(x, g=g_out, channels=p.channels)

    if mix_depth:
        # Upsample: canonicalise lanes (static slice-concat), split L ->
        # (g, C), then contract (Dg, g) jointly with the re-tiled interp
        # matrix; C rides along as a free axis. The dense form's C x blowup
        # is unaffordable at the enlarged output; the price here is one
        # narrow-minor transpose of the output.
        lpos = ids.index("l")
        if not p.is_canonical():
            x = take_lanes(x, _canonical_order(p), axis=lpos)
        shape = list(x.shape)
        shape[lpos : lpos + 1] = [p.g, p.channels]
        x = x.reshape(shape)
        ids = ids[:lpos] + ["g", "c"] + ids[lpos + 1 :]
        q = _depth_tile_operator(d_in, p.g, d_out, g_out, align_corners)
        x, ids = contract(x, ids, "dg", q, rhs_contract=(0, 1))
        # x: free axes + joint (Dg_out * g_out); split and restore layout.
        shape = list(x.shape)
        shape[-1:] = [d_out // g_out, g_out]
        x = x.reshape(shape)
        ids = ids[:-1] + ["dg", "g"]
        perm = [ids.index(n) for n in ("b", "dg", "h", "w", "g", "c")]
        x = jnp.transpose(x, perm)
        x = x.reshape(b, d_out // g_out, h_out, w_out, g_out * p.channels)
        return Packed(x, g=g_out, channels=p.channels)

    perm = [ids.index(n) for n in ("b", "dg", "h", "w", "l")]
    if perm != [0, 1, 2, 3, 4]:
        x = jnp.transpose(x, perm)
    return Packed(x, g=p.g, channels=p.channels, lane_map=p.lane_map)

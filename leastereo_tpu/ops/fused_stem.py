"""Fused cost-volume construction + matching-stem convolution.

The reference materialises a 5-D concat feature volume and immediately runs
one 3x3x3 convolution over it (``models/build_model.py:56-65`` then the
matching stem ``retrain/skip_model_3d.py:137``). That volume is a *shear* of
two 2-D signals::

    vol[d, h, w, :C] = L[h, w]        * 1[w >= d]
    vol[d, h, w, C:] = R[h, w - d]    * 1[w >= d]

so convolving it in 3-D collapses algebraically: the left half is
d-invariant away from the ``w = d`` diagonal, and the right half is a
d-shifted copy of R. The full 3-D convolution over the ``(B, D, H, W, 2C)``
volume (377 GFLOP at the KITTI config, plus a 436 MB volume materialisation)
reduces **exactly** to 15 small 2-D convolutions on the 1/3-resolution
feature maps (~5 GFLOP) plus one shifted assembly pass that writes the stem
output directly — the cost volume never exists in memory.

Derivation (kernel K: (3,3,3,2C,F) DHWIO, offsets kd,kh,kw in {0,1,2}
representing {-1,0,+1}; "valid kd" = 0 <= d+kd-1 < D, the conv's d-padding):

* Right half: the R-tap of output (d,h,w) reads ``R[h+kh-1, (w-d)+(kw-kd)]``
  — a 2-D conv of R evaluated at column ``w-d``. Per kd this is
  ``CR_kd = conv2d(R, K[kd,:,:,C:,:])`` read at ``j = w-d-kd+3`` on a
  width-extended output (left pad 3, right pad 1). R's zero padding
  reproduces the ``w >= d`` mask for the right half exactly; the single
  mismatch is the volume's own zero column at ``w' = W`` (tap kw=2 at output
  w = W-1), fixed by subtracting a 1-wide column conv ``corr_kd``.
* Left half: the mask ``1[w+kw-1 >= d+kd-1]`` depends only on
  ``t = clamp(d+kd-w, 0, 3)`` — the number of left-most kw taps suppressed.
  Precompute per (kd, t) partial-width convs ``P_kd_t`` (t=0 full 3-wide,
  t=1 right 2 taps, t=2 right tap only, t=3 zero) and select by t at
  assembly.

Validated element-exact (up to bf16 reassociation) against
``conv3d(build_cost_volume(...))`` in ``tests/test_fused_stem.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_cost_volume_stem"]


def _conv2d(x, k, padding):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _place(arr: jnp.ndarray, offset: int, total: int) -> jnp.ndarray:
    """Embed ``arr`` (width axis 2) at column ``offset`` of a zero row of
    width ``total``; negative offsets / overhangs are trimmed."""
    b, h, w, f = arr.shape
    src_lo = max(-offset, 0)
    src_hi = min(w, total - offset)
    if src_hi <= src_lo:
        return jnp.zeros((b, h, total, f), arr.dtype)
    arr = arr[:, :, src_lo:src_hi, :]
    pad_l = offset + src_lo
    pad_r = total - pad_l - (src_hi - src_lo)
    if pad_l or pad_r:
        arr = jnp.pad(arr, ((0, 0), (0, 0), (pad_l, pad_r), (0, 0)))
    return arr


def fused_cost_volume_stem(
    left: jnp.ndarray,
    right: jnp.ndarray,
    kernel: jnp.ndarray,
    num_disp: int,
    pack_g: int | None = None,
) -> jnp.ndarray:
    """``conv3d_same(build_cost_volume(left, right, num_disp), kernel)``
    without materialising the volume.

    Args:
      left, right: ``(B, H, W, C)`` feature maps.
      kernel: ``(3, 3, 3, 2C, F)`` DHWIO stem kernel.
      num_disp: number of candidate disparities (volume depth D).
      pack_g: if set, emit the depth-packed layout ``(B, D/g, H, W, g*F)``
        (``ops/packed3d.py``) directly — the assembly writes each lane group
        in place, so the unpacked tensor never exists either.

    Returns:
      ``(B, num_disp, H, W, F)`` stem convolution output (pre-BN/ReLU), or
      its packed form when ``pack_g`` is given.

    The assembly exploits that away from the ``w = d`` diagonal the output is
    *d-independent in its left half and a pure column-shift in its right
    half*: ``out[d, w] = A(w) + S(w - d)`` for ``w >= d + 2`` and interior d,
    where ``A = sum_kd P0_kd`` and ``S(j) = sum_kd CR_kd(j + 3 - kd)`` are two
    2-D precomputes. The t-mask select chains (a full-volume VPU pass in the
    earlier formulation — measured several ms at the KITTI shape) only run on
    the narrow ``w <= d + 1`` band, ~4% of the volume.
    """
    b, h, w, c = left.shape
    f = kernel.shape[-1]
    if kernel.shape[:3] != (3, 3, 3) or kernel.shape[3] != 2 * c:
        raise ValueError(f"expected (3,3,3,{2*c},F) kernel, got {kernel.shape}")
    wl = kernel[:, :, :, :c, :]  # left-half weights, per kd: (3,3,C,F)
    wr = kernel[:, :, :, c:, :]
    d_n = num_disp

    # ---- left half: partial-width convs P[kd][t] -------------------------
    # P[kd][t][h,w] = sum_{kh, kw>=t} wl[kd,kh,kw] * L[h+kh-1, w+kw-1]
    p = []
    for kd in range(3):
        p0 = _conv2d(left, wl[kd], ((1, 1), (1, 1)))
        p1 = _conv2d(left, wl[kd][:, 1:], ((1, 1), (0, 1)))
        p2 = _conv2d(left, wl[kd][:, 2:], ((1, 1), (0, 1)))[:, :, 1:, :]
        p.append((p0, p1, p2))

    # ---- right half: shifted convs CR[kd] + right-edge column fix --------
    # CR[kd][h,j] = sum_{kh,kw} wr[kd,kh,kw] * R[h+kh-1, j+kw-3], j in [0,W+2)
    cr = [_conv2d(right, wr[kd], ((1, 1), (3, 1))) for kd in range(3)]
    # corr[kd][h,u] = sum_kh wr[kd,kh,2] * R[h+kh-1, u]  (the kw=+1 tap that
    # erroneously reads R at the volume's zero column w' = W).
    corr = [_conv2d(right, wr[kd][:, 2:], ((1, 1), (0, 0))) for kd in range(3)]

    # ---- d-independent interior precomputes ------------------------------
    # A variants: sum of full-width left convs over the kd set valid at d.
    kd_sets = {
        "mid": tuple(kd for kd in range(3)),
        "lo": (1, 2),   # d = 0: kd = 0 reads plane -1 -> dropped
        "hi": (0, 1),   # d = D-1: kd = 2 reads plane D -> dropped
    }
    if d_n == 1:
        kd_sets = {k: tuple(kd for kd in v if kd == 1) for k, v in kd_sets.items()}
        kd_sets["only"] = (1,)
    a_of = {k: sum(p[kd][0] for kd in kds) for k, kds in kd_sets.items()}
    # S variants on j = w - d in [-(D-1), W): S(j) = sum_kd CR_kd(j + 3 - kd).
    j0 = -(d_n - 1)
    ws = w - j0
    s_of = {
        k: sum(_place(cr[kd], kd - 3 - j0, ws) for kd in kds)
        for k, kds in kd_sets.items()
    }

    def variant(d):
        if d_n == 1:
            return "only"
        if d == 0:
            return "lo"
        if d == d_n - 1:
            return "hi"
        return "mid"

    w_band = jnp.arange(w).reshape(1, 1, w, 1)
    zero = jnp.zeros((), dtype=left.dtype)

    # Each d-slice is PURE elementwise-on-slices (adds of dynamic slices and
    # zero-padded narrow corrections — no W-axis concat), so XLA fuses the
    # whole assembly into the single packed-stack write below: the volume is
    # materialised exactly once.
    d_slices = []
    for d in range(d_n):
        v = variant(d)
        kds = kd_sets[v]
        lo_w = min(d + 2, w)  # band: columns where the left half needs masks
        # Everywhere: A(w) + S(w - d).
        sl = a_of[v] + jax.lax.dynamic_slice_in_dim(s_of[v], -d - j0, w, axis=2)
        # Band delta on the leading lo_w columns: exact t-mask selects minus
        # the full-width P0 already counted in A; zero-padded to full width.
        wb = w_band[:, :, :lo_w, :]
        delta = None
        for kd in kds:
            t = d + kd - wb
            p0, p1, p2 = (x[:, :, :lo_w, :] for x in p[kd])
            dkd = jnp.where(
                t <= 0, zero, jnp.where(t == 1, p1 - p0, jnp.where(t == 2, p2 - p0, -p0))
            )
            delta = dkd if delta is None else delta + dkd
        if delta is not None and lo_w > 0:
            sl = sl + jnp.pad(delta, ((0, 0), (0, 0), (0, w - lo_w), (0, 0)))
        # Right-edge fix: output w = W-1, tap kw=2 read R[W-d-kd+1] but the
        # volume is zero at w' = W; subtract when that read was in range.
        fix = None
        for kd in kds:
            u = w - d - kd + 1
            if 0 <= u < w:
                t = corr[kd][:, :, u : u + 1, :]
                fix = t if fix is None else fix + t
        if fix is not None:
            sl = sl - jnp.pad(fix, ((0, 0), (0, 0), (w - 1, 0), (0, 0)))
        d_slices.append(sl)

    if pack_g is None:
        return jnp.stack(d_slices, axis=1)
    g = pack_g
    assert d_n % g == 0, (d_n, g)
    grouped = [
        jnp.concatenate(d_slices[t * g : (t + 1) * g], axis=-1)
        for t in range(d_n // g)
    ]
    return jnp.stack(grouped, axis=1)

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


def fused_cost_volume_stem(
    left: jnp.ndarray,
    right: jnp.ndarray,
    kernel: jnp.ndarray,
    num_disp: int,
    pack_g: int | None = None,
    bias: jnp.ndarray | None = None,
    relu: bool = False,
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
      bias: optional per-channel ``(F,)`` epilogue bias (the eval-folded BN
        bias), applied per tile BEFORE the final stack so it fuses into the
        assembly — a separate bias+relu pass over the full volume costs
        ~0.9 ms at the KITTI shape (trace_forward fusion.71).
      relu: apply the stem ReLU in the same epilogue.

    Returns:
      ``(B, num_disp, H, W, F)`` stem convolution output (pre-BN/ReLU unless
      ``bias``/``relu`` are given), or its packed form when ``pack_g`` is set.
    """
    b, h, w, c = left.shape
    f = kernel.shape[-1]
    if kernel.shape[:3] != (3, 3, 3) or kernel.shape[3] != 2 * c:
        raise ValueError(f"expected (3,3,3,{2*c},F) kernel, got {kernel.shape}")
    wl = kernel[:, :, :, :c, :]  # left-half weights, per kd: (3,3,C,F)
    wr = kernel[:, :, :, c:, :]

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

    # ---- assembly ---------------------------------------------------------
    # Left half, vectorised over d via t-masks (fused selects, no gathers).
    # In packed mode the disparity index is per lane group: d = tile*g + l//f.
    # (Eval-mode packed assembly below replaces this select pass entirely —
    # see _left_slices — so the select form is only built where it is used.)
    def select_left_out():
        if pack_g is None:
            d_idx = jnp.arange(num_disp).reshape(1, num_disp, 1, 1, 1)
            out = jnp.zeros((b, num_disp, h, w, f), dtype=left.dtype)
            tile_p = lambda x: x[:, None]  # (b, 1, h, w, f)
        else:
            g = pack_g
            lane_d = np.repeat(np.arange(g), f)  # (g*f,)
            tiles = jnp.arange(num_disp // g).reshape(1, -1, 1, 1, 1)
            d_idx = tiles * g + jnp.asarray(lane_d).reshape(1, 1, 1, 1, g * f)
            out = jnp.zeros((b, num_disp // g, h, w, g * f), dtype=left.dtype)
            tile_p = lambda x: jnp.tile(x, (1, 1, 1, g))[:, None]  # (b, 1, h, w, g*f)
        w_idx = jnp.arange(w).reshape(1, 1, 1, w, 1)
        for kd in range(3):
            # valid kd: 0 <= d+kd-1 < num_disp
            valid = (d_idx + kd - 1 >= 0) & (d_idx + kd - 1 < num_disp)
            t = d_idx + kd - w_idx  # clamp(t,0,3): taps suppressed at this column
            p0, p1, p2 = (tile_p(x) for x in p[kd])
            zero = jnp.zeros((), dtype=left.dtype)
            contrib = jnp.where(t <= 0, p0, jnp.where(t == 1, p1, jnp.where(t == 2, p2, zero)))
            out = out + jnp.where(valid, contrib, zero)
        return out

    if pack_g is not None:
        assert num_disp % pack_g == 0, (num_disp, pack_g)

    # Right half: static per-d shifted slices of CR (build_cost_volume-style
    # pad/slice, statically unrolled; XLA fuses into the output write).
    zeros_col = None
    r_slices = []
    for d in range(num_disp):
        acc = None
        for kd in range(3):
            if not (0 <= d + kd - 1 < num_disp):
                continue
            s = d + kd - 3  # CR column for output w is w - s
            if s >= w:  # whole row reads left of R's support: all zero
                continue
            if s <= 0:
                sl = cr[kd][:, :, -s : -s + w, :]
            else:
                if zeros_col is None:
                    zeros_col = jnp.zeros((b, h, 1, f), dtype=left.dtype)
                sl = jnp.concatenate(
                    [jnp.broadcast_to(zeros_col, (b, h, s, f)), cr[kd][:, :, : w - s, :]],
                    axis=2,
                )
            # Right-edge fix: output w = W-1, tap kw=2 read R[W-d-kd+1] but the
            # volume is zero at w' = W; subtract when that read was in range.
            u = w - d - kd + 1
            if 0 <= u < w:
                fix = sl[:, :, w - 1 :, :] - corr[kd][:, :, u : u + 1, :]
                sl = jnp.concatenate([sl[:, :, : w - 1, :], fix], axis=2)
            acc = sl if acc is None else acc + sl
        if acc is None:
            acc = jnp.zeros((b, h, w, f), dtype=left.dtype)
        r_slices.append(acc)
    def epilogue(res, lane_bias):
        if lane_bias is not None:
            res = res + lane_bias
        return jnp.maximum(res, 0) if relu else res

    if pack_g is None:
        res = select_left_out() + jnp.stack(r_slices, axis=1)
        return epilogue(res, None if bias is None else bias.astype(left.dtype))
    if bias is None and not relu:
        # No epilogue (train mode): keep the single select+stack+add form —
        # slice-based assembly costs ~29 ms/step of slice_add fusions in the
        # BACKWARD pass (gradient scatter through the per-column slices,
        # trace_train slice_add_fusion @59 GB/s), and the select masks
        # differentiate as cheap elementwise selects instead.
        grouped = [
            jnp.concatenate(r_slices[t * pack_g : (t + 1) * pack_g], axis=-1)
            for t in range(num_disp // pack_g)
        ]
        return select_left_out() + jnp.stack(grouped, axis=1)

    # Eval (serving path): slice-based left assembly. The left contribution
    # at output (d, w) depends only on the diagonal offset j = w - d:
    #   j >= 2: base = P0[0]+P0[1]+P0[2]      (all taps in support)
    #   j == 1: q1 = P0[0]+P0[1]+P1[2]
    #   j == 0: q0 = P0[0]+P1[1]+P2[2]
    #   j == -1: qm1 = P1[0]+P2[1]
    #   j == -2: qm2 = P2[0]
    #   j <= -3: zero                          (volume mask kills every tap)
    # with the kd=0 / kd=2 terms dropped on the first / last depth plane
    # (conv depth padding). Each depth row is then a static concat
    # [zeros | qm2-col | qm1-col | q0-col | q1-col | base-tail] — no
    # per-element select tree over the full volume (the select form measured
    # 1.96 ms at 165 GB/s, trace_forward select_add_fusion; slices assemble
    # at copy bandwidth and fuse into the per-tile epilogue).
    # General d (all three kd valid):
    base = p[0][0] + p[1][0] + p[2][0]
    q1 = p[0][0] + p[1][0] + p[2][1]
    q0 = p[0][0] + p[1][1] + p[2][2]
    qm1 = p[0][1] + p[1][2]
    qm2 = p[0][2]
    # First plane (kd=0 dropped; columns j<0 don't exist at d=0):
    base_first = p[1][0] + p[2][0]
    q1_first = p[1][0] + p[2][1]
    q0_first = p[1][1] + p[2][2]
    # Last plane (kd=2 dropped):
    base_last = p[0][0] + p[1][0]
    q1_last = base_last
    q0_last = p[0][0] + p[1][1]
    qm1_last = qm1  # kd=2 contributes nothing at j=-1 anyway
    qm2_last = qm2

    def left_row(d):
        if d == 0:
            maps = {1: q1_first, 0: q0_first}
            bb = base_first
        elif d == num_disp - 1:
            maps = {1: q1_last, 0: q0_last, -1: qm1_last, -2: qm2_last}
            bb = base_last
        else:
            maps = {1: q1, 0: q0, -1: qm1, -2: qm2}
            bb = base
        parts = []
        if d - 2 > 0:
            parts.append(jnp.zeros((b, h, min(d - 2, w), f), dtype=left.dtype))
        for j in (-2, -1, 0, 1):
            col = d + j
            if 0 <= col < w and j in maps:
                parts.append(maps[j][:, :, col : col + 1, :])
        if d + 2 < w:
            parts.append(bb[:, :, d + 2 :, :])
        row = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)
        assert row.shape == (b, h, w, f), (row.shape, d)
        return row

    # Per-tile epilogue — bias/relu fuse into each tile's group assembly
    # instead of a separate full-volume pass after the stack.
    lane_bias = None if bias is None else jnp.tile(bias, pack_g).astype(left.dtype)
    grouped = [
        epilogue(
            jnp.concatenate(
                [
                    left_row(t * pack_g + i) + r_slices[t * pack_g + i]
                    for i in range(pack_g)
                ],
                axis=-1,
            ),
            lane_bias,
        )
        for t in range(num_disp // pack_g)
    ]
    return jnp.stack(grouped, axis=1)

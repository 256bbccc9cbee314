"""Probe: banded packed conv with ext-lane concat (shipped) vs a split-halo
variant that runs three convs (center + two shifted-tile halo contributions)
and never materialises the extended-lane volume.

Motivation: PROFILE_r05_HLO attributes ~2.5 ms of the 53.5 ms KITTI forward
to the ext-assembly copies at packed3d.py:331 (copy.41362 1.2 ms at
505 GB/s + loop fusions). Same multiply set either way — the banded kd-mask
zero-waste is unchanged; only the layout copy is at stake.

RESULT (TPU v5e, stem1 shape b1 d64 h128 w416 c32 g4): REJECTED.
Measured three ways (the naive run below is noisy — warm every loop-length
executable and use a full-sum witness; a first-element witness lets XLA
elide work): shipped ext-concat 1.06 ms (first-elem) / 5.12 ms (full-sum,
witness reduce included) vs split-halo 5.42 ms (full-sum, same witness) —
the three narrow-cin convs cost more than the concat copy they save, on
top of losing the single-conv fusion. The ext-concat form stays.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import leastereo_tpu

leastereo_tpu.setup_compilation_cache()

from leastereo_tpu.ops.packed3d import (  # noqa: E402
    Packed,
    _plane_runs,
    _rows_for,
    conv3x3_packed,
    pack,
)


def _banded(kernel, planes, chans, g, cout):
    """kd-masked banded kernel rows for the given ext-lane (plane, chan) map
    (same construction as conv3x3_packed, packed3d.py:316-329)."""
    kd_idx = np.asarray(planes)[:, None] - np.arange(g)[None, :] + 1
    t = _rows_for(kernel, chans)
    banded = None
    for kd in range(3):
        mask = jnp.asarray((kd_idx == kd).astype(np.float32), kernel.dtype)
        term = t[kd][:, :, :, None, :] * mask[None, None, :, :, None]
        banded = term if banded is None else banded + term
    return banded.reshape(3, 3, len(planes), g * cout)


def conv3x3_packed_split(p: Packed, kernel: jnp.ndarray) -> Packed:
    cout = kernel.shape[-1]
    g = p.g
    lane_map = p.map()
    b, dg, h, w, li = p.data.shape
    x = p.data

    def conv(inp, k):
        return jax.lax.conv_general_dilated(
            inp.reshape(b * dg, h, w, inp.shape[-1]),
            k,
            (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).reshape(b, dg, h, w, g * cout)

    # Center: tile lanes in place.
    y = conv(x, _banded(kernel, [pg for pg, _ in lane_map], [pc for _, pc in lane_map], g, cout))

    # Halo contributions: plane g-1 lanes of the previous tile land at plane
    # offset -1; plane 0 lanes of the next tile at offset g.
    for runs, delta, off in (
        (_plane_runs(lane_map, g - 1), -1, -1),
        (_plane_runs(lane_map, 0), +1, g),
    ):
        lanes = [l for a, z in runs for l in range(a, z)]
        sl = jnp.concatenate([x[..., a:z] for a, z in runs], axis=-1) if len(runs) > 1 else x[..., runs[0][0] : runs[0][1]]
        if delta == -1:
            sl = jnp.pad(sl[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
        else:
            sl = jnp.pad(sl[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        k = _banded(kernel, [off] * len(lanes), [lane_map[l][1] for l in lanes], g, cout)
        y = y + conv(sl, k)
    return Packed(y, g=g, channels=cout)


def main():
    rng = np.random.RandomState(0)
    b, d, h, w, c = 1, 64, 128, 416, 32
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(b, d, h, w, c), dt)
    k = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.1, dt)
    p4 = pack(x, 4)

    a = conv3x3_packed(Packed(p4.data, 4, c), k).data
    bb = conv3x3_packed_split(Packed(p4.data, 4, c), k).data
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32))))
    print(f"max |shipped - split| = {err:.3e}")

    import time

    def bench(fn):
        """Full-sum witness (first-element witnesses let XLA elide work) with
        both loop-length executables warmed; median of 3 delta timings."""

        @jax.jit
        def run(n, x0, kk):
            def body(_, carry):
                acc, xx = carry
                out = fn(Packed(xx + acc * jnp.asarray(1e-30, xx.dtype), 4, c), kk).data
                return (jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(xx.dtype), xx

            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.asarray(0, x0.dtype), x0))
            return acc

        for n in (4, 12):
            np.asarray(run(jnp.int32(n), p4.data, k))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(jnp.int32(4), p4.data, k))
            t1 = time.perf_counter()
            np.asarray(run(jnp.int32(12), p4.data, k))
            t2 = time.perf_counter()
            ts.append(((t2 - t1) - (t1 - t0)) / 8)
        return sorted(ts)[1]

    for name, fn in (
        ("shipped ext-concat banded", conv3x3_packed),
        ("split-halo 3-conv", conv3x3_packed_split),
    ):
        print(f"{name:32s} {bench(fn) * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()

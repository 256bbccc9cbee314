"""Probe: banded packed conv with ext-lane concat (shipped) vs a split-halo
variant that runs three convs (center + two shifted-tile halo contributions)
and never materialises the extended-lane volume.

Motivation: PROFILE_r05_HLO attributes ~2.5 ms of the 53.5 ms KITTI forward
to the ext-assembly copies at packed3d.py:331 (copy.41362 1.2 ms at
505 GB/s + loop fusions). Same multiply set either way — the banded kd-mask
zero-waste is unchanged; only the layout copy is at stake.

RESULT (TPU v5e, stem1 shape b1 d64 h128 w416 c32 g4): REJECTED.
shipped ext-concat 0.103 ms vs split-halo 5.474 ms — the two 32-lane halo
convs hit a ~50x-worse XLA lowering (narrow-cin convs don't tile the MXU),
dwarfing the concat copy they were meant to save. The ext-concat form stays.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import leastereo_tpu

leastereo_tpu.setup_compilation_cache()

from probe_conv import device_time  # noqa: E402  (same dir)

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

    for name, fn in (
        ("shipped ext-concat banded", conv3x3_packed),
        ("split-halo 3-conv", conv3x3_packed_split),
    ):
        t = device_time(lambda y, kk: fn(Packed(y, 4, c), kk).data, p4.data, k)
        print(f"{name:32s} {t * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()

"""On-device per-component profile of the packed matching net (KITTI shape).

Times each stem / cell / skip-conv / head piece standalone with the exact
packed shapes they see inside the flagship forward (chained-fori_loop device
timing as in profile_forward.py). Run with component names as argv to limit
compiles, e.g. ``python scripts/profile_matching_device.py cell1 skip``.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import leastereo_tpu

leastereo_tpu.setup_compilation_cache()

from leastereo_tpu.models.genotypes import BEST_SCENEFLOW
from leastereo_tpu.models.matching_packed import (
    PackedConvBR,
    PackedFixedCell,
    PackedFusedStem0,
)
from leastereo_tpu.ops.packed3d import Packed, choose_pack, concat_lanes, resize_packed
from leastereo_tpu.ops.pallas_softargmin import soft_argmin_fused

GENO = BEST_SCENEFLOW["matching"]
D, H3, W3 = 64, 128, 416  # level-0 volume at KITTI 384x1248, maxdisp 192
N1, N2 = 4, 12
dtype = jnp.bfloat16
key = jax.random.PRNGKey(0)


def device_time(fn, *args, n1=N1, n2=N2):
    def looped(n):
        @jax.jit
        def run(x0, rest):
            def body(_, carry):
                a, x = carry
                out = fn(x + a.astype(x.dtype) * jnp.asarray(1e-30, x.dtype), *rest)
                leaf = jax.tree.leaves(out)[0]
                # Full reduction: a single-element read would let XLA DCE /
                # slice-narrow the whole component.
                return jnp.sum(leaf.astype(jnp.float32)), x

            a, _ = jax.lax.fori_loop(0, n, body, (jnp.asarray(0, jnp.float32), x0))
            return a

        run(args[0], args[1:]).block_until_ready()
        t0 = time.perf_counter()
        np.asarray(run(args[0], args[1:]))
        return time.perf_counter() - t0

    t1 = looped(n1)
    t2 = looped(n2)
    return (t2 - t1) / (n2 - n1)


def mk(shape):
    return jax.random.normal(jax.random.PRNGKey(hash(shape) % 2**31), shape, dtype)


def packed(d, h, w, c, g=None):
    g = g or choose_pack(d, c)
    return Packed(mk((1, d // g, h, w, g * c)), g=g, channels=c)


def cell_fn(c_out, downup, s0, s1):
    cell = PackedFixedCell(
        steps=3, block_multiplier=4, c_out=c_out, downup_sample=downup,
        genotype=GENO, dtype=dtype,
    )
    vs = cell.init(key, s0, s1)

    def fn(x, s1d):
        _, out = cell.apply(vs, Packed(x, g=s0.g, channels=s0.channels),
                            Packed(s1d, g=s1.g, channels=s1.channels))
        return out.data

    return fn, s0.data, s1.data


# Volume shapes per level (lvl0 = 1/3 res).
lv = {0: (D, H3, W3), 1: (D // 2, H3 // 2, W3 // 2), 2: (D // 4, H3 // 4, W3 // 4)}

stem0_out = packed(*lv[0], 32)       # g=4
stem1_out = packed(*lv[0], 32)
c_l1 = packed(*lv[1], 64)            # cell concat at level 1 (4*16 ch, g=8)
c_l2 = packed(*lv[2], 128)           # cell concat at level 2 (4*32 ch, g=4)
c_l0 = packed(*lv[0], 32, g=16)      # cell10 concat at level 0 (4*8 ch, g=16)
skip_in = concat_lanes([c_l1, packed(*lv[1], 64)])

COMPONENTS = {}


def comp(name):
    def deco(builder):
        COMPONENTS[name] = builder
        return builder
    return deco


@comp("stem0")
def _():
    feat = mk((1, H3, W3, 32))
    m = PackedFusedStem0(32, choose_pack(D, 32), dtype=dtype)
    vs = m.init(key, feat, feat, D)
    return (lambda l, r: m.apply(vs, l, r, D).data), feat, mk((1, H3, W3, 32))


@comp("stem1")
def _():
    m = PackedConvBR(32, (3, 3, 3), dtype=dtype)
    vs = m.init(key, stem0_out)
    return (
        lambda x: m.apply(vs, Packed(x, g=stem0_out.g, channels=32)).data,
        stem0_out.data,
    )


@comp("cell0")
def _():  # lvl0 -> lvl1 downsample, inputs stem0/stem1
    return cell_fn(16, -1, stem0_out, stem1_out)


@comp("cell1")
def _():  # lvl1 same; s0 = stem1 (lvl0 C32), s1 = cell0 concat
    return cell_fn(16, 0, stem1_out, c_l1)


@comp("cell2")
def _():  # lvl1 -> lvl2 down; s0/s1 = lvl1 concats
    return cell_fn(32, -1, c_l1, c_l1)


@comp("cell3")
def _():  # lvl2 same; s0 = lvl1 concat, s1 = lvl2 concat
    return cell_fn(32, 0, c_l1, c_l2)


@comp("cell4")
def _():  # lvl2 -> lvl1 up
    return cell_fn(16, 1, c_l2, c_l2)


@comp("skip")
def _():  # skip_conv_4 / skip_conv_8: 3x3x3 on lane-concat 128ch -> 64ch
    m = PackedConvBR(64, (3, 3, 3), dtype=dtype)
    vs = m.init(key, skip_in)
    return (
        lambda x: m.apply(
            vs, Packed(x, g=skip_in.g, channels=skip_in.channels, lane_map=skip_in.lane_map)
        ).data,
        skip_in.data,
    )


@comp("cell6")
def _():  # lvl2 same; s0 = skip out (lvl1 C64), s1 = lvl2 concat
    return cell_fn(32, 0, c_l1, c_l2)


@comp("cell10")
def _():  # lvl1 -> lvl0 up, c_out 8
    return cell_fn(8, 1, c_l1, c_l1)


@comp("cell11")
def _():  # lvl0 -> lvl1 down; s0 = lvl1 concat, s1 = cell10 concat (lvl0)
    return cell_fn(16, -1, c_l1, c_l0)


@comp("head")
def _():  # last_6 1x1 -> resize to lvl0 -> last_3 3x3x3 -> unpack
    m6 = PackedConvBR(32, (1, 1, 1), dtype=dtype)
    m3 = PackedConvBR(1, (3, 3, 3), use_bn=False, use_relu=False, dtype=dtype)
    vs6 = m6.init(key, c_l1)
    g0 = choose_pack(D, 32)
    probe = resize_packed(
        Packed(jax.eval_shape(lambda: jnp.zeros((1, 4, H3 // 2, W3 // 2, 256), dtype)).shape
               and mk((1, 4, H3 // 2, W3 // 2, 256)), g=8, channels=32),
        lv[0], g0)
    vs3 = m3.init(key, probe)

    def fn(x):
        y = m6.apply(vs6, Packed(x, g=c_l1.g, channels=64))
        y = resize_packed(y, lv[0], g0)
        from leastereo_tpu.ops.packed3d import unpack

        return unpack(m3.apply(vs3, y))

    return fn, c_l1.data


@comp("softargmin")
def _():
    x = mk((1, D, H3, W3, 1)).astype(jnp.float32)
    return (lambda v: soft_argmin_fused(v, 192)), x


def main():
    names = sys.argv[1:] or list(COMPONENTS)
    total = 0.0
    for name in names:
        fn_args = COMPONENTS[name]()
        t = device_time(*fn_args)
        total += t
        print(f"{name:12s} {t * 1e3:9.3f} ms", flush=True)
    print(f"{'TOTAL':12s} {total * 1e3:9.3f} ms")


if __name__ == "__main__":
    main()

"""Cumulative (prefix-truncation) device profile of the composed matching net.

The standalone per-component profile (profile_matching_device.py) under-counts
the real forward by ~2x — composition effects (non-canonical lane maps after
concats, real resize shapes, fusion boundaries) change the cost. This script
times the REAL PackedMatchingNet truncated after each stage on real-shaped
feature inputs; consecutive deltas attribute time within the composition.

Usage: python scripts/profile_matching_trunc.py [start_idx [end_idx]]
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

import flax.linen as nn

from leastereo_tpu.models.genotypes import BEST_SCENEFLOW, FILTER_SCALE
from leastereo_tpu.models.matching_packed import (
    PackedConvBR,
    PackedFixedCell,
    PackedFusedStem0,
)
from leastereo_tpu.ops.packed3d import choose_pack, concat_lanes, resize_packed, unpack

H, W, MAXDISP = 384, 1248, 192
N = 8
dtype = jnp.bfloat16

STAGES = ["stem0", "stem1"] + [f"cell{i}" for i in range(12)] + ["head"]


class TruncatedMatching(nn.Module):
    stop_after: str

    @nn.compact
    def __call__(self, left, right):
        geno = BEST_SCENEFLOW["matching"]
        ifm = 32
        num_disp = MAXDISP // 3
        d, h, w = num_disp, left.shape[1], left.shape[2]
        skips = {4: 1, 8: 4}
        g0 = choose_pack(d, ifm)
        stem0 = PackedFusedStem0(ifm, g0, name="stem0", dtype=dtype)(left, right, num_disp)
        if self.stop_after == "stem0":
            return stem0.data
        stem1 = PackedConvBR(ifm, (3, 3, 3), name="stem1", dtype=dtype)(stem0)
        if self.stop_after == "stem1":
            return stem1.data

        concats = []
        s0, s1 = stem0, stem1
        for i, level in enumerate(geno.network_path):
            prev_raw, concat = PackedFixedCell(
                steps=3, block_multiplier=4,
                c_out=8 * FILTER_SCALE[level],
                downup_sample=geno.downup(i),
                genotype=geno, name=f"cell_{i}", dtype=dtype,
            )(s0, s1)
            concats.append(concat)
            if i in skips:
                fused = concat_lanes([concats[skips[i]], concat])
                concat = PackedConvBR(ifm * 2, (3, 3, 3), name=f"skip_conv_{i}", dtype=dtype)(fused)
            s0, s1 = prev_raw, concat
            if self.stop_after == f"cell{i}":
                return concat.data

        last = concats[-1]
        level = geno.network_path[-1]
        if level >= 1:
            last = PackedConvBR(ifm, (1, 1, 1), name="last_6", dtype=dtype)(last)
            last = resize_packed(last, (d, h, w), choose_pack(d, ifm))
        mat = PackedConvBR(1, (3, 3, 3), use_bn=False, use_relu=False, name="last_3", dtype=dtype)(last)
        return unpack(mat)


def device_time(stop):
    model = TruncatedMatching(stop_after=stop)
    rng = np.random.RandomState(0)
    fl = jnp.asarray(rng.randn(1, H // 3, W // 3, 32), dtype)
    fr = jnp.asarray(rng.randn(1, H // 3, W // 3, 32), dtype)
    vs = jax.jit(model.init)(jax.random.PRNGKey(0), fl, fr)

    @jax.jit
    def run(x0):
        def body(_, carry):
            a, x = carry
            out = model.apply(vs, x + a.astype(x.dtype) * jnp.asarray(1e-30, x.dtype), fr)
            return jnp.sum(out.astype(jnp.float32)), x

        a, _ = jax.lax.fori_loop(0, N, body, (jnp.asarray(0, jnp.float32), fl))
        return a

    run(fl).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(fl))
        best = min(best, time.perf_counter() - t0)
    return best / N


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else len(STAGES)
    prev = 0.0
    for stage in STAGES[lo:hi]:
        t = device_time(stage)
        print(f"{stage:10s} cum {t * 1e3:9.3f} ms   delta {(t - prev) * 1e3:8.3f} ms", flush=True)
        prev = t


if __name__ == "__main__":
    main()

"""Bisect TPU compile-time/runtime of the new packed3d constructs."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import leastereo_tpu

leastereo_tpu.setup_compilation_cache()

from leastereo_tpu.ops.packed3d import (
    Packed, choose_pack, concat_lanes, conv3x3_packed, pack, repack, resize_packed,
)

dtype = jnp.bfloat16
key = jax.random.PRNGKey(0)


def bench(name, fn, *args, n1=4, n2=16):
    """Chained-fori device timing (cancels dispatch/fetch overhead)."""

    def looped(n):
        @jax.jit
        def run(x0, rest):
            def body(_, carry):
                a, x = carry
                out = fn(x + a.astype(x.dtype) * jnp.asarray(1e-30, x.dtype), *rest)
                return jnp.sum(out.astype(jnp.float32)), x

            a, _ = jax.lax.fori_loop(0, n, body, (jnp.asarray(0, jnp.float32), x0))
            return a

        t0 = time.time()
        run(args[0], args[1:]).block_until_ready()
        tc = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(args[0], args[1:]))
            best = min(best, time.perf_counter() - t0)
        return best, tc

    t1, tc = looped(n1)
    t2, _ = looped(n2)
    print(f"{name:28s} compile {tc:7.1f}s run {(t2-t1)/(n2-n1)*1e3:8.3f} ms", flush=True)


def mk(shape):
    return jax.random.normal(key, shape, dtype)


which = sys.argv[1:] or ["repack", "skipconv_g1", "skipconv_g2", "resize_mix"]

if "repack" in which:
    # lvl1 concat g8 C64 -> g2  (17 MB)
    x = mk((1, 4, 64, 208, 512))
    bench("repack l1 g8->g2", lambda a: repack(Packed(a, g=8, channels=64), 2).data, x)
    # lvl0 g16 C32 -> g4 (218 MB)
    y = mk((1, 4, 128, 416, 512))
    bench("repack l0 g16->g4", lambda a: repack(Packed(a, g=16, channels=32), 4).data, y)

if "skipconv_g1" in which:
    x = mk((1, 32, 64, 208, 128))
    k = mk((3, 3, 3, 128, 64))
    bench("conv3x3 g1 C128->64 l1", lambda a: conv3x3_packed(Packed(a, g=1, channels=128), k).data, x)

if "skipconv_g2" in which:
    x = mk((1, 16, 64, 208, 256))
    k = mk((3, 3, 3, 128, 64))
    bench("conv3x3 g2 C128->64 l1", lambda a: conv3x3_packed(Packed(a, g=2, channels=128), k).data, x)

if "skipconv_g8" in which:
    x = mk((1, 4, 64, 208, 1024))
    k = mk((3, 3, 3, 128, 64))
    bench("conv3x3 g8 C128->64 l1", lambda a: conv3x3_packed(Packed(a, g=8, channels=128), k).data, x)

if "resize_mix" in which:
    # cell0 preprocess shape: lvl0 C32 g4 down to lvl1 g8
    x = mk((1, 16, 128, 416, 128))
    bench(
        "resize l0->l1 g4->g8 C32",
        lambda a: resize_packed(Packed(a, g=4, channels=32), (32, 64, 208), 8).data,
        x,
    )
    # cell10 up: lvl1 C8 g8 -> lvl0 g16
    z = mk((1, 4, 64, 208, 64))
    bench(
        "resize l1->l0 g8->g16 C8",
        lambda a: resize_packed(Packed(a, g=8, channels=8), (64, 128, 416), 16).data,
        z,
    )

if "head3" in which:
    for g in (4, 8, 16):
        x = mk((1, 64 // g, 128, 416, g * 32))
        k = mk((3, 3, 3, 32, 1))
        bench(f"last_3 conv g{g} C32->1 l0", lambda a, kk: conv3x3_packed(Packed(a, g=g, channels=32), kk).data, x, k)

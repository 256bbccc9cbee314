"""Microbenchmarks for the packed-conv design space at the KITTI bench shape.

Times individual op variants on the real chip with the chained-fori_loop
method (same as scripts/profile_forward.py — cancels tunnel dispatch
overhead). Used to attribute and attack the stem1/head costs seen in
PROFILE_r04.json; findings land in commit messages, not an artifact.

CAVEAT (r5): this harness keeps only the first output element per iteration,
which lets XLA elide part of the op under test, and does not warm every
loop-length executable — its absolute numbers can read low. Comparisons are
still like-for-like. probe_split_halo.py carries the corrected methodology
(full-sum witness + warmup); the end-to-end bench.py is the ground truth.
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

from leastereo_tpu.ops.packed3d import (
    Packed,
    conv3x3_packed,
    conv3x3_packed_collapse,
    pack,
    unpack,
)

N1, N2 = 4, 12


def device_time(fn, *args, n1=N1, n2=N2):
    @jax.jit
    def run(n, x0, rest):
        def body(_, carry):
            a, x = carry
            out = fn(x + a * jnp.asarray(1e-30, x.dtype), *rest)
            leaf = jax.tree.leaves(out)[0]
            return leaf.ravel()[0].astype(x.dtype), x

        a, _ = jax.lax.fori_loop(0, n, body, (jnp.asarray(0, x0.dtype), x0))
        return a

    run(jnp.int32(1), args[0], args[1:]).block_until_ready()

    def timed(n):
        t0 = time.perf_counter()
        np.asarray(run(jnp.int32(n), args[0], args[1:]))
        return time.perf_counter() - t0

    t1 = timed(n1)
    t2 = timed(n2)
    return (t2 - t1) / (n2 - n1)


def record(name, fn, *a):
    t = device_time(fn, *a)
    print(f"{name:44s} {t * 1e3:9.3f} ms", flush=True)
    return t


def main():
    rng = np.random.RandomState(0)
    b, d, h, w, c = 1, 64, 128, 416, 32
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(b, d, h, w, c), dt)
    k = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.1, dt)
    k1 = jnp.asarray(rng.randn(3, 3, 3, c, 1) * 0.1, dt)

    p4 = pack(x, 4)
    p8 = pack(x, 8)

    # --- the head ---------------------------------------------------------
    record(
        "head: banded g=4 cout=1 + unpack",
        lambda y: unpack(conv3x3_packed(Packed(y, 4, c), k1)),
        p4.data,
    )
    record("head: collapse g=4", lambda y: conv3x3_packed_collapse(Packed(y, 4, c), k1), p4.data)
    record(
        "head: collapse transpose only",
        lambda y: jnp.transpose(y, (0, 2, 3, 1, 4)).reshape(b, h, w, d * c),
        p4.data,
    )

    m_band = jnp.asarray(rng.randn(3, 3, d * c, d) * 0.01, dt)

    def conv_only(y):
        xs = jnp.reshape(y, (b, h, w, d * c))
        return jax.lax.conv_general_dilated(
            xs, m_band, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    record(
        "head: collapse conv only (pre-transposed)",
        conv_only,
        jnp.asarray(rng.randn(b, h, w, 1, d * c), dt),
    )
    record(
        "head: out transpose only",
        lambda y: jnp.transpose(y, (0, 3, 1, 2)),
        jnp.asarray(rng.randn(b, h, w, d), jnp.float32),
    )

    # --- stem1-shaped 3x3x3 conv (C=32 -> 32, full volume) ---------------
    record("stem1: banded g=4", lambda y: conv3x3_packed(Packed(y, 4, c), k).data, p4.data)
    record("stem1: banded g=8", lambda y: conv3x3_packed(Packed(y, 8, c), k).data, p8.data)

    # roofline probe: plain big matmul at the banded-conv arithmetic shape
    a_mm = jnp.asarray(rng.randn(16 * 128, 416, 192), dt)
    b_mm = jnp.asarray(rng.randn(9, 192, 128) * 0.1, dt)

    def mm(am):
        acc = 0
        for i in range(9):
            acc = acc + jax.lax.dot_general(am, b_mm[i], (((2,), (0,)), ((), ())))
        return acc

    record("roofline: 9x (2048x416x192)@(192,128) mm", mm, a_mm)


if __name__ == "__main__":
    main()

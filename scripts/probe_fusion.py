"""Probe: does XLA producer-duplication explain the in-model stage blowup?

PROFILE_r04 shows stem1 costing 7.5 ms in-model while the same banded conv
runs in 1.36 ms standalone (scripts/probe_conv.py). Hypothesis: XLA fuses the
fused-stem's select-heavy assembly into each of the banded conv's 3 ext-halo
consumers (and similar for cell concats), recomputing it 3x. Test: time
stem0 -> stem1 with and without jax.lax.optimization_barrier between them.
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

from leastereo_tpu.ops.fused_stem import fused_cost_volume_stem
from leastereo_tpu.ops.packed3d import Packed, conv3x3_packed

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
    b, h, w, c, d = 1, 128, 416, 32, 64
    dt = jnp.bfloat16
    left = jnp.asarray(rng.randn(b, h, w, c), dt)
    right = jnp.asarray(rng.randn(b, h, w, c), dt)
    k0 = jnp.asarray(rng.randn(3, 3, 3, 2 * c, c) * 0.1, dt)
    k1 = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.1, dt)

    def stem0(l, r):
        return jax.nn.relu(fused_cost_volume_stem(l, r, k0, d, pack_g=4))

    record("stem0 only", stem0, left, right)

    def chain(l, r):
        return conv3x3_packed(Packed(stem0(l, r), 4, c), k1).data

    record("stem0 -> stem1 (no barrier)", chain, left, right)

    def chain_barrier(l, r):
        s = jax.lax.optimization_barrier(stem0(l, r))
        return conv3x3_packed(Packed(s, 4, c), k1).data

    record("stem0 -> barrier -> stem1", chain_barrier, left, right)


if __name__ == "__main__":
    main()

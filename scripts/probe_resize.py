"""Microbenchmark resize_packed formulations at the cell_0-preprocess shape.

trace_forward shows the H/W interp dot_generals of resize_packed lowering to
giant-window TPU convolutions (e.g. fusion.51: 3.1 ms for a 5-GFLOP,
218-MB-read contraction — 9x off the bandwidth roofline). This probe times
the current formulation against precision/casting variants and a
phase-decomposed slice-arithmetic path to pick the fix.
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

from leastereo_tpu.ops.packed3d import Packed, pack, resize_packed
from leastereo_tpu.ops.resize import interp_matrix

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
    print(f"{name:52s} {t * 1e3:9.3f} ms", flush=True)
    return t


def main():
    rng = np.random.RandomState(0)
    # cell_0 preprocess: (64, 128, 416) g=4 -> (32, 64, 208) g=8 (downsample).
    b, d, h, w, c, g = 1, 64, 128, 416, 32, 4
    x = pack(jnp.asarray(rng.randn(b, d, h, w, c), jnp.bfloat16), g)

    record(
        "resize_packed down (current)",
        lambda y: resize_packed(Packed(y, g, c), (32, 64, 208), 8).data,
        x.data,
    )

    mh = interp_matrix(h, 64, True)  # (64, 128)
    mw = interp_matrix(w, 208, True)

    def down_dot(y, prec, dtype):
        v = y.astype(dtype)
        a = jnp.asarray(mh, dtype)
        bmat = jnp.asarray(mw, dtype)
        v = jax.lax.dot_general(v, a, (((2,), (1,)), ((), ())), precision=prec)
        # (b, dg, w, l, h')
        v = jax.lax.dot_general(v, bmat, (((2,), (1,)), ((), ())), precision=prec)
        # (b, dg, l, h', w')
        return v

    for name, prec, dt in [
        ("h/w dots HIGHEST bf16 (no depth mix)", jax.lax.Precision.HIGHEST, jnp.bfloat16),
        ("h/w dots DEFAULT bf16", jax.lax.Precision.DEFAULT, jnp.bfloat16),
        ("h/w dots DEFAULT f32", jax.lax.Precision.DEFAULT, jnp.float32),
        ("h/w dots HIGHEST f32", jax.lax.Precision.HIGHEST, jnp.float32),
    ]:
        record(name, lambda y, p=prec, t=dt: down_dot(y, p, t), x.data)

    # Phase/slice arithmetic: 2x align_corners=True downsample has a banded
    # M with 2 taps per output row at positions (2i, 2i+1)/(2i+1, 2i+2)...
    # generic banded form: out[i] = w0[i]*x[lo[i]] + w1[i]*x[lo[i]+1].
    def down_banded(y):
        v = y
        for axis, m in ((2, mh), (3, mw)):
            n_out, n_in = m.shape
            lo = np.clip(m.argmax(axis=1), 0, n_in - 2)
            # two-tap band: weights at lo and lo+1
            w0 = np.take_along_axis(m, lo[:, None], 1)[:, 0]
            w1 = np.take_along_axis(m, (lo + 1)[:, None], 1)[:, 0]
            # gather-free: lo is monotone; use dynamic slices? fall back to
            # jnp.take which XLA turns into a gather - measure anyway.
            t0 = jnp.take(v, jnp.asarray(lo), axis=axis)
            t1 = jnp.take(v, jnp.asarray(lo + 1), axis=axis)
            sh = [1] * v.ndim
            sh[axis] = n_out
            v = t0 * jnp.asarray(w0, v.dtype).reshape(sh) + t1 * jnp.asarray(
                w1, v.dtype
            ).reshape(sh)
        return v

    record("h/w two-tap take (gather)", down_banded, x.data)


if __name__ == "__main__":
    main()

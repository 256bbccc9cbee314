"""Round-5 perf probes: isolate the fat stages PROFILE_r04 named.

Targets (KITTI shape, matching net at 1/3 res: d=64, 128x416):
  * stem1: conv3x3_packed on the canonical (1,16,128,416,128) volume — 7.5 ms
    measured in-model vs ~2 ms of roofline;
  * cell_1 / cell_11 class: downsample resize of the big level-0 volume;
  * cell_4 / cell_8 class: conv1x1-project + upsample from level 2.

Each probe times the current implementation and candidate rewrites with the
chained-fori_loop device timer (no dispatch noise). Results print only —
this is a lab notebook, not an artifact.
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
    choose_pack,
    conv1x1_packed,
    conv3x3_packed,
    pack,
    resize_packed,
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


def report(name, fn, *args):
    t = device_time(fn, *args)
    print(f"{name:44s} {t * 1e3:8.3f} ms", flush=True)
    return t


def conv3x3_split(p: Packed, kernel: jnp.ndarray) -> Packed:
    """Candidate: canonical-only split of the banded conv into a dense
    center conv (exact g*C lanes, no 1.5x ext concat, no 192->256 channel
    padding) + two tiny halo convs folded in by lane-offset adds."""
    kd_, kh_, kw_, cin, cout = kernel.shape
    assert (kd_, kh_, kw_) == (3, 3, 3) and cin == p.channels
    assert p.is_canonical()
    g = p.g
    b, dg, h, w, li = p.data.shape
    x = p.data

    # Center: banded[kh, kw, (gi, ci), (go, co)] = K[gi-go+1, kh, kw, ci, co]
    # for |gi - go| <= 1 else 0 (the in-tile band).
    kd_idx = np.arange(g)[:, None] - np.arange(g)[None, :] + 1  # (gi, go)
    center = None
    for kd in range(3):
        mask = jnp.asarray((kd_idx == kd).astype(np.float32), kernel.dtype)  # (gi, go)
        term = (
            kernel[kd][:, :, None, :, None, :]
            * mask[None, None, :, None, :, None]
        )  # (3, 3, gi, ci, go, co)
        center = term if center is None else center + term
    center = center.reshape(3, 3, g * cin, g * cout)
    y = jax.lax.conv_general_dilated(
        x.reshape(b * dg, h, w, li),
        center,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, dg, h, w, g * cout)

    # Halo: previous tile's last plane feeds output plane 0 via K[0];
    # next tile's plane 0 feeds output plane g-1 via K[2].
    def shift_tiles(arr, delta):
        if delta == -1:
            return jnp.pad(arr[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
        return jnp.pad(arr[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))

    prev = shift_tiles(x[..., (g - 1) * cin :], -1).reshape(b * dg, h, w, cin)
    nxt = shift_tiles(x[..., :cin], +1).reshape(b * dg, h, w, cin)
    yp = jax.lax.conv_general_dilated(
        prev, kernel[0], window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, dg, h, w, cout)
    yn = jax.lax.conv_general_dilated(
        nxt, kernel[2], window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, dg, h, w, cout)
    pad0 = jnp.pad(yp, ((0, 0),) * 4 + ((0, (g - 1) * cout),))
    padg = jnp.pad(yn, ((0, 0),) * 4 + (((g - 1) * cout, 0),))
    return Packed(y + pad0 + padg, g=g, channels=cout)


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    # ---- stem1-shaped conv: (d=64, 128x416, C=32, g=4) ----
    c = 32
    g = 4
    x = jnp.asarray(rng.randn(1, 16, 128, 416, g * c) * 0.5, dt)
    p = Packed(x, g=g, channels=c)
    k = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.1, dt)

    got = jax.jit(lambda d: conv3x3_split(Packed(d, g=g, channels=c), k).data)(x)
    ref = jax.jit(lambda d: conv3x3_packed(Packed(d, g=g, channels=c), k).data)(x)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"split-vs-banded max err: {err:.4f}")

    report("conv3x3 stem1 BANDED (current)", lambda d: conv3x3_packed(Packed(d, g=g, channels=c), k).data, x)
    report("conv3x3 stem1 SPLIT", lambda d: conv3x3_split(Packed(d, g=g, channels=c), k).data, x)

    # ---- cell_1-class: downsample big level-0 volume (c=32 g=4) -> level1 g=8 ----
    report(
        "resize down L0->L1 (cell_1 s0 path)",
        lambda d: resize_packed(Packed(d, g=4, channels=32), (32, 64, 208), 8).data,
        x,
    )

    # level-0 concat (c=32, g=4) is also what cell_11 projects+resizes.
    k11 = jnp.asarray(rng.randn(32, 16) * 0.1, dt)
    report(
        "down+proj L0->L1 (resize then 1x1)",
        lambda d: conv1x1_packed(
            resize_packed(Packed(d, g=4, channels=32), (32, 64, 208), 8), k11
        ).data,
        x,
    )

    # ---- cell_4/8-class: conv1x1 project at L2 then upsample to L1 ----
    c2 = 128  # 4 x 32 concat channels at level 2
    g2 = 2
    x2 = jnp.asarray(rng.randn(1, 8, 32, 104, g2 * c2) * 0.5, dt)
    k2 = jnp.asarray(rng.randn(c2, 16) * 0.1, dt)

    def proj_then_up(d):
        q = conv1x1_packed(Packed(d, g=g2, channels=c2), k2)  # (1,8,32,104,32)
        return resize_packed(q, (32, 64, 208), 8).data

    report("L2 proj->upsample (cell_4 s1 path)", proj_then_up, x2)

    def up_then_proj(d):
        q = resize_packed(Packed(d, g=g2, channels=c2), (32, 64, 208), 2)
        return conv1x1_packed(q, k2).data

    report("L2 upsample->proj (train order)", up_then_proj, x2)


if __name__ == "__main__":
    main()

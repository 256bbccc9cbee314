"""Headline benchmark: stereo inference frames/s/chip on the flagship model.

Config mirrors the reference's KITTI predict setting (predict_kitti15.sh:
384x1248, maxdisp 192). Baseline: the upstream LEAStereo paper reports
0.30 s/frame on an NVIDIA V100 for KITTI frames (BASELINE.md; the reference
repo records no numbers of its own), i.e. ~3.33 frames/s.

The headline number is SUSTAINED streaming throughput: a batch of distinct
frames is pushed through a device-resident ``lax.scan`` over the forward —
the way a serving loop feeds a chip — so a host->device dispatch round-trip
is paid once per stream, not once per frame. (In this dev environment the
TPU sits behind a network tunnel whose per-dispatch RPC costs ~7 ms — an
artifact of the harness, not the chip; on a real TPU VM dispatch is ~100 us.)
The per-dispatch number is reported alongside as ``dispatch_fps``.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import time

import numpy as np

BASELINE_FPS = 1.0 / 0.30  # LEAStereo paper: 0.30 s/frame KITTI on V100
STREAM = 8  # distinct frames per device-resident stream


def main():
    import jax
    import jax.numpy as jnp

    import leastereo_tpu

    leastereo_tpu.setup_compilation_cache()

    from leastereo_tpu.models import LEAStereoConfig, best_sceneflow_model

    h, w, maxdisp = 384, 1248, 192
    cfg = LEAStereoConfig(maxdisp=maxdisp, compute_dtype="bfloat16")
    model = best_sceneflow_model(cfg)

    rng = np.random.RandomState(0)
    lefts = jnp.asarray(rng.randn(STREAM, 1, h, w, 3), jnp.float32)
    rights = jnp.asarray(rng.randn(STREAM, 1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), lefts[0], rights[0])

    @jax.jit
    def forward(left, right):
        return model.apply(variables, left, right)

    @jax.jit
    def forward_stream(lefts, rights):
        def body(carry, lr):
            out = model.apply(variables, *lr)
            # Full-reduction witness: every output element feeds the result,
            # so XLA cannot legally elide any head work (a strided slice
            # witness would allow slice-sinking to skip pixels).
            return carry, jnp.sum(out.astype(jnp.float32))

        _, outs = jax.lax.scan(body, 0, (lefts, rights))
        return outs

    # Warmup / compile both paths.
    forward(lefts[0], rights[0]).block_until_ready()
    forward_stream(lefts, rights).block_until_ready()
    forward_stream(lefts, rights).block_until_ready()

    # Sustained: M streams of STREAM distinct frames, one dispatch per stream.
    m_streams = 4
    t0 = time.perf_counter()
    for _ in range(m_streams):
        out = forward_stream(lefts, rights)
    out.block_until_ready()
    dt_frame = (time.perf_counter() - t0) / (m_streams * STREAM)
    fps = 1.0 / dt_frame

    # Per-dispatch (includes one tunnel round trip per frame).
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        single = forward(lefts[0], rights[0])
    single.block_until_ready()
    dispatch_fps = iters / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "kitti_stereo_inference_fps_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "vs_baseline_stream": round(fps / BASELINE_FPS, 3),
                "dispatch_fps": round(dispatch_fps, 3),
                "vs_baseline_dispatch": round(dispatch_fps / BASELINE_FPS, 3),
                "stream": STREAM,
            }
        )
    )


if __name__ == "__main__":
    main()

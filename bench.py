"""Headline benchmark: stereo inference frames/s/chip on the flagship model.

Config mirrors the reference's KITTI predict setting (predict_kitti15.sh:
384x1248, maxdisp 192). Baseline: the upstream LEAStereo paper reports
0.30 s/frame on an NVIDIA V100 for KITTI frames (BASELINE.md; the reference
repo records no numbers of its own), i.e. ~3.33 frames/s.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_FPS = 1.0 / 0.30  # LEAStereo paper: 0.30 s/frame KITTI on V100


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
    left = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)
    right = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), left, right)

    @jax.jit
    def forward(left, right):
        return model.apply(variables, left, right)

    # Warmup / compile.
    forward(left, right).block_until_ready()
    forward(left, right).block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(left, right)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "kitti_stereo_inference_fps_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

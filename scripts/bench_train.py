"""Training-step throughput benchmark at the SceneFlow retrain config.

Times `make_train_step` on the flagship decoded model at the reference's
retrain configuration — crop 384x576, batch 4, maxdisp 192, Adam
(reference ``train_sf.sh:7-9``, ``train.py:75-80``) — on the real chip, and
records steps/s, frames/s (batch*steps/s), and peak HBM to a JSON artifact.

This is the training-side half of the >=5x frames/s/chip story (the
inference half is bench.py). Usage::

    python scripts/bench_train.py [--steps 10] [--batch 4] [--out BENCH_TRAIN.json]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--crop_height", type=int, default=384)
    ap.add_argument("--crop_width", type=int, default=576)
    ap.add_argument("--maxdisp", type=int, default=192)
    ap.add_argument("--out", default="BENCH_TRAIN.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import leastereo_tpu

    leastereo_tpu.setup_compilation_cache()

    from leastereo_tpu.models import LEAStereoConfig, best_sceneflow_model
    from leastereo_tpu.train.step import TrainState, make_optimizer, make_train_step
    from leastereo_tpu.utils.profiling import device_peak_hbm_gb, peak_hbm_gb

    cfg = LEAStereoConfig(maxdisp=args.maxdisp, compute_dtype="bfloat16")
    model = best_sceneflow_model(cfg)

    rng = np.random.RandomState(0)
    b, h, w = args.batch, args.crop_height, args.crop_width
    batch = {
        "left": jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        "right": jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        "disparity": jnp.asarray(rng.rand(b, h, w) * args.maxdisp * 0.8, jnp.float32),
    }

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["left"], batch["right"])
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=make_optimizer("adam", 1e-3),
    )
    step = make_train_step(args.maxdisp)

    print("compiling train step...", flush=True)
    t0 = time.perf_counter()
    compiled = step.lower(state, batch).compile()
    t_compile = time.perf_counter() - t0
    hbm = peak_hbm_gb(compiled)
    step = compiled
    state, m = step(state, batch)
    jax.block_until_ready(m)
    print(
        f"compile: {t_compile:.1f}s loss={float(m['loss']):.4f} peak_hbm={hbm} GB",
        flush=True,
    )
    state, m = step(state, batch)  # settle
    jax.block_until_ready(m)

    times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, m = step(state, batch)
        jax.block_until_ready(m)
        times.append(time.perf_counter() - t0)
        print(f"step {i}: {times[-1]*1e3:.1f} ms loss={float(m['loss']):.4f}", flush=True)

    step_s = float(np.median(times))
    result = {
        "config": {
            "crop": [h, w],
            "batch": b,
            "maxdisp": args.maxdisp,
            "solver": "adam",
            "reference": "train_sf.sh:7-9 (SceneFlow retrain config)",
        },
        "device": str(jax.devices()[0]),
        "train_step_ms": round(step_s * 1e3, 1),
        "steps_per_s": round(1.0 / step_s, 3),
        "train_frames_per_s": round(b / step_s, 2),
        # Static compiled-program peak (args+outputs+temps); runtime
        # device_memory_stats() is unavailable behind the tunnel.
        "peak_hbm_gb": device_peak_hbm_gb() or peak_hbm_gb(compiled),
        "compile_s": round(t_compile, 1),
    }
    out = pathlib.Path(__file__).resolve().parent.parent / args.out
    out.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()

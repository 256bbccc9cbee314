"""BASELINE config 4: Middlebury full/half-res inference on one real chip.

Runs the flagship decoded model at the reference's Middlebury predict
configuration — 1008x1512 frames, maxdisp 408 (reference ``predict_md.sh:2-3``,
``train_md.sh:6``) — and records frames/s and peak HBM to a JSON artifact.
The fp32 cost volume alone is ~5.9 GB at this shape (SURVEY.md §5); fitting
and running it on a single 16 GB v5e is the capability being demonstrated
(depth-packed layout + fused stem; no volume materialisation).

Usage::

    python scripts/bench_md.py [--iters 5] [--out BENCH_MD.json]
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--height", type=int, default=1008)
    ap.add_argument("--width", type=int, default=1512)
    ap.add_argument("--maxdisp", type=int, default=408)
    ap.add_argument("--out", default="BENCH_MD.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import leastereo_tpu

    leastereo_tpu.setup_compilation_cache()

    from leastereo_tpu.models import LEAStereoConfig, best_sceneflow_model
    from leastereo_tpu.utils.profiling import device_peak_hbm_gb, peak_hbm_gb

    h, w, maxdisp = args.height, args.width, args.maxdisp
    cfg = LEAStereoConfig(maxdisp=maxdisp, compute_dtype="bfloat16")
    model = best_sceneflow_model(cfg)

    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)
    right = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)

    print("init...", flush=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), left, right)

    @jax.jit
    def forward(left, right):
        return model.apply(variables, left, right)

    print("compiling forward...", flush=True)
    t0 = time.perf_counter()
    compiled = forward.lower(left, right).compile()
    t_compile = time.perf_counter() - t0
    hbm = peak_hbm_gb(compiled)
    out = compiled(left, right)
    out.block_until_ready()
    print(f"compile: {t_compile:.1f}s out={out.shape} peak_hbm={hbm} GB", flush=True)
    compiled(left, right).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = compiled(left, right)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / args.iters
    result = {
        "config": {
            "frame": [h, w],
            "maxdisp": maxdisp,
            "reference": "predict_md.sh:2-3 (Middlebury half-res predict config)",
        },
        "device": str(jax.devices()[0]),
        "frame_ms": round(dt * 1e3, 1),
        "frames_per_s": round(1.0 / dt, 3),
        # Static compiled-program peak (args+outputs+temps); runtime
        # device_memory_stats() is unavailable behind the tunnel.
        "peak_hbm_gb": device_peak_hbm_gb() or hbm,
        # Against a warm persistent compilation cache (setup_compilation_cache)
        # this is the amortized serving cost; cold-cache cost is the r04 number.
        "compile_s": round(t_compile, 1),
    }
    out_path = pathlib.Path(__file__).resolve().parent.parent / args.out
    out_path.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()

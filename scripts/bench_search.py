"""Reference-scale NAS search benchmark on real TPU hardware.

Runs the bilevel search (weight step on split A + arch step on split B) at
the reference's full search configuration — crop 192x384, maxdisp 192,
feature 6 layers / matching 12 layers, filter_multiplier 4, block_multiplier
3, batch 1 (reference ``search.sh:1-16``, ``search.py:40-48``) — for N real
alternating steps, and records per-step wall time and peak HBM to
``SEARCH_BENCH.json`` at the repo root.

This is the evidence that the rematerialized supernet (SupernetConfig.remat)
actually fits and trains at reference scale on one chip (SURVEY.md §7
hard-part 3). Usage::

    python scripts/bench_search.py [--steps 8] [--batch 1] [--no-remat]
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
    ap.add_argument("--steps", type=int, default=8, help="alternating bilevel steps to time")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--crop_height", type=int, default=192)
    ap.add_argument("--crop_width", type=int, default=384)
    ap.add_argument("--maxdisp", type=int, default=192)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--out", default="SEARCH_BENCH.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import leastereo_tpu

    leastereo_tpu.setup_compilation_cache()

    from leastereo_tpu.search.bilevel import (
        SearchState,
        cosine_iter_schedule,
        make_arch_tx,
        make_search_steps,
        make_weight_tx,
    )
    from leastereo_tpu.search.supernet import AutoStereoSupernet, SupernetConfig
    from leastereo_tpu.utils.profiling import device_peak_hbm_gb, peak_hbm_gb

    remat = not args.no_remat
    model = AutoStereoSupernet(
        maxdisp=args.maxdisp,
        fea=SupernetConfig(6, 4, 3, 3, remat=remat),
        mat=SupernetConfig(12, 4, 3, 3, remat=remat),
    )

    rng = np.random.RandomState(0)
    b, h, w = args.batch, args.crop_height, args.crop_width
    batch = {
        "left": jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        "right": jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        "disparity": jnp.asarray(rng.rand(b, h, w) * args.maxdisp * 0.8, jnp.float32),
    }

    print("initializing supernet...", flush=True)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["left"], batch["right"], train=False
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    print(f"params: {n_params/1e6:.2f} M", flush=True)

    sched = cosine_iter_schedule(0.025, total_iters=10 * 1000)
    state = SearchState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx_w=make_weight_tx(variables["params"], sched),
        tx_a=make_arch_tx(variables["params"]),
    )
    weight_step, arch_step = make_search_steps(args.maxdisp)

    print("compiling weight step...", flush=True)
    t0 = time.perf_counter()
    compiled_w = weight_step.lower(state, batch).compile()
    t_compile_w = time.perf_counter() - t0
    hbm_w = peak_hbm_gb(compiled_w)
    weight_step = compiled_w
    state, m = weight_step(state, batch)
    jax.block_until_ready(m)
    print(
        f"weight step compile: {t_compile_w:.1f}s loss={float(m['loss']):.4f} "
        f"peak_hbm={hbm_w} GB",
        flush=True,
    )

    print("compiling arch step...", flush=True)
    t0 = time.perf_counter()
    state, m = arch_step(state, batch)
    jax.block_until_ready(m)
    t_compile_a = time.perf_counter() - t0
    print(f"arch step compile+run: {t_compile_a:.1f}s loss={float(m['loss']):.4f}", flush=True)

    times_w, times_a, losses = [], [], []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, mw = weight_step(state, batch)
        jax.block_until_ready(mw)
        times_w.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        state, ma = arch_step(state, batch)
        jax.block_until_ready(ma)
        times_a.append(time.perf_counter() - t0)
        losses.append(float(mw["loss"]))
        print(
            f"step {i}: weight {times_w[-1]*1e3:.1f} ms, arch {times_a[-1]*1e3:.1f} ms, "
            f"loss {losses[-1]:.4f}",
            flush=True,
        )

    result = {
        "config": {
            "crop": [h, w],
            "batch": b,
            "maxdisp": args.maxdisp,
            "fea": "6L f4 b3 s3",
            "mat": "12L f4 b3 s3",
            "remat": remat,
            "reference": "search.sh:1-16 (full reference search scale)",
        },
        "device": str(jax.devices()[0]),
        "params_M": round(n_params / 1e6, 3),
        "weight_step_ms": round(float(np.median(times_w)) * 1e3, 1),
        "arch_step_ms": round(float(np.median(times_a)) * 1e3, 1),
        "losses": [round(x, 4) for x in losses],
        # Static compiled-program peak of the weight step (args+outputs+temps);
        # runtime device_memory_stats() is unavailable behind the tunnel.
        "peak_hbm_gb": device_peak_hbm_gb() or hbm_w,
        "compile_s": {"weight": round(t_compile_w, 1), "arch": round(t_compile_a, 1)},
    }
    out = pathlib.Path(__file__).resolve().parent.parent / args.out
    out.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()

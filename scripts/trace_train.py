"""Device-trace the training step and print top HLO ops (train-side analog of
trace_forward.py). Decides e.g. whether the soft-argmin backward is worth a
kernel: VERDICT r3 item 7's criterion is 'head not a top-3 train cost'.
Usage: python scripts/trace_train.py [out_dir]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import leastereo_tpu

leastereo_tpu.setup_compilation_cache()

from leastereo_tpu.models import LEAStereoConfig, best_sceneflow_model
from leastereo_tpu.train.step import TrainState, make_optimizer, make_train_step


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_train"
    cfg = LEAStereoConfig(maxdisp=192, compute_dtype="bfloat16")
    model = best_sceneflow_model(cfg)
    rng = np.random.RandomState(0)
    b, h, w = 4, 384, 576
    batch = {
        "left": jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        "right": jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        "disparity": jnp.asarray(rng.rand(b, h, w) * 150, jnp.float32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["left"], batch["right"])
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=make_optimizer("adam", 1e-3),
    )
    step = make_train_step(192)
    state, m = step(state, batch)
    jax.block_until_ready(m)
    state, m = step(state, batch)
    jax.block_until_ready(m)

    with jax.profiler.trace(out):
        for _ in range(3):
            state, m = step(state, batch)
        jax.block_until_ready(m)

    import glob

    import runpy

    g = runpy.run_path(str(pathlib.Path(__file__).with_name("trace_forward.py")), run_name="lib")
    xplanes = glob.glob(f"{out}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, flush=True)
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    g["report"](
        xplanes,
        top=35,
        iters=3,
        out_json=out_json,
        meta={
            "config": {"crop": [h, w], "batch": b, "maxdisp": 192, "solver": "adam",
                       "reference": "train_sf.sh:7-9 (SceneFlow retrain config)"},
            "device": str(jax.devices()[0]),
            "what": "per-HLO-op device-time attribution of one training step",
        },
    )


if __name__ == "__main__":
    main()

"""Multi-process (multi-host analog) data-parallel training.

Launches TWO separate Python processes on this machine, each with 2 virtual
CPU devices, connected through a local ``jax.distributed`` coordinator — the
standard way to exercise multi-host JAX code paths without a pod. Each
process loads only its slice of the global batch (``data/pipeline.py``) and
runs one sharded training step on the flagship model over the global
4-device ``data`` mesh; gradients psum across the process boundary.

Capability superset of the reference (single-host DataParallel only,
reference ``train.py:71``); targets BASELINE.md's N>=2-host scaling config.
"""

import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

WORKER = r"""
import json, os, sys
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from leastereo_tpu.parallel.multihost import initialize, make_global_batch, process_info

initialize(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]),
)
import jax.numpy as jnp

from leastereo_tpu.data.pipeline import batch_iterator
from leastereo_tpu.models import LEAStereoConfig, best_sceneflow_model
from leastereo_tpu.parallel import make_mesh
from leastereo_tpu.parallel.mesh import batch_sharding
from leastereo_tpu.train import TrainState, make_optimizer, make_train_step

pi, pc = process_info()
assert pc == 2, pc
assert len(jax.devices()) == 4, jax.devices()

mesh = make_mesh()  # (data=4, disp=1) across both processes
sharding = batch_sharding(mesh)

# Synthetic deterministic "dataset": both hosts construct the same samples;
# each loads only its slice of the global batch of 4.
class FakeDataset:
    def __len__(self):
        return 8

    def __getitem__(self, i, epoch=0):
        rng = np.random.RandomState(100 + i)
        class S: pass
        s = S()
        s.left = rng.randn(24, 48, 3).astype(np.float32)
        s.right = rng.randn(24, 48, 3).astype(np.float32)
        s.disparity = (rng.rand(24, 48) * 20).astype(np.float32)
        return s

batches = list(
    batch_iterator(
        FakeDataset(), 4, shuffle=True, epoch=0, seed=0, num_workers=0,
        process_index=pi, process_count=pc,
    )
)
assert len(batches) == 2, len(batches)
assert batches[0]["left"].shape[0] == 2  # local rows only
local = batches[0]
global_batch = make_global_batch(local, sharding)
assert global_batch["left"].shape[0] == 4  # global leading axis

maxdisp = 24
cfg = LEAStereoConfig(maxdisp=maxdisp, compute_dtype="float32")
model = best_sceneflow_model(cfg)
with jax.sharding.set_mesh(mesh):
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((4, 24, 48, 3)),
        jnp.zeros((4, 24, 48, 3)),
    )
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=make_optimizer("adam", 1e-3),
    )
    step = make_train_step(maxdisp, mesh=mesh)
    state, metrics = step(state, global_batch)
    loss = float(metrics["loss"])

print(json.dumps({"process": pi, "loss": loss}), flush=True)
"""


@pytest.mark.slow
def test_two_process_data_parallel_step(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), coord, "2", str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=str(REPO),
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    losses = sorted((o["process"], o["loss"]) for o in outs)
    assert losses[0][0] == 0 and losses[1][0] == 1
    # Both processes compute the SAME global loss (psum'd over the mesh).
    assert np.isfinite(losses[0][1])
    np.testing.assert_allclose(losses[0][1], losses[1][1], rtol=1e-6)


def test_local_batch_slicing_disjoint_and_complete():
    """Process slices of each global batch are disjoint and union to it."""
    from leastereo_tpu.data.pipeline import batch_iterator

    class FakeDataset:
        def __len__(self):
            return 12

        def __getitem__(self, i, epoch=0):
            class S:
                pass

            s = S()
            s.left = np.full((2, 2, 3), i, np.float32)
            s.right = s.left
            s.disparity = np.full((2, 2), i, np.float32)
            return s

    ds = FakeDataset()
    globals_ = [
        b["disparity"][:, 0, 0]
        for b in batch_iterator(ds, 4, shuffle=True, epoch=3, seed=7, num_workers=0)
    ]
    parts = [
        [
            b["disparity"][:, 0, 0]
            for b in batch_iterator(
                ds, 4, shuffle=True, epoch=3, seed=7, num_workers=0,
                process_index=p, process_count=2,
            )
        ]
        for p in range(2)
    ]
    assert len(parts[0]) == len(globals_)
    for k, g in enumerate(globals_):
        merged = np.concatenate([parts[0][k], parts[1][k]])
        np.testing.assert_array_equal(merged, g)

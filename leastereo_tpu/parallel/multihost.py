"""Multi-host (multi-process) SPMD execution.

The reference never scales past one host (``torch.nn.DataParallel``,
reference ``train.py:71``); the TPU framework targets >=80% data-parallel
scaling to N >= 2 hosts (BASELINE.md). The pieces:

* :func:`initialize` — ``jax.distributed.initialize`` with env-var / flag
  plumbing. Call once, before any backend touch; afterwards ``jax.devices()``
  spans all hosts and ``parallel.make_mesh`` builds a global mesh.
* per-process batch slicing — each host loads only the batch rows its
  addressable devices will hold (``data/pipeline.py`` ``process_index`` /
  ``process_count`` args; every host loading the global batch would waste
  IO bandwidth proportional to host count).
* :func:`make_global_batch` — assembles the host-local rows into a global
  ``jax.Array`` over the mesh without any cross-host gather.

Tested without a pod: ``tests/test_multihost.py`` launches two CPU processes
with a local coordinator and runs a sharded training step across them (the
standard JAX way to exercise multi-process code paths on one machine).
"""

from __future__ import annotations

import os

import jax
import numpy as np

__all__ = ["initialize", "local_batch_size", "make_global_batch", "process_info"]


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """``jax.distributed.initialize`` with flag/env fallbacks.

    On TPU pods all three arguments auto-detect from the metadata server;
    elsewhere (CPU tests, GPU clusters) pass them or set
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``.
    """
    kwargs = {}
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — (0, 1) when not distributed."""
    return jax.process_index(), jax.process_count()


def local_batch_size(global_batch: int) -> int:
    count = jax.process_count()
    if global_batch % count:
        raise ValueError(f"global batch {global_batch} not divisible by {count} processes")
    return global_batch // count


def make_global_batch(local_batch: dict, sharding) -> dict:
    """Host-local numpy rows -> global sharded ``jax.Array`` tree.

    Single-process: a plain ``device_put`` with the sharding. Multi-process:
    ``jax.make_array_from_process_local_data`` stitches each host's rows into
    the global array (no cross-host data movement — each host's rows land on
    its own devices)."""
    if jax.process_count() == 1:
        return jax.device_put(local_batch, jax.tree.map(lambda _: sharding, local_batch))

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(put, local_batch)

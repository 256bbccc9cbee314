"""Device-mesh construction for SPMD execution.

The reference's only parallelism is single-host ``torch.nn.DataParallel``
(reference ``train.py:71``, ``search.py:103``). Here parallelism is expressed
the TPU way: a named ``jax.sharding.Mesh`` with two axes —

* ``data``: batch data-parallelism (gradient psum over ICI/DCN, inserted by
  XLA under jit).
* ``disp``: the disparity axis of the 5-D cost volume — the model's
  context-parallel analog (SURVEY.md §2.4). Sharding the volume's D axis
  makes maxdisp-408 full-res Middlebury inference fit; XLA SPMD inserts the
  ±1-slice halo exchanges for the 3x3x3 matching convolutions automatically.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans hosts (a strict superset of the reference's 1-host cap).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "DATA_AXIS", "DISP_AXIS", "batch_sharding", "replicated"]

DATA_AXIS = "data"
DISP_AXIS = "disp"


def make_mesh(data: int | None = None, disp: int = 1, devices=None) -> Mesh:
    """Build a ``(data, disp)`` mesh over ``devices`` (default: all).

    With ``data`` given, uses the first ``data * disp`` devices — letting
    tests and small runs claim a subset of the host's virtual devices.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        if n % disp:
            raise ValueError(f"{n} devices not divisible by disp={disp}")
        data = n // disp
    if data * disp > n:
        raise ValueError(f"mesh {data}x{disp} needs more than {n} devices")
    return Mesh(devices[: data * disp].reshape(data, disp), (DATA_AXIS, DISP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

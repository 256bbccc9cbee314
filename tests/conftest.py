"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax initializes any backend (the standard JAX way to
test mesh/collective code on one machine — SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override (env may carry a TPU platform)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu" at
# interpreter start; counter-override before any backend initializes so the
# suite runs on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REFERENCE = pathlib.Path("/root/reference")


def has_reference() -> bool:
    return REFERENCE.exists()


def has_torch() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


requires_torch = pytest.mark.skipif(not has_torch(), reason="torch oracle not available")
requires_reference = pytest.mark.skipif(
    not (has_reference() and has_torch()), reason="reference repo / torch not available"
)

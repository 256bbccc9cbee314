"""Parameter / FLOPs accounting from compiled XLA computations.

Replaces the reference's torch forward-hook counters
(``utils/multadds_count.py``, vendored ``thop/``) — which missed all 3D convs
— with XLA's own cost analysis: exact flops/bytes for the full jitted graph,
any op type included.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

__all__ = [
    "count_params",
    "param_size_mb",
    "cost_analysis",
    "model_flops",
    "peak_hbm_gb",
    "device_peak_hbm_gb",
]


def count_params(params: Any) -> int:
    return sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))


def param_size_mb(params: Any) -> float:
    """Parameter count in millions (reference count_parameters_in_MB,
    utils/multadds_count.py:8-9 — 'MB' there means 1e6 params)."""
    return count_params(params) / 1e6


def cost_analysis(fn, *args, **kwargs) -> dict:
    """Compile ``fn`` for the given example args and return XLA's cost
    analysis (keys include 'flops', 'bytes accessed', ...)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # older jax returns one dict per device
        analysis = analysis[0]
    return dict(analysis or {})


def model_flops(fn, *args, **kwargs) -> float:
    """Total FLOPs of one jitted call (multiply-adds count as 2)."""
    return float(cost_analysis(fn, *args, **kwargs).get("flops", float("nan")))


def peak_hbm_gb(compiled) -> float | None:
    """Peak HBM of a compiled computation, in GB: arguments + outputs +
    XLA's temp/generated allocations (``memory_analysis()``). This is the
    static compiler bound — the right number on platforms where
    ``device.memory_stats()`` is unavailable (e.g. tunneled devices, whose
    runtime stats stay on the far side)."""
    try:
        m = compiled.memory_analysis()
    except Exception:
        return None
    if m is None:
        return None
    peak = getattr(m, "peak_memory_in_bytes", 0)
    if not peak:
        # Older jaxlibs: upper-bound by the component sum (can exceed the
        # true peak — buffer lifetimes overlap less than the sum implies).
        peak = (
            m.argument_size_in_bytes
            + m.output_size_in_bytes
            - m.alias_size_in_bytes
            + m.temp_size_in_bytes
            + m.generated_code_size_in_bytes
        )
    return round(peak / 1e9, 3)


def device_peak_hbm_gb() -> float | None:
    """Runtime peak HBM from ``device.memory_stats()`` when the platform
    exposes it (returns None behind the axon tunnel)."""
    dev = jax.local_devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return None
    peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
    return round(peak / 1e9, 3) if peak else None

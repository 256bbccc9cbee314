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

__all__ = ["count_params", "param_size_mb", "cost_analysis", "model_flops"]


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

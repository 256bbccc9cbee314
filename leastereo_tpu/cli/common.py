"""Shared driver plumbing: model construction, checkpoint IO, metric logging."""

from __future__ import annotations

import json
import os
import time

import numpy as np

from ..models import (
    BEST_SCENEFLOW,
    LEAStereo,
    LEAStereoConfig,
    load_architecture,
)

__all__ = ["build_model", "MetricLogger", "Timer"]


def build_model(args) -> LEAStereo:
    """Model from arch .npy flags, falling back to the shipped best
    architecture (reference retrain/LEAStereo.py:16-21).

    With ``--mesh_disp > 1`` the cost volume's disparity axis is sharded over
    the mesh's ``disp`` axis (the CP analog for maxdisp-408 Middlebury frames,
    SURVEY.md §2.4); the caller must run the model under
    ``jax.sharding.set_mesh`` of a mesh from ``parallel.make_mesh``."""
    mesh_disp = getattr(args, "mesh_disp", 1) or 1
    cfg = LEAStereoConfig(
        maxdisp=args.maxdisp,
        fea_filter_multiplier=args.fea_filter_multiplier,
        fea_block_multiplier=args.fea_block_multiplier,
        fea_steps=args.fea_step,
        mat_filter_multiplier=args.mat_filter_multiplier,
        mat_block_multiplier=args.mat_block_multiplier,
        mat_steps=args.mat_step,
        compute_dtype=args.dtype,
        fast_head=getattr(args, "fast_head", False),
        return_entropy=getattr(args, "confidence", False),
        cost_volume_pspec=("data", "disp") if mesh_disp > 1 else None,
    )
    if args.net_arch_fea and args.cell_arch_fea:
        fea = load_architecture(args.net_arch_fea, args.cell_arch_fea)
    else:
        fea = BEST_SCENEFLOW["feature"]
    if args.net_arch_mat and args.cell_arch_mat:
        mat = load_architecture(args.net_arch_mat, args.cell_arch_mat)
    else:
        mat = BEST_SCENEFLOW["matching"]
    return LEAStereo(feature_arch=fea, matching_arch=mat, config=cfg)


class MetricLogger:
    """stdout + JSONL scalar logging (replaces the reference's TensorBoard
    writer, train.py:100-101; the JSONL is trivially importable anywhere).

    ``tensorboard=True`` additionally writes standard TB event files next to
    the JSONL (reference train.py:100-101 / search.py:57 capability for
    standard-tooling consumers); requires tensorboardX, no-ops with a
    warning if absent."""

    def __init__(self, logs_dir: str | None, tensorboard: bool = False):
        self.path = None
        self._tb = None
        if logs_dir:
            os.makedirs(logs_dir, exist_ok=True)
            self.path = os.path.join(logs_dir, "metrics.jsonl")
            if tensorboard:
                try:
                    from tensorboardX import SummaryWriter

                    self._tb = SummaryWriter(logs_dir)
                except ImportError:
                    print("tensorboardX not available; --tensorboard ignored")

    def log(self, step: int, **scalars) -> None:
        payload = {"step": int(step)}
        payload.update({k: float(v) for k, v in scalars.items()})
        line = " ".join(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}" for k, v in payload.items())
        print(line, flush=True)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(payload) + "\n")
        if self._tb is not None:
            for k, v in payload.items():
                if k != "step":
                    self._tb.add_scalar(k, v, payload["step"])

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
            self._tb = None


class Timer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.t0


def log_disparity_image(logs_dir: str, tag: str, step: int, disp) -> str:
    """Save a turbo-colormapped disparity render under the logs dir — the
    image-summary analog of reference utils/summaries.py:44-48."""
    import os

    import numpy as np
    from PIL import Image

    from ..utils import colorize_disparity

    d = os.path.join(logs_dir, "images")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{tag}_{step:06d}.png")
    Image.fromarray(colorize_disparity(np.asarray(disp))).save(path)
    return path

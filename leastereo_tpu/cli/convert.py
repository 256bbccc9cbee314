"""Convert a reference PyTorch checkpoint into an orbax checkpoint.

Migration tool for users of the reference repo: takes the ``.pth`` files its
training loop writes (``utils/early_stopping.py:44-52`` — a dict with a
``state_dict`` entry, possibly with ``DataParallel`` ``module.`` prefixes,
reference ``predict.py:55-65``) and emits an orbax checkpoint directory that
every ``--checkpoint`` / ``--resume`` flag in this framework accepts.

Requires torch only at conversion time; nothing else in the framework
imports it.

Usage::

    python -m leastereo_tpu.cli.convert \
        --torch_checkpoint best_epoch_10.pth --out run/imported/checkpoints/best
"""

from __future__ import annotations

import argparse

import numpy as np

from ..utils import save_checkpoint
from ..utils.torch_convert import import_torch_state_dict
from .common import build_model
from .config import add_model_args, apply_platform

__all__ = ["main"]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    add_model_args(p)
    p.add_argument("--torch_checkpoint", type=str, required=True, help="reference .pth file")
    p.add_argument("--out", type=str, required=True, help="orbax checkpoint dir to create")
    p.add_argument("--step", type=int, default=0, help="step label for the orbax checkpoint")
    args = p.parse_args(argv)
    apply_platform(args)

    import torch

    import jax

    ckpt = torch.load(args.torch_checkpoint, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt

    model = build_model(args)
    # Any model-valid shape works: parameter shapes do not depend on the frame.
    sample = np.zeros((1, 48, 96, 3), np.float32)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init(jax.random.PRNGKey(0), sample, sample)
        variables = import_torch_state_dict(variables, state_dict)

    save_checkpoint(
        args.out, args.step, {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    )
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"converted {args.torch_checkpoint} -> {args.out} ({n / 1e6:.3f} M params)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Decode driver: search checkpoint -> genotype ``.npy`` artifacts
(reference ``decode.py``)."""

from __future__ import annotations

import os
import sys

import numpy as np

from ..search import decode_arch, save_decoded
from .config import decode_parser

__all__ = ["main"]


def main(argv=None) -> int:
    args = decode_parser().parse_args(argv)

    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(args.checkpoint))
    step = args.step if args.step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {args.checkpoint}")
    tree = mgr.restore(step)
    mgr.close()

    params = tree["params"]
    fea = decode_arch(
        np.asarray(params["feature"]["alphas"]),
        np.asarray(params["feature"]["betas"]),
        steps=args.fea_step,
    )
    mat = decode_arch(
        np.asarray(params["matching"]["alphas"]),
        np.asarray(params["matching"]["betas"]),
        steps=args.mat_step,
    )
    out_dir = args.out_dir or os.path.join(args.checkpoint, "architecture")
    paths = save_decoded(out_dir, fea, mat)
    print(f"feature path:  {fea[0].tolist()}")
    print(f"matching path: {mat[0].tolist()}")
    for k, v in paths.items():
        print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Batch-free inference driver (reference ``predict.py``).

Per frame: load + standardize, sentinel-pad or center-crop to the inference
shape, jitted forward (compiled once per shape), un-pad, save a
turbo-colormapped PNG; prints per-frame wall time.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np

from ..data import ListSet, StereoListDataset
from ..data.transforms import test_transform
from ..utils import colorize_disparity, restore_checkpoint, tolerant_merge
from .common import Timer, build_model
from .config import predict_parser

__all__ = ["main", "run_frame", "make_forward"]


def make_forward(model, variables):
    @jax.jit
    def fwd(left, right):
        return model.apply(variables, left, right)

    return fwd


def pad_to_valid(h: int, w: int, multiple: int = 12) -> tuple[int, int]:
    """Smallest model-valid (divisible by 3, and by 4 at 1/3 res) shape >= (h, w)."""
    return (-(-h // multiple) * multiple, -(-w // multiple) * multiple)


def run_frame(
    fwd,
    stack: np.ndarray,
    crop_height: int,
    crop_width: int,
    use_left: bool = True,
    full_frame: bool = False,
):
    """Pad-or-crop one frame, run the model, un-pad the prediction
    (reference predict.py:144-174).

    ``full_frame=True`` is a capability superset of the reference: frames
    larger than the crop are sentinel-padded up to the next model-valid shape
    and evaluated whole instead of center-cropped (the reference always
    center-crops both prediction and ground truth, evaluation.py:288).

    A ``fwd`` returning a tuple (e.g. ``(disp, entropy)`` with
    ``--confidence``) yields a tuple of identically un-padded maps.
    """
    _, h, w = stack.shape
    if full_frame:
        crop_height, crop_width = pad_to_valid(max(h, crop_height), max(w, crop_width))
    left, right, _ = test_transform(stack, crop_height, crop_width, use_left=use_left)
    out = fwd(left[None], right[None])
    is_tuple = isinstance(out, tuple)

    def unpad(x):
        x = np.asarray(x, np.float32)[0]
        if h <= crop_height and w <= crop_width:
            x = x[crop_height - h :, crop_width - w :]
        return x

    return tuple(unpad(o) for o in out) if is_tuple else unpad(out)


def main(argv=None) -> int:
    args = predict_parser().parse_args(argv)
    from .config import apply_platform

    apply_platform(args)
    from .. import setup_compilation_cache

    setup_compilation_cache()

    lists = ListSet.resolve(args.listset, args.lists_dir)
    list_file = getattr(lists, args.split)
    ds = StereoListDataset(
        dataset=args.dataset,
        list_file=list_file,
        root=args.data_root,
        crop_size=(args.crop_height, args.crop_width),
        training=False,
    )

    # Disparity-sharded inference (the CP analog for large maxdisp frames,
    # reference predict_md.sh's maxdisp-408 Middlebury config): with
    # --mesh_disp N the stem/cost volume's D axis spreads over N devices and
    # XLA inserts the halo exchanges for the 3D convolutions.
    from contextlib import nullcontext

    from ..parallel import make_mesh

    mesh_disp = getattr(args, "mesh_disp", 1) or 1
    mesh_data = getattr(args, "mesh_data", None)
    if mesh_disp > 1 or (mesh_data or 0) > 1:
        mesh_ctx = jax.sharding.set_mesh(make_mesh(data=mesh_data or 1, disp=mesh_disp))
    else:
        mesh_ctx = nullcontext()

    model = build_model(args)
    with mesh_ctx:
        sample = np.zeros((1, args.crop_height, args.crop_width, 3), np.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample, sample)
        if args.checkpoint:
            template = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
            variables = dict(tolerant_merge(template, restore_checkpoint(args.checkpoint, template)))
            print(f"loaded checkpoint {args.checkpoint}", flush=True)
        fwd = make_forward(model, variables)

        os.makedirs(args.output_dir, exist_ok=True)
        from PIL import Image

        from ..data.loaders import uses_left_disparity

        use_left = uses_left_disparity(args.dataset)
        for i in range(len(ds)):
            stack = ds.load_stack(i)
            with Timer() as t:
                disp = run_frame(
                    fwd, stack, args.crop_height, args.crop_width, use_left,
                    full_frame=getattr(args, "full_frame", False),
                )
            name = ds.entries[i].replace("/", "_")
            if isinstance(disp, tuple):
                disp, entropy = disp
                Image.fromarray(
                    (np.clip(entropy / max(entropy.max(), 1e-12), 0, 1) * 255).astype(np.uint8)
                ).save(os.path.join(args.output_dir, f"{name}_conf.png"))
                np.save(os.path.join(args.output_dir, f"{name}_conf.npy"), entropy)
            disp = np.asarray(disp)
            Image.fromarray(colorize_disparity(disp)).save(os.path.join(args.output_dir, f"{name}.png"))
            np.save(os.path.join(args.output_dir, f"{name}.npy"), disp)
            if getattr(args, "save_gt", False):
                gt = stack[6] if use_left else stack[7]
                Image.fromarray(colorize_disparity(gt, vmin=0, vmax=args.maxdisp)).save(
                    os.path.join(args.output_dir, f"{name}_gt.png")
                )
            print(f"{ds.entries[i]}: {t.seconds:.3f}s  disp[{disp.min():.1f}, {disp.max():.1f}]", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Evaluation driver (reference ``evaluation.py``): per-frame inference +
EPE / 3px / bad-N metrics, prediction + GT renders, red error overlays,
``_metrics.txt`` files, and dataset averages."""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from ..data import ListSet, StereoListDataset
from ..data.loaders import uses_left_disparity
from ..utils import colorize_disparity, restore_checkpoint, tolerant_merge
from .common import build_model
from .config import evaluate_parser
from .predict import make_forward, run_frame

__all__ = ["main", "frame_metrics", "error_overlay"]


def _validity(target: np.ndarray, maxdisp: int) -> np.ndarray:
    return (target > 0.001) & (target < maxdisp)


def frame_metrics(pred: np.ndarray, target: np.ndarray, maxdisp: int, thresholds) -> dict:
    """EPE, 3px-error (>=3px AND >=5% of GT), bad-N fractions
    (reference utils/metrics.py)."""
    mask = _validity(target, maxdisp)
    n = max(int(mask.sum()), 1)
    diff = np.abs(pred - target)
    out = {"epe": float((diff * mask).sum() / n)}
    correct3 = ((diff < 3) | (diff < target * 0.05)) & mask
    out["err3"] = 1.0 - float(correct3.sum()) / n
    for t in thresholds:
        out[f"bad{t:g}"] = 1.0 - float(((diff <= t) & mask).sum()) / n
    out["valid_px"] = int(mask.sum())
    return out


def error_overlay(left_rgb: np.ndarray, pred: np.ndarray, target: np.ndarray, maxdisp: int, threshold: float = 3.0) -> np.ndarray:
    """Grayscale view with wrong pixels painted red
    (reference evaluation.py:134-146)."""
    img = left_rgb.astype(np.float32)
    img = (img - img.min()) / max(img.max() - img.min(), 1e-6)
    gray = (img.mean(axis=-1) * 255).astype(np.uint8)
    out = np.stack([gray, gray, gray], axis=-1)
    mask = _validity(target, maxdisp)
    diff = np.abs(pred - target)
    wrong = mask & (diff >= threshold) & (diff >= target * 0.05)
    out[wrong] = (255, 0, 0)
    return out


def main(argv=None) -> int:
    args = evaluate_parser().parse_args(argv)
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

    model = build_model(args)
    sample = np.zeros((1, args.crop_height, args.crop_width, 3), np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample, sample)
    if args.checkpoint:
        template = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
        variables = dict(tolerant_merge(template, restore_checkpoint(args.checkpoint, template)))
        print(f"loaded checkpoint {args.checkpoint}", flush=True)
    fwd = make_forward(model, variables)

    os.makedirs(args.output_dir, exist_ok=True)
    from PIL import Image

    use_left = uses_left_disparity(args.dataset)
    totals: list[dict] = []
    for i in range(len(ds)):
        stack = ds.load_stack(i)
        disp = run_frame(
            fwd, stack, args.crop_height, args.crop_width, use_left,
            full_frame=args.full_frame,
        )
        entropy = None
        if isinstance(disp, tuple):
            disp, entropy = disp
        if args.round_disp:
            disp = np.round(disp)  # reference evaluation.py:169
        disp = disp + args.z_shift
        target = stack[6] if use_left else stack[7]
        # Metrics on the overlap: with --full_frame the prediction covers the
        # whole frame; otherwise it may be a center crop, and the GT is
        # center-cropped to match (parity with reference evaluation.py:288).
        th, tw = disp.shape
        oh = (target.shape[0] - th) // 2 if target.shape[0] > th else 0
        ow = (target.shape[1] - tw) // 2 if target.shape[1] > tw else 0
        target_c = target[oh : oh + th, ow : ow + tw]
        left_c = np.transpose(stack[0:3], (1, 2, 0))[oh : oh + th, ow : ow + tw]

        m = frame_metrics(disp, target_c, args.maxdisp, args.thresholds)
        totals.append(m)
        name = ds.entries[i].replace("/", "_")
        Image.fromarray(colorize_disparity(disp)).save(os.path.join(args.output_dir, f"{name}_pred.png"))
        Image.fromarray(colorize_disparity(np.where(_validity(target_c, args.maxdisp), target_c, 0))).save(
            os.path.join(args.output_dir, f"{name}_gt.png")
        )
        Image.fromarray(error_overlay(left_c, disp, target_c, args.maxdisp)).save(
            os.path.join(args.output_dir, f"{name}_err.png")
        )
        np.save(os.path.join(args.output_dir, f"{name}_pred.npy"), disp)
        if entropy is not None:
            Image.fromarray(
                (np.clip(entropy / max(entropy.max(), 1e-12), 0, 1) * 255).astype(np.uint8)
            ).save(os.path.join(args.output_dir, f"{name}_conf.png"))
            np.save(os.path.join(args.output_dir, f"{name}_conf.npy"), entropy)
        with open(os.path.join(args.output_dir, f"{name}_metrics.txt"), "w") as f:
            for k, v in m.items():
                f.write(f"{k}: {v}\n")
        print(f"{ds.entries[i]}: " + " ".join(f"{k}={v:.4f}" for k, v in m.items() if k != "valid_px"), flush=True)

    if totals:
        print("=== averages ===")
        for k in totals[0]:
            if k == "valid_px":
                continue
            print(f"{k}: {np.mean([t[k] for t in totals]):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Retrain / fine-tune driver (reference ``train.py``).

python -m leastereo_tpu.cli.train --dataset sceneflow --listset sceneflow_demo \
    --crop_height 192 --crop_width 384 --batch_size 2 --epochs 2 ...

Single jitted train step over a ``(data, disp)`` mesh; host loop handles
epochs, validation, early stopping, checkpoints, and JSONL metric logs.
"""

from __future__ import annotations

import sys

import jax
import numpy as np
import optax

from ..data import ListSet, StereoListDataset, make_loader
from ..parallel import make_mesh
from ..parallel.mesh import batch_sharding
from ..train import (
    TrainState,
    make_eval_step,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)
from ..utils import EarlyStopping, ExperimentSaver, param_size_mb, restore_checkpoint, save_checkpoint, tolerant_merge
from .common import MetricLogger, build_model
from .config import train_parser

__all__ = ["main", "freeze_labels"]


def freeze_labels(params, freeze_feature: bool, freeze_matching: int):
    """'frozen'/'train' label tree. Parity with reference transfer-learning
    freezing (train.py:90-96, skip_model_3d.py:176-190): ``freeze_feature``
    freezes the whole feature net; ``freeze_matching=n`` freezes the matching
    stems + first n cells (+ the skip fusion convs once their target cell is
    frozen)."""

    def label(path, _):
        keys = [getattr(p, "key", None) for p in path]
        if freeze_feature and keys[0] == "feature":
            return "frozen"
        if freeze_matching and keys[0] == "matching":
            name = keys[1] or ""
            if name.startswith("stem"):
                return "frozen"
            if name.startswith("cell_") and int(name.split("_")[1]) < freeze_matching:
                return "frozen"
            if name.startswith("skip_conv_") and int(name.split("_")[2]) <= freeze_matching:
                return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def build_tx(args, params, steps_per_epoch: int):
    """Adam/SGD + LR schedule (reference train.py:75-80 MultiStepLR or
    utils/lr_scheduler.py cos/poly/step incl. warmup), with optional freeze
    partition."""
    schedule = make_lr_schedule(
        args.lr_scheduler,
        args.lr,
        args.epochs,
        steps_per_epoch,
        milestones=tuple(args.milestones),
        gamma=args.lr_gamma,
        lr_step=args.lr_step,
        warmup_epochs=args.warmup_epochs,
        min_lr=args.min_lr,
    )
    inner = make_optimizer(args.solver, schedule)
    if args.freeze_feature or args.freeze_matching:
        labels = freeze_labels(params, bool(args.freeze_feature), args.freeze_matching)
        inner = optax.multi_transform({"train": inner, "frozen": optax.set_to_zero()}, labels)
    return inner


def make_val_other(args, model):
    """Extra fixed-list validation sweeps with per-sweep z_shift during
    training (reference train.py:243-307 ``val_other``/``val_for`` — there
    hardcoded to three Tagil subsets + ``--val12/34/56`` flags; here any
    number of ``--val_other name:dataset:list_file:data_root[:z_shift]``
    specs). Returns ``run(state) -> [(name, metrics), ...]`` or None."""
    specs = getattr(args, "val_other", None) or []
    if not specs:
        return None
    from .evaluate import frame_metrics
    from .predict import run_frame

    sweeps = []
    for spec in specs:
        parts = spec.split(":")
        if len(parts) not in (4, 5):
            raise ValueError(
                f"--val_other expects name:dataset:list_file:data_root[:z_shift], got {spec!r}"
            )
        name, dataset, list_file, root = parts[:4]
        z_shift = float(parts[4]) if len(parts) == 5 else 0.0
        ds = StereoListDataset(
            dataset=dataset, list_file=list_file, root=root,
            crop_size=(args.crop_height, args.crop_width), training=False,
        )
        sweeps.append((name, ds, z_shift))

    @jax.jit
    def fwd(params, batch_stats, left, right):
        return model.apply({"params": params, "batch_stats": batch_stats}, left, right)

    def run(state):
        out = []
        for name, ds, z_shift in sweeps:
            frames = []
            for i in range(len(ds)):
                stack = ds.load_stack(i)
                disp = run_frame(
                    lambda l, r: fwd(state.params, state.batch_stats, l, r),
                    stack, args.crop_height, args.crop_width,
                )
                disp = disp + z_shift
                target = stack[6]
                th, tw = disp.shape
                oh = (target.shape[0] - th) // 2 if target.shape[0] > th else 0
                ow = (target.shape[1] - tw) // 2 if target.shape[1] > tw else 0
                frames.append(
                    frame_metrics(disp, target[oh : oh + th, ow : ow + tw], args.maxdisp, ())
                )
            avg = {k: float(np.mean([f[k] for f in frames])) for k in ("epe", "err3")}
            print(f"===> val_other {name}: epe={avg['epe']:.4f} err3={avg['err3']:.4f}", flush=True)
            out.append((name, avg))
        return out

    return run


def main(argv=None) -> int:
    args = train_parser().parse_args(argv)
    from .config import apply_platform

    apply_platform(args)
    if args.multihost:
        from ..parallel.multihost import initialize

        initialize()
        print(f"multihost: process {jax.process_index()}/{jax.process_count()}", flush=True)
    from .. import setup_compilation_cache

    setup_compilation_cache()

    saver = ExperimentSaver(args.run_root, args.dataset, "train", args.experiment, resume=bool(args.resume))
    saver.save_parameters(args)
    log = MetricLogger(saver.logs_dir, tensorboard=getattr(args, "tensorboard", False))

    lists = ListSet.resolve(args.listset, args.lists_dir)
    crop = (args.crop_height, args.crop_width)
    ds_kw = dict(dataset=args.dataset, root=args.data_root, seed=args.seed)
    train_ds = StereoListDataset(
        list_file=lists.train, crop_size=crop, training=True, shift=args.shift,
        left_right=args.left_right, **ds_kw,
    )
    val_ds = StereoListDataset(list_file=lists.val, crop_size=crop, training=False, **ds_kw)

    mesh = make_mesh(data=args.mesh_data, disp=args.mesh_disp)
    sharding = batch_sharding(mesh)
    train_loader = make_loader(train_ds, args.batch_size, seed=args.seed, num_workers=args.workers, sharding=sharding)
    # Eval batches may not divide the data axis; fall back to replicated eval
    # (multi-host: every host evaluates the full val list locally — duplicated
    # but simple, and val cost is negligible next to training).
    val_mesh = mesh if (args.test_batch_size % mesh.shape["data"] == 0 and jax.process_count() == 1) else None
    if val_mesh is None and (mesh.shape["data"] > 1 or jax.process_count() > 1):
        print(
            "validation runs replicated (eval batch does not divide the data axis, "
            "or multi-host): every host evaluates the full val list locally",
            flush=True,
        )
    val_loader = make_loader(val_ds, args.test_batch_size, shuffle=False, num_workers=args.workers,
                             sharding=sharding if val_mesh else None, drop_last=False,
                             process_index=0, process_count=1)

    model = build_model(args)
    rng = jax.random.PRNGKey(args.seed)
    sample = np.zeros((args.batch_size, *crop, 3), np.float32)
    with jax.sharding.set_mesh(mesh):
        variables = jax.jit(model.init)(rng, sample, sample)
    print(f"model params: {param_size_mb(variables['params']):.3f} M", flush=True)

    tx = build_tx(args, variables["params"], max(train_loader.steps_per_epoch, 1))
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )
    if args.resume:
        template = {"params": state.params, "batch_stats": state.batch_stats}
        restored = restore_checkpoint(args.resume, template)
        merged = tolerant_merge(template, restored)
        state = state.replace(params=merged["params"], batch_stats=merged["batch_stats"])
        print(f"resumed from {args.resume}", flush=True)

    train_step = make_train_step(args.maxdisp, mesh=mesh, edge_loss_w=args.edge_loss_w)
    eval_step = make_eval_step(args.maxdisp, mesh=val_mesh)

    def save(kind: str, epoch: int):
        save_checkpoint(
            f"{saver.checkpoint_dir}/{kind}",
            epoch,
            {"params": state.params, "batch_stats": state.batch_stats},
        )

    # n_epochs mode (reference train.py:393-429): fixed epoch count, no early
    # stop — patience disabled; periodic saves gated on --ckpt_min_epoch.
    n_epochs_mode = getattr(args, "loop_mode", "early_stop") == "n_epochs"
    early = EarlyStopping(
        args.epochs + 1 if n_epochs_mode else args.patience,
        0.0 if n_epochs_mode else args.es_delta,  # ref n_epochs: plain loss < best
        args.ckpt_period,
        save_fn=save,
    )
    if n_epochs_mode and args.ckpt_min_epoch:
        inner_save = early.save_fn

        def gated_save(kind: str, epoch: int):
            if kind == "periodic" and epoch < args.ckpt_min_epoch:
                return
            inner_save(kind, epoch)

        early.save_fn = gated_save

    val_other = make_val_other(args, model)

    step = 0
    with jax.sharding.set_mesh(mesh):
        for epoch in range(args.epochs):
            for epoch_step, batch in enumerate(train_loader(epoch)):
                state, metrics = train_step(state, batch)
                step += 1
                if step % 10 == 1:
                    log.log(step, epoch=epoch, **{k: float(v) for k, v in metrics.items()})
                if args.max_steps_per_epoch and epoch_step + 1 >= args.max_steps_per_epoch:
                    break
            # validation
            vals = []
            for batch in val_loader(0):
                _, m = eval_step(state, batch)
                vals.append({k: float(v) for k, v in m.items()})
            if val_other is not None:
                for name, m in val_other(state):
                    log.log(step, epoch=epoch, **{f"val_{name}_{k}": v for k, v in m.items()})
            if vals:
                avg = {k: float(np.mean([v[k] for v in vals])) for k in vals[0]}
                log.log(step, epoch=epoch, **{f"val_{k}": v for k, v in avg.items()})
                if early(avg["err3"], epoch + 1):
                    print(f"early stop at epoch {epoch} (best {early.best:.4f} @ {early.best_epoch})", flush=True)
                    break
    save("final", args.epochs)
    return 0


if __name__ == "__main__":
    sys.exit(main())

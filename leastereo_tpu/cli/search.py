"""Bilevel NAS search driver (reference ``search.py``).

Weight steps (SGD, cosine per-iteration LR) on the search_weights split;
after ``--alpha_epoch``, one arch step (Adam) per weight step on the
search_arch split. Checkpoints carry params + batch_stats so ``decode`` can
extract alphas/betas.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..data import ListSet, StereoListDataset, make_loader
from ..parallel import make_mesh
from ..parallel.mesh import batch_sharding
from ..search import (
    AutoStereoSupernet,
    SearchState,
    SupernetConfig,
    cosine_iter_schedule,
    make_arch_tx,
    make_search_steps,
    make_weight_tx,
)
from ..utils import ExperimentSaver, param_size_mb, restore_checkpoint, save_checkpoint, tolerant_merge
from ..train import make_eval_step
from .common import MetricLogger
from .config import search_parser

__all__ = ["main"]


def main(argv=None) -> int:
    args = search_parser().parse_args(argv)
    from .config import apply_platform

    apply_platform(args)
    if args.multihost:
        from ..parallel.multihost import initialize

        initialize()
        print(f"multihost: process {jax.process_index()}/{jax.process_count()}", flush=True)
    from .. import setup_compilation_cache

    setup_compilation_cache()

    saver = ExperimentSaver(args.run_root, args.dataset, "search", args.experiment, resume=bool(args.resume))
    saver.save_parameters(args)
    log = MetricLogger(saver.logs_dir, tensorboard=getattr(args, "tensorboard", False))

    lists = ListSet.resolve(args.listset, args.lists_dir)
    crop = (args.crop_height, args.crop_width)
    ds_kw = dict(dataset=args.dataset, root=args.data_root, seed=args.seed)
    weights_ds = StereoListDataset(list_file=lists.search_weights, crop_size=crop, training=True, **ds_kw)
    arch_ds = StereoListDataset(list_file=lists.search_arch, crop_size=crop, training=True, **ds_kw)
    val_ds = StereoListDataset(list_file=lists.val, crop_size=crop, training=False, **ds_kw)

    mesh = make_mesh(data=args.mesh_data, disp=args.mesh_disp)
    sharding = batch_sharding(mesh)
    loader_w = make_loader(weights_ds, args.batch_size, seed=args.seed, num_workers=args.workers, sharding=sharding)
    loader_a = make_loader(arch_ds, args.batch_size, seed=args.seed + 1, num_workers=args.workers, sharding=sharding)
    val_mesh = mesh if (mesh.shape["data"] == 1 and jax.process_count() == 1) else None
    val_loader = make_loader(val_ds, 1, shuffle=False, num_workers=args.workers,
                             sharding=sharding if val_mesh else None, drop_last=False,
                             process_index=0, process_count=1)

    model = AutoStereoSupernet(
        maxdisp=args.maxdisp,
        fea=SupernetConfig(args.fea_num_layers, args.fea_filter_multiplier, args.fea_block_multiplier, args.fea_step),
        mat=SupernetConfig(args.mat_num_layers, args.mat_filter_multiplier, args.mat_block_multiplier, args.mat_step),
        dtype=jnp.dtype(args.dtype),
    )
    rng = jax.random.PRNGKey(args.seed)
    sample = np.zeros((args.batch_size, *crop, 3), np.float32)
    with jax.sharding.set_mesh(mesh):
        variables = jax.jit(model.init)(rng, sample, sample)
    print(f"supernet params: {param_size_mb(variables['params']):.3f} M", flush=True)

    steps_per_epoch = max(loader_w.steps_per_epoch, 1)
    tx_w = make_weight_tx(
        variables["params"],
        cosine_iter_schedule(args.lr, args.epochs * steps_per_epoch, args.min_lr),
        momentum=args.momentum,
        weight_decay=args.weight_decay,
    )
    tx_a = make_arch_tx(variables["params"], lr=args.arch_lr, weight_decay=args.arch_weight_decay)
    state = SearchState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx_w=tx_w,
        tx_a=tx_a,
    )
    if args.resume:
        template = {"params": state.params, "batch_stats": state.batch_stats}
        merged = tolerant_merge(template, restore_checkpoint(args.resume, template))
        state = state.replace(params=merged["params"], batch_stats=merged["batch_stats"])
        print(f"resumed from {args.resume}", flush=True)

    weight_step, arch_step = make_search_steps(args.maxdisp, mesh=mesh)
    eval_step = make_eval_step(args.maxdisp, mesh=val_mesh)

    best = float("inf")
    step = 0
    # The arch split is a plain cycle: pass k reshuffles with seed k, advancing
    # one batch per weight step regardless of epoch boundaries (reference
    # search.py alternation over the B split).
    arch_pass = 0
    arch_batches = None
    with jax.sharding.set_mesh(mesh):
        for epoch in range(args.epochs):
            use_arch = epoch >= args.alpha_epoch
            for epoch_step, batch in enumerate(loader_w(epoch)):
                state, metrics = weight_step(state, batch)
                step += 1
                if use_arch:
                    if arch_batches is None:
                        arch_batches = iter(loader_a(arch_pass))
                    try:
                        arch_batch = next(arch_batches)
                    except StopIteration:
                        arch_pass += 1
                        arch_batches = iter(loader_a(arch_pass))
                        arch_batch = next(arch_batches)
                    state, _ = arch_step(state, arch_batch)
                if step % 10 == 1:
                    log.log(step, epoch=epoch, **{k: float(v) for k, v in metrics.items()})
                if args.max_steps_per_epoch and epoch_step + 1 >= args.max_steps_per_epoch:
                    break
            vals = []
            for batch in val_loader(0):
                _, m = eval_step(state, batch)
                vals.append({k: float(v) for k, v in m.items()})
            if vals:
                avg = {k: float(np.mean([v[k] for v in vals])) for k in vals[0]}
                log.log(step, epoch=epoch, **{f"val_{k}": v for k, v in avg.items()})
                tree = {"params": state.params, "batch_stats": state.batch_stats}
                save_checkpoint(f"{saver.checkpoint_dir}/latest", epoch, tree)
                if avg["err3"] < best:
                    best = avg["err3"]
                    save_checkpoint(f"{saver.checkpoint_dir}/best", epoch, tree)
    return 0


if __name__ == "__main__":
    sys.exit(main())

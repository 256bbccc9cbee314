"""Checkpoint save/restore built on orbax.

Replaces torch.save dict checkpoints (reference ``utils/early_stopping.py:40-53``,
``utils/saver.py:43-50``, resume logic ``train.py:82-88`` /
``search.py:107-142``) with orbax PyTree checkpoints of
``{step, params, batch_stats, opt_state(s), best_metric}``. Restore tolerates
missing/mismatched entries like the reference's ``copy_state_dict``
(``utils/copy_state_dict.py``): matching-shape leaves are adopted, everything
else keeps its initialized value.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step", "tolerant_merge"]


def _manager(directory: str, max_to_keep: int | None = None):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(directory: str, step: int, tree: Any, max_to_keep: int | None = None) -> None:
    """Save a pytree under ``directory/<step>/``."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(jax.tree.map(np.asarray, tree)))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> int | None:
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, target: Any, step: int | None = None) -> Any:
    """Restore into ``target``'s structure (shape/dtype template)."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            mgr.close()
            raise FileNotFoundError(f"no checkpoint under {directory}")
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(jax.tree.map(np.asarray, target))
    )
    mgr.close()
    return restored


def tolerant_merge(target: Any, source: Any) -> Any:
    """Adopt every leaf of ``source`` whose path+shape matches ``target``;
    keep the target's value elsewhere (reference ``copy_state_dict`` semantics
    for partially-compatible checkpoints, utils/copy_state_dict.py:1-17)."""
    tgt_flat = dict(jax.tree_util.tree_flatten_with_path(target)[0])
    src_flat = dict(jax.tree_util.tree_flatten_with_path(source)[0])
    merged = {}
    for path, tval in tgt_flat.items():
        sval = src_flat.get(path)
        if sval is not None and np.shape(sval) == np.shape(tval):
            merged[path] = sval
        else:
            merged[path] = tval
    treedef = jax.tree_util.tree_structure(target)
    # tree_flatten_with_path preserves leaf order
    ordered = [merged[p] for p, _ in jax.tree_util.tree_flatten_with_path(target)[0]]
    return jax.tree_util.tree_unflatten(treedef, ordered)

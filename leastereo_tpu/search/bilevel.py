"""Bilevel (DARTS first-order) search optimization.

Reference ``search.py:75-100,155-211``: SGD(lr cosine-per-iteration, momentum
0.9, wd 3e-4) on the network weights using split A, and Adam(1e-3, wd 1e-3)
on the arch parameters (alphas/betas) using split B, alternating one step
each. The reference keeps four optimizers (feature/matching x weight/arch)
with identical hyperparameters; here each side is ONE optax transform over a
'weight'/'arch' label partition — identical math, half the bookkeeping.

Both steps are separate jitted functions sharing one :class:`SearchState`;
each computes grads for the full param tree (XLA prunes the unused adjoint
work) and applies its multi_transform, which zeroes updates for the other
partition.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS
from ..train.losses import smooth_l1
from ..train.metrics import epe, three_px_error
from .supernet import arch_label_tree

__all__ = ["SearchState", "cosine_iter_schedule", "make_search_steps"]


class SearchState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_w: Any
    opt_a: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx_w: optax.GradientTransformation = struct.field(pytree_node=False)
    tx_a: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, apply_fn, params, batch_stats, tx_w, tx_a):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_w=tx_w.init(params),
            opt_a=tx_a.init(params),
            apply_fn=apply_fn,
            tx_w=tx_w,
            tx_a=tx_a,
        )


def cosine_iter_schedule(base_lr: float, total_iters: int, min_lr: float = 1e-3) -> optax.Schedule:
    """Per-iteration cosine with a floor: lr = base/2 * (1 + cos(pi*T/N)),
    clamped at min_lr (reference utils/lr_scheduler.py:48-58)."""

    def schedule(t):
        lr = 0.5 * base_lr * (1.0 + jnp.cos(jnp.pi * t / total_iters))
        return jnp.maximum(lr, min_lr)

    return schedule


def _partitioned(inner: optax.GradientTransformation, params, train_label: str):
    labels = arch_label_tree(params)
    other = "arch" if train_label == "weight" else "weight"
    return optax.multi_transform({train_label: inner, other: optax.set_to_zero()}, labels)


def make_weight_tx(params, lr_schedule, momentum=0.9, weight_decay=3e-4):
    inner = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr_schedule, momentum=momentum),
    )
    return _partitioned(inner, params, "weight")


def make_arch_tx(params, lr=1e-3, weight_decay=1e-3):
    inner = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.adam(lr, b1=0.9, b2=0.999),
    )
    return _partitioned(inner, params, "arch")


def make_search_steps(maxdisp: int, mesh: Mesh | None = None):
    """Returns jitted ``(weight_step, arch_step)``:
    ``step(state, batch) -> (state, metrics)``.

    Loss parity with search.py:170-183: smooth-L1 over the ``target < maxdisp``
    mask (no lower bound, unlike retrain).
    """

    def _loss_and_step(state: SearchState, batch, which: str):
        def loss_fn(params):
            disp, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["left"],
                batch["right"],
                train=True,
                mutable=["batch_stats"],
            )
            disp = disp.astype(jnp.float32)
            target = batch["disparity"]
            mask = target < maxdisp
            loss = jnp.sum(smooth_l1(disp - target) * mask) / jnp.maximum(mask.sum(), 1)
            return loss, (updates["batch_stats"], disp)

        (loss, (new_stats, disp)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if which == "weight":
            updates, new_opt = state.tx_w.update(grads, state.opt_w, state.params)
            new_params = optax.apply_updates(state.params, updates)
            state = state.replace(
                step=state.step + 1, params=new_params, batch_stats=new_stats, opt_w=new_opt
            )
        else:
            updates, new_opt = state.tx_a.update(grads, state.opt_a, state.params)
            new_params = optax.apply_updates(state.params, updates)
            state = state.replace(params=new_params, batch_stats=new_stats, opt_a=new_opt)
        metrics = {
            "loss": loss,
            "epe": epe(disp, batch["disparity"], maxdisp),
            "err3": three_px_error(disp, batch["disparity"], maxdisp),
        }
        return state, metrics

    def weight_step(state, batch):
        return _loss_and_step(state, batch, "weight")

    def arch_step(state, batch):
        return _loss_and_step(state, batch, "arch")

    if mesh is None:
        return jax.jit(weight_step, donate_argnums=(0,)), jax.jit(arch_step, donate_argnums=(0,))
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    kw = dict(in_shardings=(repl, batch_sh), out_shardings=(repl, repl), donate_argnums=(0,))
    return jax.jit(weight_step, **kw), jax.jit(arch_step, **kw)

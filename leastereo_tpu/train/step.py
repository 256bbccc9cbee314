"""Jitted training / evaluation steps over a device mesh.

Replaces the reference's DataParallel training loops (``train.py:130-178``)
with a single pjit'd step: batch sharded over the mesh ``data`` axis,
parameters replicated, gradient all-reduce inserted by XLA as ``psum`` over
ICI. BatchNorm batch statistics are computed over the *global* batch under
GSPMD (sync-BN; the reference's per-replica BN is strictly noisier —
documented divergence, SURVEY.md §7 step 3).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS
from .losses import edge_aware_smoothness_loss, masked_smooth_l1
from .metrics import epe, three_px_error


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, apply_fn, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            apply_fn=apply_fn,
            tx=tx,
        )


def multistep_lr(base_lr: float, milestones: tuple[int, ...], gamma: float) -> optax.Schedule:
    """MultiStepLR analog (reference train.py:80: milestones [30,50,300], γ=0.5),
    in units of epochs — pass per-epoch boundaries scaled to steps."""
    return optax.piecewise_constant_schedule(
        base_lr, {int(m): gamma for m in milestones}
    )


def make_lr_schedule(
    mode: str,
    base_lr: float,
    num_epochs: int,
    steps_per_epoch: int,
    *,
    milestones: tuple[int, ...] = (),
    gamma: float = 0.5,
    lr_step: int = 0,
    warmup_epochs: int = 0,
    min_lr: float | None = None,
) -> optax.Schedule:
    """Per-iteration LR schedule, parity with reference ``utils/lr_scheduler.py:14-75``.

    Modes (T = global step, N = num_epochs * steps_per_epoch):

    * ``cos``       — ``0.5 * lr * (1 + cos(pi * T / N))``
    * ``poly``      — ``lr * (1 - T/N)^0.9``
    * ``step``      — ``lr * 0.1^(epoch // lr_step)``
    * ``multistep`` — torch MultiStepLR (reference train.py:80), epoch milestones

    Matching the reference's operation order exactly: the ``min_lr`` floor is
    applied BEFORE the linear warmup ramp (``lr * T / warmup_iters`` for
    ``T < warmup_epochs * steps_per_epoch``), so warmup scales the floored lr.
    """
    n = max(num_epochs * steps_per_epoch, 1)
    warmup_iters = warmup_epochs * steps_per_epoch
    if mode == "step" and not lr_step:
        raise ValueError("mode 'step' requires lr_step > 0")
    if mode == "multistep":
        inner = multistep_lr(base_lr, tuple(m * steps_per_epoch for m in milestones), gamma)

    def schedule(t):
        t = jnp.asarray(t, jnp.float32)
        if mode == "cos":
            lr = 0.5 * base_lr * (1.0 + jnp.cos(jnp.pi * t / n))
        elif mode == "poly":
            lr = base_lr * jnp.maximum(1.0 - t / n, 0.0) ** 0.9
        elif mode == "step":
            epoch = jnp.floor(t / max(steps_per_epoch, 1))
            lr = base_lr * 0.1 ** jnp.floor(epoch / lr_step)
        elif mode == "multistep":
            lr = inner(t)
        else:
            raise ValueError(f"unknown lr scheduler {mode!r}")
        if min_lr is not None:
            lr = jnp.maximum(lr, min_lr)
        if warmup_iters > 0:
            lr = jnp.where(t < warmup_iters, lr * t / warmup_iters, lr)
        return lr

    return schedule


def make_optimizer(
    solver: str = "adam",
    lr: float | optax.Schedule = 1e-3,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Adam(0.9, 0.999) or SGD(momentum) — reference train.py:75-78."""
    if solver == "adam":
        tx = optax.adam(lr, b1=0.9, b2=0.999)
    elif solver == "sgd":
        tx = optax.sgd(lr, momentum=momentum)
    else:
        raise ValueError(f"unknown solver {solver}")
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def make_train_step(
    maxdisp: int,
    mesh: Mesh | None = None,
    donate: bool = True,
    edge_loss_w: float = 0.0,
):
    """Build the jitted train step.

    Returns ``step(state, batch) -> (state, metrics)`` where ``batch`` is a
    dict of NHWC ``left``, ``right`` and ``(B, H, W)`` ``disparity``.
    ``edge_loss_w`` > 0 adds the edge-aware smoothness term (reference
    train.py:107-113 combined loss, edge_detection.py:68-74).
    """

    def train_step(state: TrainState, batch):
        def loss_fn(params):
            disp, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["left"],
                batch["right"],
                train=True,
                mutable=["batch_stats"],
            )
            disp = disp.astype(jnp.float32)
            loss = masked_smooth_l1(disp, batch["disparity"], maxdisp)
            if edge_loss_w:
                loss = loss + edge_loss_w * edge_aware_smoothness_loss(
                    disp, batch["disparity"], maxdisp
                )
            return loss, (updates["batch_stats"], disp)

        (loss, (new_stats, disp)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "epe": epe(disp, batch["disparity"], maxdisp),
            "err3": three_px_error(disp, batch["disparity"], maxdisp),
        }
        state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        train_step,
        in_shardings=(repl, batch_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(maxdisp: int, mesh: Mesh | None = None):
    """Jitted eval step -> (disparity, metrics)."""

    def eval_step(state: TrainState, batch):
        disp = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["left"],
            batch["right"],
            train=False,
        ).astype(jnp.float32)
        metrics = {
            "epe": epe(disp, batch["disparity"], maxdisp),
            "err3": three_px_error(disp, batch["disparity"], maxdisp),
        }
        return disp, metrics

    if mesh is None:
        return jax.jit(eval_step)
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    return jax.jit(eval_step, in_shardings=(repl, batch_sh), out_shardings=(batch_sh, repl))

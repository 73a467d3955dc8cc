"""Training runtime: pjit train/eval steps, Adam + plateau LR schedule,
BN-momentum schedule, parameter freezing.

Semantic rebuild of `models/training.py` (BaseTrainer.train_step: zero_grad
-> loss -> backward -> step), `models/optimizers.py` (Adam betas/eps/wd from
yaml; ReduceLROnPlateau factor 0.1 / patience 20 / threshold 0.01;
BNMomentumScheduler max(0.5*0.5^(epoch//20), 1e-3)), and the freezing
mechanics of `models/network.py:57-79` — re-designed as pure functions over
a flax TrainState jitted across a data-parallel `jax.sharding.Mesh`.

The LR and BN momentum enter the jitted step as traced scalars, so the
host-side plateau logic never triggers recompilation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..parallel.mesh import DATA_AXIS, batch_sharding, make_mesh, replicated


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0):
    """Adam with unit LR; the step scales updates by the traced lr (torch
    Adam semantics: L2 weight decay added to the gradient, not decoupled —
    matching `optimizers.py:85-98` with yaml weight_decay)."""
    chain = [optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)]
    if weight_decay:
        chain.insert(0, optax.add_decayed_weights(weight_decay))
    return optax.chain(*chain)


def make_optimizer_with_specs(base: dict, model_cfg: dict):
    """Per-submodule optimizer overrides (`models/optimizers.py:23-40` +
    `models/network.py:91-101`: a nested `optimizer` key under
    model.<submodule> overrides method/betas/eps/weight_decay for that
    subnet; lr overrides become per-module LR scales applied in the
    train step so the plateau schedule still acts globally, matching
    torch param-group semantics).

    Returns (tx, lr_scale_tree | None)."""
    specs = {
        name: sub["optimizer"]
        for name, sub in (model_cfg or {}).items()
        if isinstance(sub, dict) and "optimizer" in sub
    }
    if not specs:
        return make_optimizer(
            betas=tuple(base.get("betas", (0.9, 0.999))),
            eps=base.get("eps", 1e-8),
            weight_decay=base.get("weight_decay", 0.0),
        ), None

    def chain_for(spec):
        return make_optimizer(
            betas=tuple(spec.get("betas", base.get("betas", (0.9, 0.999)))),
            eps=spec.get("eps", base.get("eps", 1e-8)),
            weight_decay=spec.get(
                "weight_decay", base.get("weight_decay", 0.0)
            ),
        )

    transforms = {"__base__": chain_for(base)}
    for name, spec in specs.items():
        transforms[name] = chain_for(spec)

    def labeler(params):
        return {
            k: jax.tree_util.tree_map(
                lambda _: k if k in specs else "__base__", v
            )
            for k, v in params.items()
        }

    tx = optax.multi_transform(transforms, labeler)

    def scale_tree(params):
        base_lr = base.get("lr", 1e-3)
        return {
            k: jax.tree_util.tree_map(
                lambda _: specs.get(k, {}).get("lr", base_lr) / base_lr, v
            )
            for k, v in params.items()
        }

    return tx, scale_tree


def _freeze_mask(params, frozen: tuple):
    return {
        k: jax.tree_util.tree_map(lambda _: k not in frozen, v)
        for k, v in params.items()
    }


def make_train_step(
    model,
    dataset_config,
    tx,
    completion_weight: float = 1.0,
    frozen: tuple = (),
    donate: bool = True,
    lr_scale_tree=None,
    jit: bool = True,
    mesh=None,
) -> Callable:
    """Returns jitted (state, batch, rng, lr, bn_momentum) ->
    (state, metrics dict of scalars). jit=False returns the raw traceable
    step (for callers that loop it inside their own program, e.g. the
    device-time train bench)."""

    def loss_fn(params, batch_stats, batch, rng, bn_momentum):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch,
            train=True,
            bn_momentum=bn_momentum,
            rng=rng,
            mutable=["batch_stats"],
        )
        losses = model.apply(
            {"params": params, "batch_stats": batch_stats},
            out,
            batch,
            dataset_config,
            completion_weight,
            method=type(model).loss,
        )
        return losses["total"], (losses, updates["batch_stats"])

    def step(state: TrainState, batch, rng, lr, bn_momentum):
        grads, (losses, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng, bn_momentum
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        mask = _freeze_mask(state.params, frozen)
        if lr_scale_tree is not None:
            scales = lr_scale_tree(state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u, m, s: p + jnp.where(m, -lr * s * u, 0.0),
                state.params, updates, mask, scales,
            )
        else:
            new_params = jax.tree_util.tree_map(
                lambda p, u, m: p + jnp.where(m, -lr * u, 0.0),
                state.params, updates, mask,
            )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, losses

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else (),
                   **_loop_shardings(mesh, n_scalar_args=3))


def _loop_shardings(mesh, n_scalar_args: int) -> dict:
    """`in_shardings` for a (state, batch, *scalars) step when a mesh is
    given: state replicated, batch leaves sharded over the data axis,
    scalars replicated. Declaring placements on the jit lets the epoch
    loop pass HOST numpy batches straight in — the one transfer route
    that does not leak on this runtime (see `parallel.mesh.shard_batch`,
    which must NOT be called per iteration)."""
    if mesh is None:
        return {}
    from ..parallel.mesh import batch_sharding, replicated

    rep = replicated(mesh)
    return {"in_shardings": (rep, batch_sharding(mesh))
            + (rep,) * n_scalar_args}


def make_eval_step(model, dataset_config, completion_weight: float = 1.0,
                   mesh=None):
    def step(state: TrainState, batch, rng):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            train=False,
            rng=rng,
        )
        losses = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            out,
            batch,
            dataset_config,
            completion_weight,
            method=type(model).loss,
        )
        return losses

    return jax.jit(step, **_loop_shardings(mesh, n_scalar_args=1))


def init_state(model, tx, sample_batch, seed: int = 0) -> TrainState:
    # jit the init: flax's op-by-op init takes minutes on a single-core
    # CPU host (measured 364s for the full ISCNet at dryrun shapes),
    # while the jitted program compiles once, persists in the compile
    # cache, and runs in seconds
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(seed),
        jax.tree_util.tree_map(jnp.asarray, sample_batch),
        rng=jax.random.PRNGKey(seed + 1),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.int32(0),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


@dataclasses.dataclass
class PlateauScheduler:
    """Host-side ReduceLROnPlateau (`optimizers.py:42-54` config: mode=min,
    factor, patience, threshold [rel mode])."""

    lr: float
    factor: float = 0.1
    patience: int = 20
    threshold: float = 0.01
    best: float = float("inf")
    num_bad: int = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr *= self.factor
                self.num_bad = 0
        return self.lr

"""Experiment loops: epoch-driven training with plateau LR, BN-momentum
schedule, and best/last checkpointing.

Semantic rebuild of `train.py:10-41` + `train_epoch.py:9-93`: per epoch a
train pass and a val pass (LossRecorder averages, `eval_loss_parser` =
mean of 'total'), then ReduceLROnPlateau step, BN momentum decay, save
'last' every epoch and 'best' on improved val loss. The step itself is a
single pjit-compiled program over the data mesh; lr and bn_momentum enter
as traced scalars so schedule changes never recompile.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import make_mesh, replicated
from ..utils.logging import LogBoard, LossRecorder
from .checkpoint import CheckpointIO
from .trainer import (
    PlateauScheduler,
    init_state,
    make_eval_step,
    make_train_step,
)


def pick_mesh(batch_size: int):
    """Data mesh over as many devices as evenly divide the batch."""
    devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(devices[:n])


class Trainer:
    """Owns the jitted steps + schedules for one training stage."""

    def __init__(self, cfg, model, dataset_config, log=print):
        self.cfg = cfg
        self.model = model
        self.dataset_config = dataset_config
        self.log = log
        opt = cfg.config["optimizer"]
        from .trainer import make_optimizer_with_specs

        self.tx, lr_scale_tree = make_optimizer_with_specs(
            opt, cfg.config.get("model", {})
        )
        sch = cfg.config["scheduler"]
        self.plateau = PlateauScheduler(
            lr=opt["lr"], factor=sch.get("factor", 0.1),
            patience=sch.get("patience", 20),
            threshold=sch.get("threshold", 0.01),
        )
        frozen = tuple(cfg.config["train"].get("freeze", []))
        weight = cfg.config["model"].get("completion", {}).get("weight", 1.0)
        self.mesh = pick_mesh(cfg.config["train"]["batch_size"])
        # The mesh is passed so the steps declare `in_shardings` and the
        # epoch loop can feed HOST numpy batches straight in — the one
        # transfer route that does not retain host memory per call on
        # this runtime (see `parallel.mesh.shard_batch` docstring).
        self.train_step = make_train_step(
            model, dataset_config, self.tx,
            completion_weight=weight, frozen=frozen,
            lr_scale_tree=lr_scale_tree, mesh=self.mesh,
        )
        self.eval_step = make_eval_step(
            model, dataset_config, completion_weight=weight, mesh=self.mesh,
        )
        self.state = None
        self._vis_fn = None

    def initialize(self, sample_batch, seed: int = 0):
        self.state = init_state(self.model, self.tx, sample_batch, seed)
        self.state = jax.device_put(self.state, replicated(self.mesh))
        n_params = sum(
            int(np.prod(np.shape(p)))
            for p in jax.tree_util.tree_leaves(self.state.params)
        )
        self.log(f"model initialized: {n_params / 1e6:.2f} M params, "
                 f"mesh {self.mesh.shape}")

    def visualize_step(self, batch, epoch: int, phase: str, it: int):
        """Dump predicted/GT 16^3 voxel snapshots
        (`models/iscnet/training.py:25-52`) — separate jitted forward with
        shape export enabled."""
        if self.model.phase != "completion" or "object_voxels" not in batch:
            return
        from ..utils.visualization import dump_training_snapshot

        if self._vis_fn is None:
            def fn(state, device_batch):
                out = self.model.apply(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    {**device_batch, "export_shape": True},
                    train=False, rng=jax.random.PRNGKey(0),
                )
                end_points, losses, shape_example, pids = out
                return shape_example, pids

            # same in_shardings contract as the train/eval steps: only
            # placement-declared jits take host batches without the
            # per-call host-memory retention this runtime exhibits
            # (`parallel/mesh.py` docstring / the round-4 OOM bisect)
            from .trainer import _loop_shardings

            self._vis_fn = jax.jit(
                fn, **_loop_shardings(self.mesh, n_scalar_args=0)
            )
        # host numpy straight into the sharding-declared jit
        device_batch = {
            k: v for k, v in batch.items()
            if not isinstance(v, list) and k not in
            ("object_voxels", "shapenet_catids", "shapenet_ids")
        }
        voxels, pids = self._vis_fn(self.state, device_batch)
        if voxels is None:
            return
        import os

        vis_path = os.path.join(
            self.cfg.save_path or "out", self.cfg.config["log"]["vis_path"]
        )
        dump_training_snapshot(
            vis_path, epoch, phase, it,
            np.asarray(voxels), np.asarray(pids),
            np.asarray(batch["object_voxels"]),
            self.cfg.config["data"]["completion_limit_in_train"],
        )

    def run_epoch(self, loader, epoch: int, phase: str, rng_key,
                  board: LogBoard | None = None, print_step: int = 10):
        recorder = LossRecorder(loader.batch_size)
        bn_momentum = jnp.float32(self.cfg.bn_momentum(epoch))
        lr = jnp.float32(self.plateau.lr)
        vis_step = self.cfg.config["log"].get("vis_step", 0)
        t0 = time.time()
        for it, batch in enumerate(loader):
            if vis_step and (it + 1) % vis_step == 0:
                self.visualize_step(batch, epoch, phase, it + 1)
            # Host numpy batch goes straight into the jitted step; the
            # step's `in_shardings` performs the (leak-free) transfer.
            batch = {
                k: v for k, v in batch.items()
                if not isinstance(v, list) and k not in
                ("object_voxels", "shapenet_catids", "shapenet_ids")
            }
            step_key = jax.random.fold_in(rng_key, it)
            if phase == "train":
                self.state, losses = self.train_step(
                    self.state, batch, step_key, lr, bn_momentum
                )
            else:
                losses = self.eval_step(self.state, batch, step_key)
            losses = {k: float(v) for k, v in losses.items()}
            recorder.update_loss(losses)
            if (it + 1) % print_step == 0:
                msg = ", ".join(
                    f"{k}: {m.avg:.4f}"
                    for k, m in sorted(recorder.loss_recorder.items())
                )
                self.log(
                    f"{phase} epoch {epoch} iter {it + 1}/{len(loader)}: {msg}"
                )
                if board is not None:
                    board.add_scalars(
                        phase, recorder.synthesize(),
                        epoch * len(loader) + it,
                    )
        self.log(
            f"{phase} epoch {epoch} done in {time.time() - t0:.1f}s"
        )
        return recorder.synthesize()


def train(cfg, model, dataset_config, train_loader, val_loader,
          checkpoint: CheckpointIO | None = None, board: LogBoard | None = None,
          start_epoch: int = 0, log=print):
    """Full training driver (`train_epoch.py:52-93`). Returns trainer."""
    trainer = Trainer(cfg, model, dataset_config, log=log)
    sample = next(iter(train_loader))
    sample = {
        k: v for k, v in sample.items()
        if not isinstance(v, list) and k not in
        ("object_voxels", "shapenet_catids", "shapenet_ids")
    }
    trainer.initialize(sample, seed=cfg.config.get("seed", 10))

    min_loss = np.inf
    if checkpoint is not None:
        resumed = False
        if cfg.config.get("resume"):
            state, meta = checkpoint.resume(trainer.state)
            if state is not None:
                trainer.state = jax.device_put(
                    jax.tree_util.tree_map(jnp.asarray, state),
                    replicated(trainer.mesh),
                )
                start_epoch = int(meta.get("epoch", 0)) + 1
                min_loss = float(meta.get("min_loss", np.inf))
                trainer.plateau.lr = float(meta.get("lr", trainer.plateau.lr))
                trainer.plateau.best = min_loss
                resumed = True
        # resume falls through to finetune when no prior checkpoint exists
        # (reference `parse_checkpoint` boot-mode precedence,
        # `net_utils/utils.py:86-100`)
        if not resumed and cfg.config.get("finetune"):
            for w in cfg.config.get("weight", []):
                trainer.state = checkpoint.finetune(trainer.state, w)

    epochs = cfg.config["train"]["epochs"]
    key = jax.random.PRNGKey(cfg.config.get("seed", 10))
    for epoch in range(start_epoch, epochs):
        ek = jax.random.fold_in(key, epoch)
        train_loader.set_epoch(epoch)
        trainer.run_epoch(
            train_loader, epoch, "train", jax.random.fold_in(ek, 0),
            board, cfg.config["log"].get("print_step", 10),
        )
        val_losses = trainer.run_epoch(
            val_loader, epoch, "val", jax.random.fold_in(ek, 1),
            board, cfg.config["log"].get("print_step", 10),
        )
        eval_loss = val_losses.get("total", np.inf)
        prev_lr = trainer.plateau.lr
        trainer.plateau.step(eval_loss)
        if trainer.plateau.lr != prev_lr:
            log(f"epoch {epoch}: plateau patience exceeded, "
                f"LR {prev_lr:.2e} -> {trainer.plateau.lr:.2e}")
        if board is not None:
            # per-epoch schedule evidence (`models/optimizers.py:42-60`)
            board.add_scalars("schedule", {
                "lr": trainer.plateau.lr,
                "bn_momentum": float(cfg.bn_momentum(epoch)),
                "val_total": float(eval_loss),
                "epoch": epoch,
            }, epoch)
        if checkpoint is not None:
            # Checkpoint cadence (`log.save_step`, default 1 = the
            # reference's save-last-every-epoch, `train_epoch.py:78-93`).
            # On a tunneled device the save cost is dominated by the
            # device->host state download (~160 MB for the completion
            # stage), so: one `jax.device_get` per save event, model_best
            # written on improvement with model_last refreshed by a local
            # dir copy, and pure model_last saves only every save_step
            # epochs (always on the final epoch, which downstream stages
            # finetune from).
            save_step = int(cfg.config["log"].get("save_step", 1))
            improved = eval_loss < min_loss
            last_due = ((epoch + 1) % save_step == 0) or (epoch == epochs - 1)
            if improved or last_due:
                host_state = jax.device_get(trainer.state)
                meta = {"epoch": epoch,
                        "min_loss": float(min(min_loss, eval_loss)),
                        "lr": trainer.plateau.lr}
                if improved:
                    min_loss = eval_loss
                    checkpoint.save_best(host_state, meta)
                    log(f"epoch {epoch}: new best val loss {eval_loss:.4f}")
                    checkpoint.copy("model_best", "model_last")
                else:
                    checkpoint.save_last(host_state, meta)
    return trainer

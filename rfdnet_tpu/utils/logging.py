"""Run utilities: meters, loss recording, tensorboard logging, seeding.

Semantic rebuild of `net_utils/utils.py:199-335` (initiate_environment,
AverageMeter, LossRecorder, LogBoard) — jax PRNG replaces torch seeding,
and the TensorBoard writer is optional (falls back to a JSONL scalar log
so headless runs keep observability).
"""

from __future__ import annotations

import json
import os
import random
import time

import numpy as np


def initiate_environment(seed: int) -> None:
    """Seed host RNGs (`net_utils/utils.py:199-210`); device-side
    randomness is jax-PRNG-key-threaded and needs no global seed.
    Also points jax's persistent compile cache at the repo-level
    .jax_cache dir (via config.update — env vars set from Python do not
    bind, this image's sitecustomize imports jax at interpreter
    startup)."""
    random.seed(seed)
    np.random.seed(seed)
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.join(
                    os.path.dirname(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__)))), ".jax_cache",
                ),
            ),
        )
    except Exception:
        pass


class AverageMeter:
    """Running average over appended values or lists."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        if isinstance(val, (list, tuple)):
            for v in val:
                self.update(v)
            return
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class LossRecorder:
    """Per-key AverageMeter dict (`net_utils/utils.py:297-324`)."""

    def __init__(self, batch_size: int = 1):
        self.batch_size = batch_size
        self.loss_recorder: dict[str, AverageMeter] = {}

    def update_loss(self, loss_dict: dict):
        for key, value in loss_dict.items():
            if key not in self.loss_recorder:
                self.loss_recorder[key] = AverageMeter()
            self.loss_recorder[key].update(float(value), self.batch_size)

    def synthesize(self) -> dict:
        return {k: m.avg for k, m in self.loss_recorder.items()}


class LogBoard:
    """Scalar logger: TensorBoard SummaryWriter when available, always a
    JSONL mirror (`net_utils/utils.py:326-335`)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass

    def add_scalars(self, phase: str, scalars: dict, step: int):
        rec = {"phase": phase, "step": step, "time": time.time(), **{
            k: float(v) for k, v in scalars.items()
        }}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._writer is not None:
            for k, v in scalars.items():
                self._writer.add_scalar(f"{phase}/{k}", float(v), step)

    def close(self):
        self._jsonl.close()
        if self._writer is not None:
            self._writer.close()


def clean_log_dirs(root: str, keep_marker: str = "model_last") -> list[str]:
    """Delete run dirs without a saved checkpoint (`utils/clean_log.py`).
    Returns the removed paths."""
    import shutil

    removed = []
    if not os.path.isdir(root):
        return removed
    for run in os.listdir(root):
        p = os.path.join(root, run)
        if not os.path.isdir(p):
            continue
        if not any(
            m in os.listdir(p) for m in (keep_marker, "model_best")
        ):
            shutil.rmtree(p)
            removed.append(p)
    return removed

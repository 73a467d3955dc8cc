"""Checkpoint IO — orbax-backed, with the reference's boot semantics.

Semantic rebuild of `net_utils/utils.py:18-197` CheckpointIO:
- state = {params, batch_stats, opt_state, step, epoch, min_loss, lr} in a
  single directory ("model_last" / "model_best" per run dir),
- ``resume``: scan sibling timestamped run dirs newest-first for a
  model_last checkpoint (`utils.py:119-137`),
- ``finetune``: network weights only, partial module-by-module
  intersect-and-report load (`models/network.py:81-89` strips the
  DataParallel prefix and loads only intersecting keys, logging which
  subnets were missed) — here: intersect the saved params/batch_stats trees
  with the model's by path+shape, report missing top-level submodules.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _tree_paths(tree) -> dict:
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict) or hasattr(node, "items"):
            for k, v in node.items():
                walk(prefix + (k,), v)
        else:
            flat[prefix] = node

    walk((), tree)
    return flat


def _unflatten(flat: dict):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def partial_load(target_tree, source_tree, log=print):
    """Load intersecting (path, shape)-matching leaves of source into a copy
    of target; report missed top-level submodules (the reference's
    "'{...}' subnet missed." message)."""
    tgt = _tree_paths(target_tree)
    src = _tree_paths(source_tree)
    loaded, missed_roots, all_roots = {}, set(), set()
    for path, leaf in tgt.items():
        all_roots.add(path[0])
        s = src.get(path)
        if s is not None and np.shape(s) == np.shape(leaf):
            loaded[path] = s
        else:
            loaded[path] = leaf
            missed_roots.add(path[0])
    if log:
        log(f"{missed_roots or set()} subnet missed.")
        log(f"{sorted(all_roots - missed_roots)} subnet weights loaded.")
    return _unflatten(loaded)


class CheckpointIO:
    def __init__(self, save_path: str, log=print):
        self.save_path = os.path.abspath(save_path)
        self.log = log
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.save_path, name)

    def save(self, name: str, state, meta: dict | None = None):
        payload = {
            "state": jax.tree_util.tree_map(np.asarray, state),
            "meta": dict(meta or {}),
        }
        path = self._path(name)
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()

    def load(self, path: str, template=None):
        """Restore {state, meta}. With `template` (a TrainState), orbax
        restores into the live pytree structure (optax NamedTuples etc.);
        without it the result is raw nested dicts/lists — fine for
        params/batch_stats partial loads, NOT for resuming an optimizer."""
        # orbax/tensorstore requires absolute paths
        path = os.path.abspath(path)
        raw = self._ckptr.restore(path)
        if template is None:
            return raw["state"], raw.get("meta", {})
        # re-restore with the live pytree as target; meta's template is
        # the raw dict itself (its keys vary across save sites)
        tmpl = {
            "state": jax.tree_util.tree_map(np.asarray, template),
            "meta": raw.get("meta", {}),
        }
        restored = self._ckptr.restore(path, tmpl)
        return restored["state"], restored.get("meta", {})

    def save_last(self, state, meta=None):
        self.save("model_last", state, meta)

    def save_best(self, state, meta=None):
        self.save("model_best", state, meta)

    def copy(self, src_name: str, dst_name: str):
        """Duplicate one saved checkpoint dir into another name via a local
        filesystem copy (atomic rename). When the device is reached over a
        network tunnel the dominant checkpoint cost is the device->host
        state download, so "best improved AND it's a save_last epoch" should
        download once and copy, not download twice."""
        import shutil

        src, dst = self._path(src_name), self._path(dst_name)
        tmp = dst + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(src, tmp)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.replace(tmp, dst)

    def resume(self, state_template):
        """Scan sibling run dirs (newest first) for a model_last checkpoint;
        return (state, meta) or (None, None)."""
        parent = os.path.dirname(self.save_path)
        if not os.path.isdir(parent):
            return None, None
        candidates = sorted(os.listdir(parent), reverse=True)
        for run in candidates:
            p = os.path.join(parent, run, "model_last")
            if os.path.isdir(p):
                try:
                    state, meta = self.load(p, template=state_template)
                    self.log(f"resumed from {p}")
                    return state, meta
                except Exception as e:  # corrupted run dir: keep scanning
                    self.log(f"skipping {p}: {e}")
        return None, None

    def finetune(self, state, weight_path: str):
        """Load network weights only (params + batch_stats) from
        `weight_path`, partial-intersected; optimizer state untouched
        (`net_utils/utils.py:139-151` load selective modules)."""
        if not os.path.isdir(weight_path):
            self.log(f"Warning: {weight_path} not found, training from scratch.")
            return state
        src_state, _ = self.load(weight_path)
        new_params = partial_load(state.params, src_state["params"], self.log)
        new_stats = partial_load(
            state.batch_stats, src_state.get("batch_stats", {}), log=None
        )
        return state.replace(params=new_params, batch_stats=new_stats)

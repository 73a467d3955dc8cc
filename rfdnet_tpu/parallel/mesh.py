"""Device mesh + sharding helpers.

The reference's only parallelism is single-process `nn.DataParallel`
(`net_utils/utils.py:238`) — replicate params, scatter the batch. The
TPU-native equivalent is a 1-D ICI data mesh: batch sharded over the
``data`` axis, parameters replicated, gradient all-reduce inserted by the
pjit partitioner, and BatchNorm statistics synchronized with ``pmean``
over the same axis (sync-BN — an improvement over DataParallel's
per-replica stats, documented in SURVEY §2.3).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, batch-dim sharded.

    ONE-SHOT placement only — do NOT call this per training/eval
    iteration. On this runtime (jax 0.9.0, CPU and TPU backends) every
    standalone host->device transfer (`jax.device_put`, `jnp.asarray`,
    identity-jit) permanently retains ~the transferred bytes (invisible
    to `jax.live_arrays()`, immune to `gc.collect()`): measured 45
    MB/epoch at test scale and ~1.6 GB/epoch at protocol scale (8 x 80k
    points), enough to OOM-kill every multi-hour training run. The one
    leak-free route (bisected empirically, tools/leakcheck history in
    the round-4 commit) is passing HOST numpy arrays directly as
    arguments to a jitted computation with `in_shardings` declaring the
    batch placement — see `make_train_step(mesh=...)` /
    `make_eval_step(mesh=...)`, which the epoch loop uses.
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )

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
    """Place a host batch dict onto the mesh, batch-dim sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )

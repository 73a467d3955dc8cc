"""Device-time measurement that survives slow host links.

The dev environment reaches the TPU through a tunnel with ~33 ms round-trip
latency and ~25 MB/s device->host bandwidth, so `block_until_ready` /
host-transfer timing wildly misstates kernel cost. ``device_time`` runs the
op ``iters`` times inside ONE jit (chained through a data dependency so XLA
cannot DCE or hoist it), returns a scalar, and subtracts the measured
null-program overhead.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _scalarize(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    acc = jnp.float32(0)
    for leaf in leaves:
        acc = acc + jnp.sum(leaf.ravel()[:1].astype(jnp.float32))
    return acc


def device_time(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 1,
    perturb_arg: int = 0,
) -> float:
    """Average seconds per call of ``fn(*args)`` measured on-device.

    ``fn``'s first (float) argument is perturbed by a loop-carried epsilon
    each iteration so the compiler cannot fold the loop.
    """

    @jax.jit
    def run(*a):
        def body(i, carry):
            eps, acc = carry
            a2 = list(a)
            a2[perturb_arg] = a2[perturb_arg] + eps
            out = fn(*a2)
            s = _scalarize(out)
            return (s * 0e-38, acc + s)

        _, acc = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), jnp.float32(0)))
        return acc

    @jax.jit
    def null(*a):
        return _scalarize(a[perturb_arg])

    np.asarray(run(*args))  # compile + warmup
    for _ in range(max(warmup - 1, 0)):
        np.asarray(run(*args))
    np.asarray(null(*args))

    t0 = time.perf_counter()
    np.asarray(run(*args))
    t_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(null(*args))
    t_null = time.perf_counter() - t0
    return max(t_run - t_null, 1e-9) / iters

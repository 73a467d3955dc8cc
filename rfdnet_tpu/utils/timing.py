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
    """Full-output reduction: a first-element probe is NOT safe — ops with
    a constant leading output (e.g. FPS always selects index 0 first) get
    entirely dead-code-eliminated through it."""
    leaves = jax.tree_util.tree_leaves(tree)
    acc = jnp.float32(0)
    for leaf in leaves:
        acc = acc + jnp.sum(leaf.astype(jnp.float32))
    return acc


def device_time(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 1,
    perturb_arg: int = 0,
) -> float:
    """Average seconds per call of ``fn(*args)`` measured on-device.

    ``fn``'s first (float) argument is perturbed by a loop-carried,
    data-dependent epsilon (~1e-38 x output) each iteration so the
    compiler can neither fold nor hoist the op out of the loop.
    """

    @jax.jit
    def run(*a):
        def body(i, carry):
            eps, acc = carry
            a2 = list(a)
            a2[perturb_arg] = a2[perturb_arg] + eps
            out = fn(*a2)
            s = _scalarize(out)
            return (s * 1e-38, acc + s)

        _, acc = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), jnp.float32(0)))
        return acc

    @jax.jit
    def null(*a):
        return _scalarize(a[perturb_arg])

    np.asarray(run(*args))  # compile + warmup
    for _ in range(max(warmup - 1, 0)):
        np.asarray(run(*args))
    np.asarray(null(*args))

    # The tunnel adds ~33 ms jittery round-trip per dispatch; take the
    # best of several trials of both programs so the subtraction is
    # between like-minimum host overheads.
    def best_of(f, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t_run = best_of(run)
    t_null = best_of(null)
    return max(t_run - t_null, 1e-9) / iters

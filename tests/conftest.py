"""Test config: force an 8-device virtual CPU mesh so sharding tests run
anywhere (the driver validates real multi-chip separately via
__graft_entry__.dryrun_multichip)."""

import os

# Hard override: the ambient environment may point JAX at a remote TPU
# tunnel (a sitecustomize registers an 'axon' PJRT plugin and the
# JAX_PLATFORMS env var alone does NOT win against it). Unit tests always
# run on the virtual CPU mesh, so force the platform through jax.config,
# which takes precedence.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: the suite jit-compiles dozens of programs
# (train/test steps, sharded variants); on a small-core host repeat runs
# are dominated by recompiles without this.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# config.update, not the env var: this image's sitecustomize imports jax
# at interpreter startup (to register the axon PJRT plugin), so env vars
# set from Python never bind to jax's config defaults
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)

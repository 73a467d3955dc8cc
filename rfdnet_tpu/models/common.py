"""Common NN building blocks: torch-parity initializers, a BatchNorm with
runtime-adjustable momentum (the reference schedules BN momentum per epoch via
`BNMomentumScheduler`, `pointnet2_ops/pytorch_utils.py:15-43`), and shared
MLPs in channels-last layout.

Layout convention: features live on the LAST axis everywhere, so 1x1
"convolutions" (the reference's Conv1d/Conv2d shared MLPs) are plain Dense
layers — large batched matmuls that XLA tiles straight onto the MXU.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch's default Linear/Conv init: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Dense(nn.Module):
    """nn.Dense with torch-default initialization (weight AND bias).

    `compute_dtype` casts the matmul operands (params stay f32, the
    accumulator and output are f32 via preferred_element_type) — the MXU
    runs bf16 passes ~4x faster than f32 for roofline-bound layers."""

    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer | None = None
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kinit = self.kernel_init or torch_kernel_init
        kernel = self.param("kernel", kinit, (in_features, self.features))
        if self.compute_dtype is not None:
            # f32 accumulate, outputs stored back in the compute dtype so
            # bf16 activation chains never round-trip f32 through HBM
            y = jnp.dot(
                x.astype(self.compute_dtype),
                kernel.astype(self.compute_dtype),
                preferred_element_type=jnp.float32,
            )
            if self.use_bias:
                bias = self.param(
                    "bias", torch_bias_init(in_features), (self.features,)
                )
                y = y + bias
            return y.astype(self.compute_dtype)
        y = jnp.dot(x, kernel)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_features), (self.features,))
            y = y + bias
        return y


class BatchNorm(nn.Module):
    """Channels-last batch normalization with torch semantics.

    - normalizes per-channel over ALL leading axes (matches torch
      BatchNorm1d/2d on (B, C, *) with our channels-last layout),
    - running stats use torch's convention
      ``new = (1 - momentum) * old + momentum * batch`` with *unbiased*
      batch variance for the running update and biased for normalization,
    - ``momentum`` may be passed per-call (a traced scalar), enabling the
      reference's epoch-scheduled BN momentum without recompilation,
    - optional ``axis_name`` adds a cross-device ``pmean`` so batch stats are
      synchronized over the data-parallel mesh (sync-BN; the reference's
      single-process DataParallel computed per-replica stats — we document
      this as a deliberate improvement).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool, momentum=None):
        features = x.shape[-1]
        in_dtype = x.dtype
        reduce_axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        # stats always accumulate in f32: a bf16 mean over B*N*ns elements
        # (bf16 activation chains, `compute_dtype`) would round to ~3
        # decimal digits and corrupt the running estimates
        x32 = x.astype(jnp.float32) if in_dtype != jnp.float32 else x
        if train:
            mean = jnp.mean(x32, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(x32), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            n = x.size // features
            if self.axis_name is not None:
                n = n * jax.lax.psum(1, self.axis_name)
            m = self.momentum if momentum is None else momentum
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        # bf16 chains stay bf16 through BN/ReLU so activations never
        # round-trip f32 through HBM (the normalization math stayed f32)
        return y.astype(in_dtype)


class SharedMLP(nn.Module):
    """Stack of [Dense -> BN -> ReLU] over the channel axis.

    Equivalent of `pointnet2_modules.py:9-19` build_shared_mlp (Conv2d 1x1,
    bias=False when followed by BN) in channels-last layout.
    """

    features: Sequence[int]
    bn: bool = True
    bn_axis_name: str | None = None
    compute_dtype: str | None = None  # "bfloat16": bf16 MXU operands +
    # bf16 activation chain, f32 accumulate/BN-stats (throughput mode)

    @nn.compact
    def __call__(self, x, train: bool, bn_momentum=None):
        for i, f in enumerate(self.features):
            x = Dense(f, use_bias=not self.bn, name=f"dense{i}",
                      compute_dtype=self.compute_dtype)(x)
            if self.bn:
                x = BatchNorm(axis_name=self.bn_axis_name, name=f"bn{i}")(
                    x, train, bn_momentum
                )
            x = nn.relu(x)
        return x


class MLPHead(nn.Module):
    """Conv1d->BN->ReLU x n followed by a linear output layer (the vote /
    proposal head pattern, `vote_module.py:27-32`, `proposal_module.py:79-83`).
    Torch Conv1d keeps bias=True even before BN — preserved for weight parity.
    """

    hidden: Sequence[int]
    out_features: int
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool, bn_momentum=None):
        for i, f in enumerate(self.hidden):
            x = Dense(f, name=f"dense{i}")(x)
            x = BatchNorm(axis_name=self.bn_axis_name, name=f"bn{i}")(
                x, train, bn_momentum
            )
            x = nn.relu(x)
        return Dense(self.out_features, name="out")(x)


def max_pool_points(x, axis=1, keepdims=False):
    """Max-reduce over the points axis, fenced with an optimization
    barrier. Works around an XLA:TPU fusion bug: when the pooled value is
    concatenated/broadcast back and fed into an MXU dot, the backend sinks
    the bf16 convert above the reduce and emits a bf16 reduce-window whose
    TransformWindow chunking loops forever / CHECK-fails
    (fusion_util.cc:3726, seen on v5e with (4, 256, 256) operands). The
    barrier keeps the reduce in f32 and out of the offending fusion."""
    import jax

    pooled = jnp.max(x, axis=axis, keepdims=keepdims)
    return jax.lax.optimization_barrier(pooled)

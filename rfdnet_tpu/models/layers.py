"""ONet-family building blocks, channels-last.

Semantic rebuilds from `models/iscnet/modules/layers.py`:
ResnetBlockFC (:6-48, zero-init fc_1), CBatchNorm (:196-242, zero-init
gamma/beta convs with ones/zeros bias), CResnetBlockConv1d (:51-107),
ResnetPointnet (:345-394), and from `encoder_latent.py` / `occ_decoder.py`:
Encoder_Latent (:12-73), DecoderCBatchNorm (:71-122).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .common import BatchNorm, Dense, max_pool_points


class ResnetBlockFC(nn.Module):
    """NOTE the residual-path quirk: the reference's ``actvn`` is
    ``nn.ReLU(inplace=True)`` applied directly to ``x``
    (`layers.py:30,40`), so by the time the shortcut/identity path reads
    ``x`` it has been overwritten with ``relu(x)``. The function actually
    computed (and trained) is ``shortcut(relu(x)) + fc_1(relu(fc_0(relu(x))))``
    — replicated here for numerical parity (verified against the torch
    module in tests/test_parity_torch.py)."""

    size_out: int | None = None
    size_h: int | None = None
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        size_in = x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)
        xr = nn.relu(x)
        net = Dense(size_h, name="fc_0",
                    compute_dtype=self.compute_dtype)(xr)
        dx = Dense(size_out, kernel_init=nn.initializers.zeros, name="fc_1",
                   compute_dtype=self.compute_dtype)(
            nn.relu(net)
        )
        if size_in == size_out:
            x_s = xr.astype(dx.dtype)
        else:
            x_s = Dense(size_out, use_bias=False, name="shortcut",
                        compute_dtype=self.compute_dtype)(xr)
        return x_s + dx


class CBatchNorm(nn.Module):
    """Conditional batch norm: per-channel affine (gamma, beta) predicted
    from the conditioning code c; the normalization itself is affine-free
    batch norm. gamma/beta projections start at identity (zero weights,
    ones/zeros bias — `layers.py:220-224`)."""

    f_dim: int
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, c, train: bool, bn_momentum=None):
        """x (B, T, f_dim), c (B, c_dim) -> (B, T, f_dim)."""
        gamma = self.param(
            "gamma_kernel", nn.initializers.zeros, (c.shape[-1], self.f_dim)
        )
        gamma_b = self.param("gamma_bias", nn.initializers.ones, (self.f_dim,))
        beta = self.param(
            "beta_kernel", nn.initializers.zeros, (c.shape[-1], self.f_dim)
        )
        beta_b = self.param("beta_bias", nn.initializers.zeros, (self.f_dim,))
        g = jnp.dot(c, gamma) + gamma_b  # (B, f_dim)
        b = jnp.dot(c, beta) + beta_b

        bn = _AffinelessBatchNorm(axis_name=self.bn_axis_name, name="bn")
        net = bn(x, train, bn_momentum)
        # dtype-preserving: with bf16 activations the affine runs in bf16
        # (params/statistics stay f32) so no f32 intermediates hit HBM
        g = g.astype(net.dtype)
        b = b.astype(net.dtype)
        return g[:, None, :] * net + b[:, None, :]


class _AffinelessBatchNorm(nn.Module):
    axis_name: str | None = None
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool, momentum=None):
        import jax

        features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        if train:
            xf = x.astype(jnp.float32)  # f32 statistics from any input dtype
            mean = jnp.mean(xf, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            n = x.size // features
            if self.axis_name is not None:
                n = n * jax.lax.psum(1, self.axis_name)
            m = 0.1 if momentum is None else momentum
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        # fold to a single multiply-add in the input dtype (bf16-safe)
        scale = jax.lax.rsqrt(var + self.epsilon)
        shift = (-mean * scale).astype(x.dtype)
        return x * scale.astype(x.dtype) + shift


class CResnetBlockConv1d(nn.Module):
    """Conditional-BN resnet block (`layers.py:51-107`, zero-init fc_1)."""

    size_h: int | None = None
    size_out: int | None = None
    bn_axis_name: str | None = None
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x, c, train: bool, bn_momentum=None):
        size_in = x.shape[-1]
        size_h = self.size_h or size_in
        size_out = self.size_out or size_in
        net = nn.relu(
            CBatchNorm(size_in, self.bn_axis_name, name="bn_0")(
                x, c, train, bn_momentum
            )
        )
        net = Dense(size_h, name="fc_0", compute_dtype=self.compute_dtype)(net)
        net = nn.relu(
            CBatchNorm(size_h, self.bn_axis_name, name="bn_1")(
                net, c, train, bn_momentum
            )
        )
        dx = Dense(size_out, kernel_init=nn.initializers.zeros, name="fc_1",
                   compute_dtype=self.compute_dtype)(net)
        if size_in == size_out:
            x_s = x
        else:
            x_s = Dense(size_out, use_bias=False, name="shortcut")(x)
        return x_s + dx


class ResnetPointnet(nn.Module):
    """PointNet encoder with 5 resnet blocks and max-pool-concat
    (`layers.py:345-394`). p (B, T, D) -> c (B, c_dim)."""

    c_dim: int = 512
    hidden_dim: int = 512
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, p):
        def pool_cat(net):
            pooled = max_pool_points(net, axis=1, keepdims=True)
            return jnp.concatenate(
                [net, jnp.broadcast_to(pooled, net.shape)], axis=-1
            )

        if self.compute_dtype is not None:
            p = p.astype(self.compute_dtype)
        net = Dense(2 * self.hidden_dim, name="fc_pos",
                    compute_dtype=self.compute_dtype)(p)
        for i in range(4):
            net = ResnetBlockFC(size_out=self.hidden_dim, name=f"block_{i}",
                                compute_dtype=self.compute_dtype)(net)
            net = pool_cat(net)
        net = ResnetBlockFC(size_out=self.hidden_dim, name="block_4",
                            compute_dtype=self.compute_dtype)(net)
        net = max_pool_points(net, axis=1)
        # conditioning codes are f32 downstream (ONet/CBN inputs)
        return Dense(self.c_dim, name="fc_c")(
            nn.relu(net).astype(jnp.float32)
        )


class DecoderCBatchNorm(nn.Module):
    """Conditional-batch-norm implicit decoder (`occ_decoder.py:71-122`):
    fc_p Conv1d(3->hidden), optional fc_z, 5 CResnet blocks conditioned on
    c, CBN -> ReLU -> Conv1d(hidden->1) logits.

    `compute_dtype="bfloat16"` runs the block matmuls in bf16 (f32
    accumulate + f32 normalization/params) — the decode stage is MXU
    roofline-bound at generation time; opt-in via the
    `data.decoder_bf16` config."""

    hidden_size: int = 256
    n_blocks: int = 5
    z_dim: int = 32
    bn_axis_name: str | None = None
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, p, z, c, train: bool, bn_momentum=None):
        """p (B, T, 3), z (B, z_dim) or None, c (B, c_dim) -> logits (B, T)."""
        dt = self.compute_dtype
        net = Dense(self.hidden_size, name="fc_p")(p)
        if self.z_dim != 0 and z is not None:
            net = net + Dense(self.hidden_size, name="fc_z")(z)[:, None, :]
        if dt is not None:
            # activations stay in `dt` through the whole block stack (the
            # stage is HBM-bound; bf16 halves activation traffic). Params,
            # BN statistics, and the dot accumulators remain f32.
            net = net.astype(dt)
        for i in range(self.n_blocks):
            net = CResnetBlockConv1d(
                bn_axis_name=self.bn_axis_name, name=f"block{i}",
                compute_dtype=dt,
            )(net, c, train, bn_momentum)
        if dt is not None:
            net = net.astype(jnp.float32)
        net = nn.relu(
            CBatchNorm(self.hidden_size, self.bn_axis_name, name="bn")(
                net, c, train, bn_momentum
            )
        )
        out = Dense(1, name="fc_out")(net)
        return out[..., 0]


class SelfAttention(nn.Module):
    """Dot-product self-attention over a point set (`layers.py:395-421` —
    defined in the reference but commented out of every call site; kept
    for API parity). x (B, T, C) -> (B, T, C) with gamma-gated residual
    (gamma zero-initialized, so the block starts as identity)."""

    reduce: int = 8

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        q = Dense(C // self.reduce, name="query")(x)
        k = Dense(C // self.reduce, name="key")(x)
        v = Dense(C, name="value")(x)
        attn = jnp.einsum("btd,bsd->bts", q, k)
        attn = jnp.exp(attn - jnp.max(attn, axis=-1, keepdims=True))
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        out = jnp.einsum("bts,bsc->btc", attn, v)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma * out + x


class EncoderLatent(nn.Module):
    """VAE posterior encoder (`encoder_latent.py:12-73`): pools
    [points, occ, c] through 128-d MLPs with max-pool concat; outputs
    (mean, logstd) of q(z|...)."""

    z_dim: int = 32

    @nn.compact
    def __call__(self, p, occ, c):
        """p (B, T, 3), occ (B, T), c (B, c_dim) -> ((B, z), (B, z))."""
        net = Dense(128, name="fc_0")(occ[..., None])
        net = net + Dense(128, name="fc_pos")(p)
        if c is not None and c.shape[-1] != 0:
            net = net + Dense(128, name="fc_c")(c)[:, None, :]

        def pool_cat(net):
            pooled = max_pool_points(net, axis=1, keepdims=True)
            return jnp.concatenate(
                [net, jnp.broadcast_to(pooled, net.shape)], axis=-1
            )

        net = Dense(128, name="fc_1")(nn.relu(net))
        net = pool_cat(net)
        net = Dense(128, name="fc_2")(nn.relu(net))
        net = pool_cat(net)
        net = Dense(128, name="fc_3")(nn.relu(net))
        net = max_pool_points(net, axis=1)
        mean = Dense(self.z_dim, name="fc_mean")(net)
        logstd = Dense(self.z_dim, name="fc_logstd")(net)
        return mean, logstd

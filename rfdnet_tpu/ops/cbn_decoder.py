"""Fused conditional-batch-norm occupancy decoder — the generation-time
hot op as ONE Pallas kernel.

The reference evaluates `DecoderCBatchNorm` (`occ_decoder.py:110-122`)
layer by layer: 5 CResnet blocks, each Conv1d(256->256) x2 plus two
conditional batch norms, over up to 64 proposals x 33^3 grid points. As
separate XLA ops every layer round-trips its (Nb, T, 256) activation
tensor through HBM — ~25 GB of traffic per protocol scene, which makes
the unfused decode bandwidth-bound (measured 51 ms f32 / 27.5 ms bf16 on
v5e, BASELINE.md).

This kernel exploits two inference-time facts:

1. Eval-mode CBN is an affine map with per-proposal constants: with
   running statistics (mu, var) and the conditioning code c fixed,
     CBN(x) = A ⊙ x + B,  A = g(c)/sqrt(var+eps),
                          B = b(c) - g(c)*mu/sqrt(var+eps)
   so all 11 CBNs fold into (Nb, 11, 256) scale/shift tables computed
   once per batch (`fold_cbn_constants`).
2. The whole block chain then needs NO intermediate HBM tensors: a
   (TILE_T, 256) activation tile stays in VMEM through all 10 matmuls
   (w0/w1 of 5 blocks) + the output projection; HBM traffic drops to
   one read of the fc_p output and one write of the logits.

Grid: (Nb, T/TILE_T); the (5, 256, 256) weight stacks are grid-constant
blocks fetched into VMEM once. Matmuls run with bf16 operands and f32
accumulation (`preferred_element_type`) — identical to what the MXU does
for f32 operands at DEFAULT precision, and to the opt-in
`decoder_dtype="bfloat16"` chain's numerics; scales/shifts/residual adds
stay f32 on the VPU.

`make_fused_decoder(model, variables)` returns a drop-in for the jitted
`ISCNet.decode_occupancy` partial used by Generator3D / the fused
generate path (prior-mean z, `occupancy_net.py:133-138` semantics).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

H = 256        # decoder hidden size (`occ_decoder.py:110` hidden_size)
N_BLOCKS = 5
N_CBN = 2 * N_BLOCKS + 1
_CBN_PAD = 16  # sublane-aligned row count for the (11, 256) tables
TILE_P = 8     # proposals per grid step (the logits block's sublane dim
               # must be 8-divisible — Mosaic block-shape rule)
TILE_T = 256
_EPS = 1e-5    # _AffinelessBatchNorm epsilon


def fold_cbn_constants(dec_params, dec_stats, c):
    """Fold every CBN's (conditional affine ∘ running-stat normalize)
    into per-proposal scale/shift tables.

    c (Nb, c_dim) -> (scales, shifts), each (Nb, _CBN_PAD, H) f32 with
    rows [block0.bn_0, block0.bn_1, ..., block4.bn_1, final bn, pad...].
    """
    rows_s, rows_b = [], []

    def fold(p, s):
        g = c @ p["gamma_kernel"] + p["gamma_bias"]
        b = c @ p["beta_kernel"] + p["beta_bias"]
        inv = jax.lax.rsqrt(s["var"] + _EPS)
        return g * inv, b - g * s["mean"] * inv

    for i in range(N_BLOCKS):
        blk = dec_params[f"block{i}"]
        st = dec_stats[f"block{i}"]
        for bn in ("bn_0", "bn_1"):
            a, b = fold(blk[bn], st[bn]["bn"])
            rows_s.append(a)
            rows_b.append(b)
    a, b = fold(dec_params["bn"], dec_stats["bn"]["bn"])
    rows_s.append(a)
    rows_b.append(b)
    scales = jnp.stack(rows_s, axis=1)  # (Nb, 11, H)
    shifts = jnp.stack(rows_b, axis=1)
    pad = ((0, 0), (0, _CBN_PAD - N_CBN), (0, 0))
    return jnp.pad(scales, pad), jnp.pad(shifts, pad)


def _make_kernel(mxu_dtype):
    M = TILE_P * TILE_T

    def matmul(t, w, b):
        # the weights are SHARED across proposals (only the CBN affines
        # are per-proposal), so the batch dim folds into M: one
        # (TILE_P*TILE_T, H) @ (H, H) MXU matmul instead of TILE_P
        # skinny batched ones. f32 accumulate + f32 bias, then back to
        # the carry dtype.
        o = jnp.dot(
            t.reshape(M, H), w, preferred_element_type=jnp.float32,
        )
        return (o + b[None, :]).astype(mxu_dtype).reshape(
            TILE_P, TILE_T, H
        )

    def _kernel(h0_ref, sc_ref, sh_ref, w0_ref, b0_ref, w1_ref, b1_ref,
                wo_ref, out_ref):
        # carry dtype == mxu_dtype: in bf16 mode the elementwise chain
        # (11 CBN affines, 10 ReLUs, 5 residual adds — the VPU-bound
        # part) runs at 2 lanes/element, same numerics as the unfused
        # decoder_dtype="bfloat16" chain; f32 mode is the exactness mode
        h = h0_ref[...].astype(mxu_dtype)          # (TILE_P, TILE_T, H)
        sc = sc_ref[...].astype(mxu_dtype)         # (TILE_P, _CBN_PAD, H)
        sh = sh_ref[...].astype(mxu_dtype)
        zero = jnp.zeros((), mxu_dtype)
        for i in range(N_BLOCKS):
            t = jnp.maximum(
                h * sc[:, 2 * i][:, None, :] + sh[:, 2 * i][:, None, :],
                zero,
            )
            t = matmul(t, w0_ref[i], b0_ref[i])
            t = jnp.maximum(
                t * sc[:, 2 * i + 1][:, None, :]
                + sh[:, 2 * i + 1][:, None, :], zero,
            )
            t = matmul(t, w1_ref[i], b1_ref[i])
            h = h + t
        hf = jnp.maximum(
            h * sc[:, 2 * N_BLOCKS][:, None, :]
            + sh[:, 2 * N_BLOCKS][:, None, :], zero,
        )
        # fc_out is a (H,) projection: VPU dot in f32, no (T, 1) matmul
        out_ref[...] = jnp.sum(
            hf.astype(jnp.float32) * wo_ref[0][None, None, :], axis=-1
        )

    return _kernel


def fused_cbn_decode(h0, scales, shifts, w0s, b0s, w1s, b1s, w_out,
                     b_out, interpret: bool = False,
                     mxu_dtype=jnp.bfloat16):
    """h0 (Nb, T, H) fc_p(+fc_z) output; scales/shifts (Nb, _CBN_PAD, H);
    w0s/w1s (5, H, H); b0s/b1s (5, H); w_out (H,); b_out scalar ->
    logits (Nb, T) f32. T padded to TILE_T internally.

    mxu_dtype: operand dtype for the 10 block matmuls (f32 accumulate
    either way). bfloat16 (default) matches both the MXU's DEFAULT
    f32-operand behavior and the decoder_dtype="bfloat16" chain;
    float32 is the exactness mode used by the parity test."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Nb, T, _ = h0.shape
    Tp = -(-T // TILE_T) * TILE_T
    Np = -(-Nb // TILE_P) * TILE_P
    if Tp != T or Np != Nb:
        h0 = jnp.pad(h0, ((0, Np - Nb), (0, Tp - T), (0, 0)))
        scales = jnp.pad(scales, ((0, Np - Nb), (0, 0), (0, 0)))
        shifts = jnp.pad(shifts, ((0, Np - Nb), (0, 0), (0, 0)))
    h0 = h0.astype(mxu_dtype)  # halves the dominant HBM read in bf16 mode
    grid = (Np // TILE_P, Tp // TILE_T)

    out = pl.pallas_call(
        _make_kernel(mxu_dtype),
        out_shape=jax.ShapeDtypeStruct((Np, Tp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_P, TILE_T, H), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, _CBN_PAD, H), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, _CBN_PAD, H), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_BLOCKS, H, H), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_BLOCKS, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_BLOCKS, H, H), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_BLOCKS, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_P, TILE_T), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * Tp * (2 * N_BLOCKS) * H * H,
            bytes_accessed=h0.size * 4 + Np * Tp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        h0,
        scales.astype(jnp.float32), shifts.astype(jnp.float32),
        w0s.astype(mxu_dtype), b0s.astype(jnp.float32),
        w1s.astype(mxu_dtype), b1s.astype(jnp.float32),
        w_out.reshape(1, H).astype(jnp.float32),
    )
    return out[:Nb, :T] + b_out


def make_fused_decoder(model, variables, interpret: bool | None = None):
    """Drop-in replacement for
    ``jax.jit(partial(model.apply, method=ISCNet.decode_occupancy))``:
    returns jitted (features, cls_codes, points) -> logits (Nb, T) f32
    using the fused kernel (prior-mean z, eval mode).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    dec = variables["params"]["completion"]["decoder"]
    stats = variables["batch_stats"]["completion"]["decoder"]
    z_dim = model.z_dim

    w0s = jnp.stack([dec[f"block{i}"]["fc_0"]["kernel"]
                     for i in range(N_BLOCKS)])
    b0s = jnp.stack([dec[f"block{i}"]["fc_0"]["bias"]
                     for i in range(N_BLOCKS)])
    w1s = jnp.stack([dec[f"block{i}"]["fc_1"]["kernel"]
                     for i in range(N_BLOCKS)])
    b1s = jnp.stack([dec[f"block{i}"]["fc_1"]["bias"]
                     for i in range(N_BLOCKS)])
    w_out = dec["fc_out"]["kernel"][:, 0]
    b_out = dec["fc_out"]["bias"][0]
    use_cls = model.use_cls_for_completion

    @partial(jax.jit, static_argnames=())
    def decode(features, cls_codes, points):
        c = (jnp.concatenate(
                [features, cls_codes.astype(jnp.float32)], axis=-1)
             if use_cls else features)
        Nb = c.shape[0]
        z = jnp.zeros((Nb, z_dim), jnp.float32)  # prior mean
        h0 = points @ dec["fc_p"]["kernel"] + dec["fc_p"]["bias"]
        if "fc_z" in dec:
            h0 = h0 + (z @ dec["fc_z"]["kernel"]
                       + dec["fc_z"]["bias"])[:, None, :]
        scales, shifts = fold_cbn_constants(dec, stats, c)
        return fused_cbn_decode(
            h0, scales, shifts, w0s, b0s, w1s, b1s, w_out, b_out,
            interpret=interpret,
        )

    return decode

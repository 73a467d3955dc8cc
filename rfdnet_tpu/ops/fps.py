"""Furthest point sampling (FPS) — TPU-native.

Replaces the reference CUDA kernel
(`external/pointnet2_ops_lib/pointnet2_ops/_ext-src/src/sampling_gpu.cu:69-160`)
with two implementations that share exact semantics:

- a Pallas TPU kernel that keeps the whole point cloud and the running
  min-distance vector resident in VMEM for the full selection loop (the
  scene-scale config — N=80k points, 3 coords, f32 — is ~1.3 MB/scene, far
  under the ~16 MB VMEM budget), and
- a pure-XLA ``lax.scan`` fallback used on CPU (tests) and as a reference
  oracle.

Semantics preserved from the reference kernel:
- the first selected index is always 0 (``sampling_gpu.cu:86``),
- candidate points with squared magnitude <= 1e-3 are skipped
  (``sampling_gpu.cu:101``) — exposed as ``skip_near_origin``,
- each step selects the point with maximum distance-to-selected-set, with
  the running min-distance initialised to 1e10 (``sampling.cpp``).

Tie-breaking: both implementations pick the smallest index among maxima
(numpy-argmax order); the CUDA tree reduction uses an unspecified order.
Ties only occur on exactly-equidistant points, which is measure-zero for
real scans.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANE = 128


def _fps_xla(xyz: jax.Array, npoint: int, skip_near_origin: bool) -> jax.Array:
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    if skip_near_origin:
        cand = jnp.sum(xyz * xyz, axis=-1) > 1e-3  # (B, N)
    else:
        cand = jnp.ones((B, N), dtype=bool)

    def step(carry, _):
        mind, last = carry  # (B, N), (B, 3)
        d = jnp.sum((xyz - last[:, None, :]) ** 2, axis=-1)
        mind = jnp.minimum(mind, d)
        eff = jnp.where(cand, mind, -1.0)
        idx = jnp.argmax(eff, axis=1).astype(jnp.int32)  # (B,)
        last = jnp.take_along_axis(xyz, idx[:, None, None], axis=1)[:, 0]
        return (mind, last), idx

    mind0 = jnp.full((B, N), 1e10, dtype=jnp.float32)
    last0 = xyz[:, 0, :]
    (_, _), idxs = jax.lax.scan(step, (mind0, last0), None, length=npoint - 1)
    first = jnp.zeros((1, B), dtype=jnp.int32)
    return jnp.concatenate([first, idxs], axis=0).T  # (B, npoint)


def _fps_kernel(xyz_ref, out_ref, mind_ref, *, npoint, n, skip_near_origin):
    from jax.experimental import pallas as pl  # noqa: F401  (kept local: TPU-only path)

    S = xyz_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, _LANE), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S, _LANE), 1)
    ids = rows * _LANE + cols
    x = xyz_ref[0, 0]
    y = xyz_ref[0, 1]
    z = xyz_ref[0, 2]
    valid = ids < n
    if skip_near_origin:
        cand = jnp.logical_and(valid, x * x + y * y + z * z > 1e-3)
    else:
        cand = valid
    mind_ref[...] = jnp.full((S, _LANE), 1e10, dtype=jnp.float32)
    out_ref[0, 0, 0] = jnp.int32(0)

    def coords_at(idx):
        # masked-reduction extraction (scalar VMEM loads are not lowerable)
        sel = ids == idx
        sx = jnp.max(jnp.where(sel, x, -jnp.inf))
        sy = jnp.max(jnp.where(sel, y, -jnp.inf))
        sz = jnp.max(jnp.where(sel, z, -jnp.inf))
        return sx, sy, sz

    def body(i, carry):
        sx, sy, sz = carry
        dx = x - sx
        dy = y - sy
        dz = z - sz
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind_ref[...], d)
        mind_ref[...] = mind
        eff = jnp.where(cand, mind, -1.0)
        mx = jnp.max(eff)
        # first index attaining the max (numpy argmax order)
        idx = jnp.min(jnp.where(eff >= mx, ids, jnp.int32(S * _LANE - 1)))
        out_ref[0, 0, i] = idx
        return coords_at(idx)

    jax.lax.fori_loop(1, npoint, body, coords_at(jnp.int32(0)))


def _fps_pallas(
    xyz: jax.Array, npoint: int, skip_near_origin: bool, interpret: bool = False
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, _ = xyz.shape
    S = -(-N // _LANE)
    n_pad = S * _LANE
    xyz = xyz.astype(jnp.float32)
    packed = jnp.pad(xyz, ((0, 0), (0, n_pad - N), (0, 0)))
    packed = packed.transpose(0, 2, 1).reshape(B, 3, S, _LANE)

    kernel = functools.partial(
        _fps_kernel, npoint=npoint, n=N, skip_near_origin=skip_near_origin
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, S, _LANE), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, npoint), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((S, _LANE), jnp.float32)],
        interpret=interpret,
    )(packed)[:, 0, :]


def furthest_point_sample(
    xyz: jax.Array,
    npoint: int,
    *,
    skip_near_origin: bool = True,
    impl: str | None = None,
) -> jax.Array:
    """Iterative furthest point sampling.

    Args:
      xyz: (B, N, 3) float point coordinates.
      npoint: number of points to select (static).
      skip_near_origin: replicate the reference kernel's exclusion of points
        with ||p||^2 <= 1e-3 from candidate selection.
      impl: "pallas", "xla", or None (auto). Measured on v5e at the SA1
        scale (1x80000 -> 2048) with DCE-safe full-output timing: XLA scan
        55.9 ms/scene (each of the 2048 steps re-streams the point cloud
        from HBM), Pallas kernel 2.12 ms/scene (points + running
        min-distances stay VMEM-resident) — auto picks "pallas" on TPU and
        the scan elsewhere (Mosaic is TPU-only).

    Returns:
      (B, npoint) int32 indices into N. Gradients do not flow (indices).
    """
    # Indices are non-differentiable (the reference's FurthestPointSampling
    # autograd Function has no backward, `pointnet2_utils.py:34-56`); cut
    # the tangent here so param-dependent inputs (vote_fps sampling feeds
    # predicted vote coordinates) don't trace the Pallas kernel under jvp.
    xyz = jax.lax.stop_gradient(xyz)
    if impl is None:
        import jax as _jax

        impl = "pallas" if _jax.devices()[0].platform == "tpu" else "xla"
    if impl == "pallas":
        return _fps_pallas(xyz, npoint, skip_near_origin)
    return _fps_xla(xyz, npoint, skip_near_origin)

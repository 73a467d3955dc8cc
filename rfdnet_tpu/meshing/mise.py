"""MISE — multi-resolution iso-surface extraction (N8).

Semantic rebuild of `external/libmise/mise.pyx`: an octree refinement loop
over a ``resolution_0 * 2^depth`` corner lattice. ``query()`` yields the
unknown lattice points of the current level, the caller evaluates the
occupancy decoder on them, ``update()`` stores values and activates child
voxels whose corners span the threshold, and ``to_dense()`` fills the
final dense grid (unknown points inherit the value of their coarsest
known ancestor corner — sign-exact for marching cubes, because
non-subdivided voxels have uniformly-signed corners).

TPU-first difference: the reference drives ONE octree per object through
chunked decoder evals (`generator.py:78-121`). ``mise_value_grids`` runs
ALL proposals' octrees in lock-step and evaluates each refinement
frontier as a single padded, fixed-shape device call — the number of
distinct compiled shapes is bounded by bucketing the frontier size to
powers of two.
"""

from __future__ import annotations

import numpy as np


class MISE:
    """Single-object octree refinement over a (R+1)^3 corner lattice,
    R = resolution_0 * 2^depth. Lattice coordinates are ints in [0, R]."""

    def __init__(self, resolution_0: int, depth: int, threshold: float):
        self.res0 = int(resolution_0)
        self.depth = int(depth)
        self.threshold = float(threshold)
        self.R = self.res0 * 2 ** self.depth
        self.values = np.full((self.R + 1,) * 3, np.nan, dtype=np.float64)
        self.level = 0
        step = 2 ** self.depth
        ax = np.arange(0, self.R + 1, step)
        gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
        self._pending = np.stack(
            [gx.ravel(), gy.ravel(), gz.ravel()], axis=-1
        ).astype(np.int64)

    # ------------------------------------------------------------------ api
    def query(self) -> np.ndarray:
        """(n, 3) int lattice points whose value is still unknown."""
        if len(self._pending) == 0:
            return self._pending
        p = self._pending
        known = ~np.isnan(self.values[p[:, 0], p[:, 1], p[:, 2]])
        return p[~known]

    def update(self, points: np.ndarray, values: np.ndarray) -> None:
        points = np.asarray(points, dtype=np.int64).reshape(-1, 3)
        self.values[points[:, 0], points[:, 1], points[:, 2]] = values
        self._advance()

    def _advance(self) -> None:
        """Find active voxels at the current level and queue their child
        corner points; stop when full resolution is reached."""
        if self.level >= self.depth:
            self._pending = np.zeros((0, 3), dtype=np.int64)
            return
        s = 2 ** (self.depth - self.level)  # current voxel edge in lattice units
        n = self.R // s  # voxels per axis at this level
        # (n+1)^3 corner values at stride s
        v = self.values[::s, ::s, ::s]
        occ = v >= self.threshold
        known = ~np.isnan(v)
        # voxel active if all 8 corners are known (i.e. its parent chain was
        # refined down to this level) and the corner signs are mixed
        c = np.zeros((n, n, n), dtype=np.int32)
        k = np.zeros((n, n, n), dtype=np.int32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    c += occ[dx : n + dx, dy : n + dy, dz : n + dz]
                    k += known[dx : n + dx, dy : n + dy, dz : n + dz]
        active = (c > 0) & (c < 8) & (k == 8)
        ii, jj, kk = np.nonzero(active)
        h = s // 2
        if len(ii):
            # child corner lattice points: the 27-point (3x3x3) lattice of
            # each active voxel at half stride (19 of them are new)
            offs = np.array(
                [[a, b, cc] for a in (0, h, s) for b in (0, h, s)
                 for cc in (0, h, s)], dtype=np.int64,
            )
            base = np.stack([ii, jj, kk], axis=-1) * s
            pts = (base[:, None, :] + offs[None, :, :]).reshape(-1, 3)
            pts = np.unique(pts, axis=0)
            known = ~np.isnan(self.values[pts[:, 0], pts[:, 1], pts[:, 2]])
            self._pending = pts[~known]
        else:
            self._pending = np.zeros((0, 3), dtype=np.int64)
        self.level += 1
        if len(self._pending) == 0 and self.level < self.depth:
            self._advance()

    def done(self) -> bool:
        return len(self.query()) == 0

    def to_dense(self) -> np.ndarray:
        """(R+1)^3 dense value grid; unknown points inherit their coarsest
        known ancestor corner value (floor-aligned at each level)."""
        out = self.values.copy()
        for lvl in range(self.depth):
            s = 2 ** (self.depth - lvl)
            h = s // 2
            idx = np.arange(self.R + 1)
            src = (idx // s) * s  # floor-align to parent stride
            # fill points on the half-stride lattice that are unknown from
            # the (fully-known) stride-s lattice; basic slicing keeps `sub`
            # a view so the assignment lands in `out`
            sub = out[::h, ::h, ::h]
            coarse = out[np.ix_(src[::h], src[::h], src[::h])]
            mask = np.isnan(sub)
            sub[mask] = coarse[mask]
        return out


#: frontier evaluation shapes — exactly TWO jit-compiled decoder shapes
#: serve every round of every scene (frontier sizes are data-dependent;
#: compiling a fresh XLA program per power-of-two bucket costs tens of
#: seconds each and dominated the MISE wall-clock)
_SMALL_T = 8192
_CHUNK_T = 32768


def _make_tree(resolution_0: int, depth: int, threshold: float):
    """C++ octree when the native library builds (the production path —
    the reference's libmise is Cython/C++ as well), Python oracle
    otherwise. Both implement the identical contract; equivalence is
    asserted in tests/test_meshing.py."""
    try:
        from .native import MiseNative

        return MiseNative(resolution_0, depth, threshold)
    except Exception:
        return MISE(resolution_0, depth, threshold)


def mise_value_grids(decode_fn, features, cls_codes, resolution_0: int,
                     upsampling_steps: int, threshold: float, padding: float):
    """Run all proposals' MISE octrees in lock-step with batched,
    fixed-shape decoder evaluations.

    decode_fn: (features (Nb, c), cls_codes (Nb, nc), points (Nb, T, 3))
    -> logits (Nb, T). Returns (Nb, R+1, R+1, R+1) numpy value grids of
    LOGITS (caller thresholds at logit(threshold), `generator.py:84`).

    Each refinement round pads every proposal's frontier to a common
    length and evaluates it in fixed-size chunks (`_SMALL_T` for small
    rounds, `_CHUNK_T` strips otherwise), so the decoder compiles at most
    twice regardless of how the data-dependent octrees evolve.
    """
    import numpy as _np

    features = _np.asarray(features)
    cls_codes = _np.asarray(cls_codes)
    Nb = features.shape[0]
    box_size = 1.0 + padding
    logit_thresh = float(_np.log(threshold) - _np.log(1.0 - threshold))

    trees = [_make_tree(resolution_0, upsampling_steps, logit_thresh)
             for _ in range(Nb)]
    R = trees[0].R

    while True:
        queries = [t.query() for t in trees]
        counts = [len(q) for q in queries]
        maxc = max(counts)
        if maxc == 0:
            break
        T = _SMALL_T if maxc <= _SMALL_T else -(-maxc // _CHUNK_T) * _CHUNK_T
        pts = _np.zeros((Nb, T, 3), dtype=_np.float32)
        for i, q in enumerate(queries):
            if len(q):
                # lattice -> canonical coords (`generator.py:106-108`)
                pts[i, : len(q)] = box_size * (
                    q.astype(_np.float32) / R - 0.5
                )
        if T == _SMALL_T:
            logits = _np.asarray(decode_fn(features, cls_codes, pts))
        else:
            logits = _np.concatenate(
                [
                    _np.asarray(decode_fn(
                        features, cls_codes, pts[:, k : k + _CHUNK_T]
                    ))
                    for k in range(0, T, _CHUNK_T)
                ],
                axis=1,
            )
        for i, q in enumerate(queries):
            if len(q):
                trees[i].update(q, logits[i, : len(q)])
    return _np.stack([t.to_dense() for t in trees]).astype(_np.float32)

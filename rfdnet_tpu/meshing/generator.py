"""Mesh generation from the occupancy decoder — batched dense-grid path.

Semantic rebuild of `models/iscnet/modules/generator.py` Generator3D:
- dense `resolution_0`^3 grid (the shipped test config:
  `ISCNet_test.yaml:62-63` resolution_0=32, upsampling_steps=0),
- grid occupancy padded with -1e6 so meshes close at the box boundary
  (`generator.py:160-162`),
- vertices rescaled to the padded unit box (padding=0.1,
  `generator.py:163-172`; includes the reference's documented 0.5-vertex
  shift compensation),
- logit threshold = logit(0.5) (`generator.py:84`).

TPU-first difference: the reference loops proposals one at a time through
the decoder (`generator.py:68-74`); here ALL proposals' grids are evaluated
in a single batched device call and only surface extraction runs per
proposal on the host (C++ marching tetrahedra).
"""

from __future__ import annotations

import numpy as np

from ..models.occnet import make_3d_grid
from .mesh import TriMesh
from .native import marching_tetrahedra


class Generator3D:
    def __init__(self, decode_fn, threshold=0.5, resolution0=32,
                 upsampling_steps=0, padding=0.1, points_batch_size=100000):
        """decode_fn: (features (Nb, c), cls_codes (Nb, nc), points
        (Nb, T, 3)) -> logits (Nb, T) — e.g. a jitted partial of
        ISCNet.decode_occupancy."""
        self.decode_fn = decode_fn
        self.threshold = threshold
        self.resolution0 = resolution0
        self.upsampling_steps = upsampling_steps
        self.padding = padding
        self.points_batch_size = points_batch_size

    def generate_meshes(self, features, cls_codes, valid=None):
        """Batched mesh generation. features (Nb, c_dim),
        cls_codes (Nb, num_class) -> list of TriMesh (empty mesh for
        invalid slots)."""
        import jax.numpy as jnp

        features = jnp.asarray(features)
        cls_codes = jnp.asarray(cls_codes)
        Nb = features.shape[0]
        if self.upsampling_steps == 0:
            nx = self.resolution0
            box_size = 1 + self.padding
            pts = box_size * make_3d_grid((-0.5,) * 3, (0.5,) * 3, (nx,) * 3)
            pts_b = jnp.broadcast_to(pts[None], (Nb, pts.shape[0], 3))
            logits = np.asarray(self.decode_fn(features, cls_codes, pts_b))
            grids = logits.reshape(Nb, nx, nx, nx)
        else:
            grids = self._mise_grids(features, cls_codes)

        meshes = []
        for i in range(Nb):
            if valid is not None and not bool(valid[i]):
                meshes.append(TriMesh(np.zeros((0, 3)), np.zeros((0, 3))))
                continue
            meshes.append(self.extract_mesh(grids[i]))
        return meshes

    def _mise_grids(self, features, cls_codes):
        from .mise import mise_value_grids

        return mise_value_grids(
            self.decode_fn, features, cls_codes,
            self.resolution0, self.upsampling_steps, self.threshold,
            self.padding,
        )

    def extract_mesh(self, value_grid: np.ndarray) -> TriMesh:
        """`generator.py:145-197` extract_mesh (minus simplify/refine)."""
        n_x, n_y, n_z = value_grid.shape
        box_size = 1 + self.padding
        threshold = np.log(self.threshold) - np.log(1.0 - self.threshold)
        padded = np.pad(value_grid, 1, mode="constant", constant_values=-1e6)
        verts, tris = marching_tetrahedra(padded.astype(np.float32), threshold)
        if len(verts) == 0:
            return TriMesh(np.zeros((0, 3)), np.zeros((0, 3)))
        # NOTE: the reference subtracts an extra 0.5 ("strange behaviour in
        # libmcubes"); our extractor places vertices exactly on the lattice,
        # so only the pad offset is removed.
        verts = verts - 1.0
        verts = verts / np.array([n_x - 1, n_y - 1, n_z - 1])
        verts = box_size * (verts - 0.5)
        return TriMesh(verts, tris)

"""Meshing-stack tests: MISE octree vs dense-evaluation oracle, marching
tetrahedra surface extraction, native voxelizer / containment, mesh IO."""

import os

import numpy as np
import pytest

from rfdnet_tpu.meshing.mesh import TriMesh, read_off, read_ply, write_off, write_ply
from rfdnet_tpu.meshing.mise import MISE, mise_value_grids
from rfdnet_tpu.meshing.native import (
    fill_interior,
    marching_tetrahedra,
    points_in_mesh,
    voxelize_surface,
)


def sphere_logit(pts, center=(0.0, 0.0, 0.0), r=0.35, sharp=40.0):
    """Smooth occupancy logit of a sphere; pts (..., 3)."""
    d = np.linalg.norm(pts - np.asarray(center), axis=-1)
    return sharp * (r - d)


class TestMISE:
    def test_refines_to_full_resolution_and_matches_dense_signs(self):
        res0, depth = 8, 2
        m = MISE(res0, depth, 0.0)
        R = m.R
        assert R == 32
        while True:
            q = m.query()
            if len(q) == 0:
                break
            pts = q / R - 0.5
            m.update(q, sphere_logit(pts))
        dense = m.to_dense()
        assert dense.shape == (R + 1,) * 3
        assert not np.isnan(dense).any()

        # oracle: dense evaluation of every lattice point
        ax = np.arange(R + 1) / R - 0.5
        gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
        oracle = sphere_logit(np.stack([gx, gy, gz], -1))
        # sign agreement everywhere (MISE guarantees sign-exactness; values
        # inside non-refined voxels are inherited, not evaluated)
        np.testing.assert_array_equal(dense >= 0.0, oracle >= 0.0)

    def test_evaluates_far_fewer_points_than_dense(self):
        res0, depth = 8, 3
        m = MISE(res0, depth, 0.0)
        R = m.R
        n_eval = 0
        while True:
            q = m.query()
            if len(q) == 0:
                break
            n_eval += len(q)
            m.update(q, sphere_logit(q / R - 0.5))
        assert n_eval < 0.25 * (R + 1) ** 3

    def test_uniform_field_no_refinement(self):
        m = MISE(4, 2, 0.0)
        q = m.query()
        m.update(q, np.full(len(q), -5.0))
        assert len(m.query()) == 0
        dense = m.to_dense()
        assert (dense < 0).all()

    def test_batched_driver(self):
        centers = np.array([[0.1, 0.0, 0.0], [-0.1, 0.05, 0.0]])

        def decode_fn(features, cls_codes, pts):
            # features row i encodes the sphere center
            out = np.stack(
                [sphere_logit(pts[i], center=features[i]) for i in
                 range(len(features))]
            )
            return out

        grids = mise_value_grids(
            decode_fn, centers, np.zeros((2, 8)), resolution_0=8,
            upsampling_steps=2, threshold=0.5, padding=0.1,
        )
        assert grids.shape == (2, 33, 33, 33)
        R = 32
        box = 1.1
        ax = box * (np.arange(R + 1) / R - 0.5)
        gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
        pts = np.stack([gx, gy, gz], -1)
        for i in range(2):
            oracle = sphere_logit(pts, center=centers[i])
            np.testing.assert_array_equal(grids[i] >= 0, oracle >= 0)

    def test_device_mise_matches_host_octree(self):
        """The one-dispatch device MISE (mise_device.py) with budgets
        covering every active voxel reproduces the host octree's grids
        EXACTLY — same refined point set, same values, same ancestor
        fill."""
        import jax
        import jax.numpy as jnp

        from rfdnet_tpu.meshing.mise_device import make_mise_device

        centers = np.array(
            [[0.1, 0.0, 0.0], [-0.1, 0.05, 0.0]], np.float32
        )

        def decode_np(features, cls_codes, pts):
            return np.stack(
                [sphere_logit(np.asarray(pts)[i], center=np.asarray(features)[i])
                 for i in range(len(features))]
            ).astype(np.float32)

        def decode_jnp(features, cls_codes, pts):
            d = jnp.linalg.norm(
                pts - features[:, None, :], axis=-1
            )
            return 40.0 * (0.35 - d)

        host = mise_value_grids(
            decode_np, centers, np.zeros((2, 8), np.float32),
            resolution_0=8, upsampling_steps=2, threshold=0.5, padding=0.1,
        )
        fn = make_mise_device(
            decode_jnp, resolution_0=8, upsampling_steps=2, threshold=0.5,
            padding=0.1, out_dtype=jnp.float32,
        )
        grids, counts = jax.jit(fn)(
            jnp.asarray(centers), jnp.zeros((2, 8), jnp.float32)
        )
        assert np.asarray(counts).max() > 0
        np.testing.assert_allclose(
            np.asarray(grids), host, atol=1e-5, rtol=1e-6
        )

    def test_device_mise_sparse_reconstruct_matches_dense(self):
        """output='sparse' + make_compactor + host reconstruct_dense is
        bit-identical to the device dense output — the compact download
        path loses nothing."""
        import jax
        import jax.numpy as jnp

        from rfdnet_tpu.meshing.mise_device import (
            make_compactor,
            make_mise_device,
            reconstruct_dense,
        )

        centers = np.array(
            [[0.1, 0.0, 0.0], [-0.1, 0.05, 0.0]], np.float32
        )

        def decode_jnp(features, cls_codes, pts):
            d = jnp.linalg.norm(pts - features[:, None, :], axis=-1)
            return 40.0 * (0.35 - d)

        kw = dict(resolution_0=8, upsampling_steps=2, threshold=0.5,
                  padding=0.1, out_dtype=jnp.float16)
        dense_fn = jax.jit(make_mise_device(decode_jnp, **kw))
        sparse_fn = jax.jit(
            make_mise_device(decode_jnp, output="sparse", **kw)
        )
        cls = jnp.zeros((2, 8), jnp.float32)
        grids, counts_d = dense_fn(jnp.asarray(centers), cls)
        lvl0, levels, counts_s = sparse_fn(jnp.asarray(centers), cls)
        np.testing.assert_array_equal(
            np.asarray(counts_d), np.asarray(counts_s)
        )
        compacted = []
        for l, (idx_l, vals_l) in enumerate(levels):
            K = idx_l.shape[1]
            total = int(np.asarray(counts_s)[:, l].sum())
            bucket = max(1 << (total - 1).bit_length(), 8)
            out = make_compactor(K, bucket)(
                idx_l, vals_l, jnp.asarray(counts_s)[:, l]
            )
            compacted.append(tuple(np.asarray(x) for x in out))
        rec = reconstruct_dense(np.asarray(lvl0), compacted, 8, 2)
        np.testing.assert_array_equal(
            rec, np.asarray(grids).astype(np.float32)
        )

    def test_device_mise_overflow_reported(self):
        """Budgets smaller than the active count are reported via the
        counts output (the caller's fallback trigger)."""
        import jax
        import jax.numpy as jnp

        from rfdnet_tpu.meshing.mise_device import make_mise_device

        def decode_jnp(features, cls_codes, pts):
            d = jnp.linalg.norm(pts - features[:, None, :], axis=-1)
            return 40.0 * (0.35 - d)

        fn = make_mise_device(
            decode_jnp, resolution_0=8, upsampling_steps=1, threshold=0.5,
            padding=0.1, budgets=[4], out_dtype=jnp.float32,
        )
        _, counts = jax.jit(fn)(
            jnp.zeros((1, 3), jnp.float32), jnp.zeros((1, 8), jnp.float32)
        )
        assert int(np.asarray(counts)[0, 0]) > 4

    def test_generator_device_mise_meshes_match_host(self):
        """Generator3D(mise_impl='device') produces the same meshes as
        the host-octree path (same grids => same marching cubes)."""
        import jax.numpy as jnp

        from rfdnet_tpu.meshing.generator import Generator3D

        def decode_jnp(features, cls_codes, pts):
            d = jnp.linalg.norm(pts - features[:, None, :], axis=-1)
            return 40.0 * (0.35 - d)

        feats = np.array([[0.1, 0.0, 0.0], [-0.1, 0.05, 0.0]], np.float32)
        cls = np.zeros((2, 8), np.float32)
        kw = dict(resolution0=8, upsampling_steps=2)
        g_dev = Generator3D(decode_jnp, mise_impl="device", **kw)
        g_host = Generator3D(decode_jnp, mise_impl="host", **kw)
        m_dev = g_dev.generate_meshes(feats, cls)
        m_host = g_host.generate_meshes(feats, cls)
        assert g_dev.mise_impl == "device"  # no silent fallback
        for a, b in zip(m_dev, m_host):
            np.testing.assert_allclose(
                a.vertices, b.vertices, atol=1e-4
            )
            np.testing.assert_array_equal(a.faces, b.faces)

    def test_sparse_mc_byte_identical_to_dense(self):
        """mise_marching_cubes (the sparse-direct C++ extractor behind
        Generator3D.finish_meshes_device) is BYTE-identical — same
        vertex ids, same coordinates, same triangles — to marching
        cubes over the padded dense reconstruction, on an adversarial
        field: bumpy off-center spheres, an all-negative proposal, and
        an all-positive one whose surface rides the padded boundary."""
        import jax
        import jax.numpy as jnp

        from rfdnet_tpu.meshing.mise_device import (
            make_compactor,
            make_mise_device,
            reconstruct_dense,
        )
        from rfdnet_tpu.meshing.native import (
            marching_cubes,
            mise_marching_cubes,
        )

        rng = np.random.RandomState(0)
        Nb = 5
        feats = np.zeros((Nb, 8), np.float32)
        feats[:, :3] = rng.uniform(-0.15, 0.15, (Nb, 3))
        feats[:, 3] = rng.uniform(0.15, 0.4, Nb)
        feats[3, :4] = [0, 0, 0, -1.0]  # empty
        feats[4, :4] = [0, 0, 0, 5.0]   # full incl. boundary

        def decode(f, c, pts):
            ctr = f[:, None, :3]
            r = f[:, None, 3]
            d = jnp.linalg.norm(pts - ctr, axis=-1)
            bump = 0.3 * jnp.sin(9 * pts[..., 0]) * jnp.cos(7 * pts[..., 1])
            return 12.0 * (r - d) + bump

        res0, steps, thr = 16, 2, 0.5
        fn = jax.jit(make_mise_device(
            decode, res0, steps, thr, padding=0.1, output="sparse",
            out_dtype=jnp.float32,
        ))
        lvl0, levels, counts = fn(jnp.asarray(feats),
                                  jnp.zeros((Nb, 8), jnp.float32))
        counts = np.asarray(counts)
        comp = []
        for l, (idx_l, vals_l) in enumerate(levels):
            K = idx_l.shape[1]
            total = int(counts[:, l].sum())
            bucket = min(max(256, 1 << max(total - 1, 0).bit_length()),
                         Nb * K)
            out = jax.jit(make_compactor(K, bucket))(
                idx_l, vals_l, jnp.asarray(counts[:, l])
            )
            comp.append(tuple(np.asarray(x) for x in out))
        dense = reconstruct_dense(np.asarray(lvl0), comp, res0, steps)
        iso = float(np.log(thr) - np.log(1 - thr))
        for i in range(Nb):
            padded = np.pad(dense[i].astype(np.float32), 1,
                            constant_values=-1e6)
            v_ref, t_ref = marching_cubes(padded, iso)
            idx_i, vals_i = [], []
            for gprop, gidx, gvals, gvalid in comp:
                sel = gvalid.astype(bool) & (gprop == i)
                idx_i.append(gidx[sel])
                vals_i.append(gvals[sel].astype(np.float32))
            v_sp, t_sp = mise_marching_cubes(
                np.asarray(lvl0)[i], res0, steps, idx_i, vals_i, iso
            )
            np.testing.assert_array_equal(v_sp, v_ref)
            np.testing.assert_array_equal(t_sp, t_ref)
        assert sum(len(np.asarray(lv[0])) for lv in comp) > 0

    def test_native_octree_matches_python_oracle(self):
        """The C++ MISE octree (meshing.cpp mise_*, the production path
        of `_make_tree`) must replay the Python MISE class exactly:
        identical query sequences (points AND order), identical dense
        grids — for several res0/depth combos including one where some
        voxels never subdivide."""
        from rfdnet_tpu.meshing.mise import MISE
        from rfdnet_tpu.meshing.native import MiseNative

        def field(pts, R):
            p = pts.astype(np.float64) / R * 1.1 - 0.55
            d = np.linalg.norm(p - np.array([0.05, -0.02, 0.1]), axis=-1)
            return 40.0 * (0.35 - d)

        for res0, depth in [(8, 2), (16, 2), (4, 3)]:
            py = MISE(res0, depth, 0.0)
            cc = MiseNative(res0, depth, 0.0)
            while True:
                qp, qc = py.query(), cc.query()
                np.testing.assert_array_equal(qp, qc)
                if len(qp) == 0:
                    break
                v = field(qp, py.R)
                py.update(qp, v)
                cc.update(qc, v)
            np.testing.assert_allclose(
                py.to_dense().astype(np.float32), cc.to_dense(),
                rtol=0, atol=0,
            )

    def test_chunked_frontier_matches_single_shot(self, monkeypatch):
        """Frontier evaluation uses fixed-size chunks (two compiled
        decoder shapes total); tiny chunk sizes must reproduce the
        single-shot grids exactly, and every chunk the decoder sees must
        have one of the two blessed widths."""
        import rfdnet_tpu.meshing.mise as mise_mod

        centers = np.array([[0.1, 0.0, 0.0], [-0.1, 0.05, 0.0]])
        seen = []

        def decode_fn(features, cls_codes, pts):
            seen.append(pts.shape[1])
            return np.stack([
                sphere_logit(pts[i], center=features[i])
                for i in range(len(features))
            ])

        args = (decode_fn, centers, np.zeros((2, 8)))
        kw = dict(resolution_0=8, upsampling_steps=2, threshold=0.5,
                  padding=0.1)
        ref = mise_value_grids(*args, **kw)
        seen.clear()
        monkeypatch.setattr(mise_mod, "_SMALL_T", 64)
        monkeypatch.setattr(mise_mod, "_CHUNK_T", 256)
        chunked = mise_value_grids(*args, **kw)
        np.testing.assert_array_equal(ref, chunked)
        assert set(seen) <= {64, 256}


class TestMarchingTetrahedra:
    def test_sphere_surface(self):
        n = 33
        ax = np.arange(n) / (n - 1) - 0.5
        gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
        grid = sphere_logit(np.stack([gx, gy, gz], -1))
        verts, tris = marching_tetrahedra(grid.astype(np.float32), 0.0)
        assert len(verts) > 100 and len(tris) > 100
        # vertices (index space) lie near the r=0.35 sphere
        r = np.linalg.norm(verts / (n - 1) - 0.5, axis=-1)
        assert np.abs(r - 0.35).max() < 0.05
        # watertight: every edge shared by exactly two triangles
        edges = np.concatenate(
            [tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]]
        )
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).all()


class TestVoxelize:
    def _cube(self):
        v = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
             [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], dtype=np.float64,
        )
        f = np.array(
            [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
             [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
             [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]], dtype=np.int32,
        )
        return v, f

    def test_surface_and_fill(self):
        v, f = self._cube()
        dims = (12, 12, 12)
        surf = voxelize_surface(v, f, np.array([-0.1, -0.1, -0.1]), 0.1, dims)
        assert surf.any()
        filled = fill_interior(surf)
        # center voxel is interior
        assert filled[6, 6, 6]
        # a corner voxel outside the cube is not
        assert not filled[0, 0, 0]
        assert filled.sum() >= surf.sum()

    def test_points_in_mesh(self):
        v, f = self._cube()
        pts = np.array(
            [[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [0.9, 0.9, 0.9],
             [-0.2, 0.0, 0.0]]
        )
        inside = points_in_mesh(v, f, pts)
        np.testing.assert_array_equal(inside, [True, False, True, False])


class TestMeshIO:
    def test_ply_roundtrip(self, tmp_path):
        v = np.random.RandomState(0).rand(10, 3)
        f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        p = str(tmp_path / "m.ply")
        write_ply(p, v, f)
        v2, f2 = read_ply(p)
        np.testing.assert_allclose(v2, v, atol=1e-6)
        np.testing.assert_array_equal(f2, f)

    def test_off_roundtrip(self, tmp_path):
        v = np.random.RandomState(1).rand(8, 3)
        f = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
        p = str(tmp_path / "m.off")
        write_off(p, v, f)
        v2, f2 = read_off(p)
        np.testing.assert_allclose(v2, v, atol=1e-12)
        np.testing.assert_array_equal(f2, f)


class TestReferenceGoldens:
    """Golden artifacts checked in from the reference's demo outputs
    (`demo/outputs/scene0549_00/`) exercised through our IO + voxel-IoU
    stack."""

    DIR = os.path.join(os.path.dirname(__file__), "..", "demo", "outputs",
                       "scene0549_00")

    def test_reference_mesh_roundtrip_and_self_iou(self):
        from rfdnet_tpu.eval.mesh_iou import compute_mesh_iou, voxelize_mesh_pair

        path = os.path.join(self.DIR, "proposal_22_mesh.ply")
        if not os.path.exists(path):
            pytest.skip("goldens absent")
        m = TriMesh.load(path)
        assert len(m.vertices) > 1000 and len(m.faces) > 1000
        pair = voxelize_mesh_pair(m.vertices, m.faces, 0.03)
        assert compute_mesh_iou(pair, pair) == pytest.approx(1.0)

    def test_reference_bbox_npz_contract(self):
        path = os.path.join(self.DIR, "000000_pred_confident_nms_bbox.npz")
        if not os.path.exists(path):
            pytest.skip("goldens absent")
        d = np.load(path)
        assert d["obbs"].shape[1] == 7
        assert d["proposal_map"].shape[0] == d["obbs"].shape[0]


class TestKDTree:
    def test_knn_matches_bruteforce(self):
        from rfdnet_tpu.meshing.native import KDTree

        rng = np.random.RandomState(0)
        pts_set = rng.rand(3000, 3)
        q = rng.rand(100, 3)
        d, i = KDTree(pts_set).query(q, 4)
        D = np.linalg.norm(q[:, None] - pts_set[None], axis=-1)
        oi = np.argsort(D, axis=1)[:, :4]
        od = np.take_along_axis(D, oi, axis=1)
        np.testing.assert_allclose(d, od, atol=1e-12)

    def test_chamfer_symmetric_zero(self):
        from rfdnet_tpu.meshing.native import kdtree_chamfer

        pts_set = np.random.RandomState(1).rand(500, 3)
        assert kdtree_chamfer(pts_set, pts_set) == 0.0


class TestGeneratorExtras:
    def _generator(self, **kw):
        import jax

        from rfdnet_tpu.meshing.generator import Generator3D

        def decode_fn(features, cls_codes, pts):
            # batched analytic sphere occupancy logit, differentiable
            import jax.numpy as jnp

            r = jnp.linalg.norm(pts, axis=-1)
            return 40.0 * (0.35 - r)

        return Generator3D(decode_fn, resolution0=16, **kw)

    def test_simplify_in_pipeline(self):
        g = self._generator(simplify_nfaces=300)
        meshes = g.generate_meshes(np.zeros((1, 4)), np.zeros((1, 8)))
        assert 0 < len(meshes[0].faces) < len(
            self._generator().generate_meshes(
                np.zeros((1, 4)), np.zeros((1, 8))
            )[0].faces
        )

    def test_refine_pulls_to_isosurface(self):
        g = self._generator(refinement_step=30)
        base = self._generator()
        mesh = base.generate_meshes(np.zeros((1, 4)), np.zeros((1, 8)))[0]
        noisy = mesh.copy()
        rng = np.random.RandomState(0)
        noisy.vertices = noisy.vertices + rng.randn(*noisy.vertices.shape) * 0.02
        refined = g.refine_mesh(noisy, np.zeros(4), np.zeros(8), steps=300)
        r_noisy = np.abs(np.linalg.norm(noisy.vertices, axis=1) - 0.35)
        r_ref = np.abs(np.linalg.norm(refined.vertices, axis=1) - 0.35)
        assert r_ref.mean() < 0.9 * r_noisy.mean()


# ------------------------------------------------------- marching cubes
class TestMarchingCubes:
    """mc_extract (true MC with constructed case tables) vs analytic
    fields and the MT extractor — closes the MC/MT deviation
    (`generator.py:160` extracts with PyMCubes)."""

    @staticmethod
    def _sphere_field(n=40, r=1.0, extent=1.3):
        ax = np.linspace(-extent, extent, n)
        X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
        return (r - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32), ax

    @staticmethod
    def _edge_counts(tris):
        from collections import Counter

        c = Counter()
        for a, b, d in tris:
            for e in ((a, b), (b, d), (d, a)):
                c[tuple(sorted(e))] += 1
        return c

    def test_watertight_and_oriented(self):
        from rfdnet_tpu.meshing.native import marching_cubes

        field, ax = self._sphere_field()
        v, t = marching_cubes(field, 0.0)
        assert len(v) > 100 and len(t) > 100
        # watertight: every edge borders exactly 2 triangles
        ec = self._edge_counts(t)
        assert all(cnt == 2 for cnt in ec.values())
        # Euler characteristic of a sphere: V - E + F = 2
        assert len(v) - len(ec) + len(t) == 2
        # outward orientation + volume accuracy: signed volume ~ 4/3 pi r^3
        vol = 0.0
        for a, b, c in t:
            vol += np.dot(v[a], np.cross(v[b], v[c])) / 6.0
        scale = (len(ax) - 1) / (ax[-1] - ax[0])
        expected = 4.0 / 3.0 * np.pi * scale**3
        assert vol == pytest.approx(expected, rel=5e-3)
        # vertices on the sphere
        center = (len(ax) - 1) / 2.0
        rr = np.linalg.norm(v - center, axis=1) / scale
        assert np.abs(rr - 1.0).max() < 2e-3

    def test_ambiguous_faces_no_holes(self):
        """Checkerboard-ish random fields hammer the ambiguous (diagonal)
        face cases where the classic Lorensen table leaks pinholes. No
        boundary (odd-count) edges allowed; count-4 edges are legitimate
        non-manifold CONTACTS (two closed sheets touching along a lattice
        edge — classic MC produces these too), not holes."""
        from rfdnet_tpu.meshing.native import marching_cubes

        rng = np.random.RandomState(0)
        for _ in range(5):
            field = rng.randn(9, 9, 9).astype(np.float32)
            field = np.pad(field, 1, constant_values=-10.0)
            v, t = marching_cubes(field, 0.0)
            ec = self._edge_counts(t)
            assert all(cnt % 2 == 0 for cnt in ec.values())
            assert sum(cnt != 2 for cnt in ec.values()) < 0.01 * len(ec)

    def test_mc_vs_mt_voxel_iou(self):
        """MC and MT of the same field agree to voxel IoU >= 0.99 at the
        golden 33^3 occupancy-grid scale (VERDICT item 5's bar)."""
        from rfdnet_tpu.eval.mesh_iou import mesh_iou, voxelize_mesh_pair
        from rfdnet_tpu.meshing.native import marching_cubes, marching_tetrahedra

        # smooth blobby field at the generator's padded-grid scale
        n = 35
        ax = np.linspace(-1, 1, n)
        X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
        field = (
            0.55
            - np.sqrt((X + 0.15) ** 2 + Y**2 + Z**2)
            + 0.35 * np.exp(-((X - 0.4) ** 2 + Y**2 + (Z - 0.2) ** 2) / 0.05)
        ).astype(np.float32)
        field = np.pad(field, 1, constant_values=-1e6)
        vc, tc = marching_cubes(field, 0.0)
        vt, tt = marching_tetrahedra(field, 0.0)
        assert len(tc) < 0.6 * len(tt)  # MC's triangle economy
        vs = (vc.max() - vc.min()) / 24.0
        iou = mesh_iou(
            voxelize_mesh_pair(vc, tc, vs), voxelize_mesh_pair(vt, tt, vs)
        )
        assert iou >= 0.99

    def test_estimate_normals_radial_on_sphere(self, tmp_path):
        """Generator3D(with_normals=True) attaches -grad(occ)/|grad|
        normals (`generator.py:199-225`): for a sphere occupancy field
        (logit = sharp*(r - |p - c|)) the gradient points inward, so the
        normals must point radially OUT from the center; the PLY
        round-trip must carry them."""
        import jax.numpy as jnp

        from rfdnet_tpu.meshing.generator import Generator3D
        from rfdnet_tpu.meshing.mesh import TriMesh

        center = np.array([0.05, -0.02, 0.1], np.float32)

        def decode_fn(features, cls_codes, pts):
            d = jnp.linalg.norm(pts - features[:, None, :], axis=-1)
            return 40.0 * (0.35 - d)

        g = Generator3D(
            decode_fn, resolution0=24, with_normals=True,
        )
        meshes = g.generate_meshes(
            jnp.asarray(center[None]), jnp.zeros((1, 8)),
        )
        m = meshes[0]
        assert m.vertex_normals is not None
        assert m.vertex_normals.shape == m.vertices.shape
        radial = m.vertices - center
        radial /= np.linalg.norm(radial, axis=-1, keepdims=True)
        cos = np.sum(m.vertex_normals * radial, axis=-1)
        assert cos.min() > 0.99, cos.min()

        p = str(tmp_path / "n.ply")
        m.export(p)
        rt = TriMesh.load(p)
        np.testing.assert_allclose(rt.vertices, m.vertices, atol=1e-6)

    def test_f16_grid_quantization_mesh_bound(self):
        """`ISCNet.generate(grid_dtype='float16')` transfer-only
        quantization: meshes extracted from f16-cast logit grids must
        have identical topology (f16 round-to-nearest never flips a
        logit's sign) and vertices within ~1e-3 voxel of the f32-grid
        meshes."""
        from rfdnet_tpu.meshing.generator import Generator3D

        g = Generator3D(decode_fn=None, resolution0=32)
        lin = np.linspace(-0.55, 0.55, 32)
        pts = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
        grid = sphere_logit(pts, center=(0.07, -0.03, 0.11)).astype(
            np.float32
        )
        m32 = g.extract_mesh(grid)
        m16 = g.extract_mesh(grid.astype(np.float16))
        np.testing.assert_array_equal(m32.faces, m16.faces)
        voxel = 1.1 / 31
        assert np.abs(m32.vertices - m16.vertices).max() < 1e-2 * voxel

    def test_generator_uses_mc_by_default(self):
        from rfdnet_tpu.meshing.generator import Generator3D
        from rfdnet_tpu.meshing.native import marching_cubes

        g = Generator3D(decode_fn=None)
        assert g.extract_fn is marching_cubes
        # canonical-box rescale contract unchanged
        grid = np.full((16, 16, 16), -5.0, np.float32)
        grid[4:12, 4:12, 4:12] = 5.0
        mesh = g.extract_mesh(grid)
        assert len(mesh.vertices) > 0
        assert np.all(np.abs(mesh.vertices) <= 0.55 + 1e-9)


# ---------------------------------------------------- transfer-sparse grids
def test_sparse_bits_mc_byte_identical_to_dense():
    """The transfer-sparse dense-grid form (device `sparsify_grids` ->
    host `mc_extract_bits`) must reproduce the dense padded extraction
    bit for bit: same welded vertex ids, same coordinates, same
    triangles."""
    import jax
    import jax.numpy as jnp

    from rfdnet_tpu.meshing.mise_device import sparsify_grids
    from rfdnet_tpu.meshing.native import (
        marching_cubes_bits,
        marching_cubes_padded,
    )

    rng = np.random.RandomState(0)
    n = 24
    ax = np.linspace(-0.55, 0.55, n)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([X, Y, Z], -1)
    grids = []
    for i in range(5):
        c = rng.uniform(-0.08, 0.08, 3)
        r = np.linalg.norm((pts - c) * rng.uniform(0.8, 1.4, 3), axis=-1)
        bump = 0.2 * np.sin(6 * pts[..., 0]) * np.cos(4 * pts[..., 1])
        grids.append((30.0 * (0.31 + bump - r)).astype(np.float16))
    grids = np.stack(grids)

    iso = 0.0
    budget = 1 << 17
    bits, vals, counts = jax.jit(
        lambda g: sparsify_grids(g, iso, budget)
    )(jnp.asarray(grids))
    bits = np.asarray(bits)
    vals = np.asarray(vals).astype(np.float32)
    counts = np.asarray(counts)
    assert counts.sum() <= budget
    offs = np.concatenate([[0], np.cumsum(counts)])
    for i in range(len(grids)):
        ref_v, ref_t = marching_cubes_padded(
            grids[i].astype(np.float32), iso
        )
        pair = marching_cubes_bits(
            bits[i], vals[offs[i]:offs[i + 1]], (n, n, n), iso
        )
        assert pair is not None
        np.testing.assert_array_equal(pair[0], ref_v)
        np.testing.assert_array_equal(pair[1], ref_t)
        assert len(ref_t) > 100  # non-trivial surface

    # count mismatch (truncated values) -> None, caller falls back
    assert marching_cubes_bits(
        bits[0], vals[: max(counts[0] - 1, 0)], (n, n, n), iso
    ) is None


def test_sparse_bits_respects_valid_mask():
    import jax
    import jax.numpy as jnp

    from rfdnet_tpu.meshing.mise_device import sparsify_grids

    g = np.zeros((2, 8, 8, 8), np.float16)
    g[:, 2:6, 2:6, 2:6] = 5.0
    g -= 2.0
    bits, vals, counts = jax.jit(
        lambda x, v: sparsify_grids(x, 0.0, 4096, valid=v)
    )(jnp.asarray(g), jnp.asarray([True, False]))
    counts = np.asarray(counts)
    assert counts[0] > 0 and counts[1] == 0


def _sphere_decode_jnp(features, cls_codes, pts):
    import jax.numpy as jnp

    r = features[..., :1]
    d = jnp.linalg.norm(pts, axis=-1)
    return (r - d) * 20.0


def test_mise_global_byte_identical_and_valid_gated():
    """Device MISE v2 (global budgets + valid gating + transfer-sparse
    download, VERDICT r4 item 2): meshes equal the dense-field extraction
    bit for bit; invalid slots produce empty meshes and zero payload."""
    import jax
    import jax.numpy as jnp

    from rfdnet_tpu.meshing.generator import Generator3D
    from rfdnet_tpu.meshing.mise_device import make_mise_device

    Nb = 4
    feats = jnp.asarray(
        np.linspace(0.15, 0.4, Nb, dtype=np.float32)[:, None]
        * np.ones((Nb, 8), np.float32)
    )
    cls = jnp.zeros((Nb, 8), jnp.float32)
    valid = np.array([True, False, True, True])

    res0, steps = 8, 1
    dense_fn = jax.jit(make_mise_device(
        _sphere_decode_jnp, res0, steps, 0.5, 0.1,
        budgets=[res0**3], output="dense",
    ))
    grids, _ = dense_fn(feats, cls)
    g = Generator3D(_sphere_decode_jnp, resolution0=res0,
                    upsampling_steps=steps, mise_impl="device")
    ref = g.meshes_from_grids(np.asarray(grids).astype(np.float32),
                              valid=valid)
    got = g.generate_meshes(feats, cls, valid=valid)
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a.vertices, b.vertices)
        np.testing.assert_array_equal(
            np.asarray(a.faces, np.int64), np.asarray(b.faces, np.int64)
        )
    assert len(got[1].vertices) == 0  # gated invalid slot
    assert len(got[0].vertices) > 0


def test_mise_global_budget_doubling_recovers():
    """Deliberately tiny initial budgets: the adaptive loop re-dispatches
    at doubled budgets (instead of falling back to the host octree) and
    still produces the exact meshes."""
    import jax
    import jax.numpy as jnp

    from rfdnet_tpu.meshing.generator import Generator3D
    from rfdnet_tpu.meshing.mise_device import make_mise_device

    Nb = 2
    feats = jnp.asarray(
        np.array([[0.3], [0.42]], np.float32) * np.ones((Nb, 8), np.float32)
    )
    cls = jnp.zeros((Nb, 8), jnp.float32)

    res0, steps = 8, 1
    dense_fn = jax.jit(make_mise_device(
        _sphere_decode_jnp, res0, steps, 0.5, 0.1,
        budgets=[res0**3], output="dense",
    ))
    grids, _ = dense_fn(feats, cls)
    g = Generator3D(_sphere_decode_jnp, resolution0=res0,
                    upsampling_steps=steps, mise_impl="device",
                    mise_budgets=[8])  # absurdly small on purpose
    ref = g.meshes_from_grids(np.asarray(grids).astype(np.float32))
    got = g.generate_meshes(feats, cls)
    assert g._mise_v2_budgets[0] > 8  # the loop actually grew it
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a.vertices, b.vertices)
        np.testing.assert_array_equal(
            np.asarray(a.faces, np.int64), np.asarray(b.faces, np.int64)
        )


def test_sparse_grid_fetcher_prefix_slicing():
    """SparseGridFetcher: counts-sized valid-prefix downloads re-pad to
    arrays byte-equivalent to the full downloads (invalid rows zero, but
    those rows are masked by every consumer)."""
    import jax.numpy as jnp

    from rfdnet_tpu.meshing.mise_device import sparsify_grids
    from rfdnet_tpu.meshing.transfer import SparseGridFetcher

    rng = np.random.RandomState(0)
    n = 16
    g = rng.randn(6, n, n, n).astype(np.float16) * 3
    valid = np.array([True, True, True, False, False, False])
    bits, vals, counts = sparsify_grids(
        jnp.asarray(g), 0.0, 1 << 16, valid=jnp.asarray(valid)
    )
    f = SparseGridFetcher(vals_step=1024)
    res = f.fetch(bits, vals, np.asarray(counts), valid)
    assert res is not None
    bits_np, vals_np, _ = res
    full_bits = np.asarray(bits)
    total = int(np.asarray(counts).sum())
    # rows inside the pow2 bucket (4 for a 3-row prefix) byte-identical;
    # rows past the bucket zero-filled
    np.testing.assert_array_equal(bits_np[:4], full_bits[:4])
    assert not bits_np[4:].any()
    np.testing.assert_array_equal(
        vals_np[:total], np.asarray(vals)[:total]
    )
    assert len(vals_np) >= total
    assert f.last_bytes < full_bits.nbytes + np.asarray(vals).nbytes
    # overflow (counts exceed the shipped buffer) -> None
    assert f.fetch(bits, vals[:1], np.asarray(counts) + 10**6, valid) is None

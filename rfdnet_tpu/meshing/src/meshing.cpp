// rfdnet_tpu native meshing library.
//
// Host-side geometry the reference delegates to external C/CUDA/Cython
// packages (PyMCubes, libvoxelize/tribox2.h SAT tests, libmesh triangle-hash
// containment, binvox): iso-surface extraction, surface voxelization,
// interior fill, and point-in-mesh testing. Exposed through a plain C ABI
// consumed via ctypes (no pybind11 in this toolchain).
//
// Iso-surface extraction: mc_extract is true marching cubes (the default —
// matches the reference's PyMCubes usage); mt_extract is marching
// tetrahedra (6-tetra cube split, ~3x more triangles). Both share the
// vertex-interpolation convention (vertices in grid-index space) and the
// edge-welded output.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <limits>
#include <vector>
#include <deque>
#include <algorithm>
#include <unordered_map>

namespace {

struct V3 {
  double x, y, z;
};

// ---------------------------------------------------------------- MT core
struct MeshAcc {
  std::vector<double> verts;
  std::vector<int> tris;
  std::unordered_map<uint64_t, int> edge_cache;

  int edge_vertex(uint64_t key_a, uint64_t key_b, const V3 &pa, const V3 &pb,
                  double va, double vb, double iso) {
    uint64_t key = key_a < key_b ? (key_a << 32) | key_b : (key_b << 32) | key_a;
    auto it = edge_cache.find(key);
    if (it != edge_cache.end()) return it->second;
    double t = (iso - va) / (vb - va);
    if (!(t >= 0.0)) t = 0.0;
    if (!(t <= 1.0)) t = 1.0;
    int idx = (int)(verts.size() / 3);
    verts.push_back(pa.x + t * (pb.x - pa.x));
    verts.push_back(pa.y + t * (pb.y - pa.y));
    verts.push_back(pa.z + t * (pb.z - pa.z));
    edge_cache.emplace(key, idx);
    return idx;
  }
};

inline uint64_t node_key(int x, int y, int z, int ny, int nz) {
  return ((uint64_t)x * ny + y) * nz + z;
}

void do_tetra(MeshAcc &acc, const uint64_t keys[4], const V3 pos[4],
              const double val[4], double iso) {
  int mask = 0;
  for (int i = 0; i < 4; ++i)
    if (val[i] > iso) mask |= 1 << i;
  if (mask == 0 || mask == 15) return;

  auto ev = [&](int a, int b) {
    return acc.edge_vertex(keys[a], keys[b], pos[a], pos[b], val[a], val[b], iso);
  };
  auto tri = [&](int a, int b, int c) {
    acc.tris.push_back(a);
    acc.tris.push_back(b);
    acc.tris.push_back(c);
  };

  switch (mask) {
    case 1: tri(ev(0,1), ev(0,2), ev(0,3)); break;
    case 14: tri(ev(0,1), ev(0,3), ev(0,2)); break;
    case 2: tri(ev(1,0), ev(1,3), ev(1,2)); break;
    case 13: tri(ev(1,0), ev(1,2), ev(1,3)); break;
    case 4: tri(ev(2,0), ev(2,1), ev(2,3)); break;
    case 11: tri(ev(2,0), ev(2,3), ev(2,1)); break;
    case 8: tri(ev(3,0), ev(3,2), ev(3,1)); break;
    case 7: tri(ev(3,0), ev(3,1), ev(3,2)); break;
    case 3:  // 0,1 inside
      tri(ev(0,2), ev(1,3), ev(0,3));
      tri(ev(0,2), ev(1,2), ev(1,3));
      break;
    case 12:
      tri(ev(0,2), ev(0,3), ev(1,3));
      tri(ev(0,2), ev(1,3), ev(1,2));
      break;
    case 5:  // 0,2 inside
      tri(ev(0,1), ev(0,3), ev(2,3));
      tri(ev(0,1), ev(2,3), ev(2,1));
      break;
    case 10:
      tri(ev(0,1), ev(2,3), ev(0,3));
      tri(ev(0,1), ev(2,1), ev(2,3));
      break;
    case 9:  // 0,3 inside
      tri(ev(0,1), ev(1,3), ev(2,3));
      tri(ev(0,1), ev(2,3), ev(0,2));
      break;
    case 6:
      tri(ev(0,1), ev(2,3), ev(1,3));
      tri(ev(0,1), ev(0,2), ev(2,3));
      break;
  }
}

// ---------------------------------------------------------------- MC core
// True marching cubes (the reference extracts with PyMCubes,
// `models/iscnet/modules/generator.py:160`). The 256 case tessellations are
// built programmatically instead of hard-coding the Lorensen tables:
// for every face, contiguous runs of inside vertices along the (outward-
// oriented) face cycle produce one directed surface segment from the run's
// entry crossing to its exit crossing; following the segments stitches the
// per-cube intersection loops, which are fan-triangulated. Per-face run
// pairing resolves the ambiguous (diagonal) faces identically for the two
// cubes sharing the face, so the result is watertight by construction —
// unlike the classic asymmetric table, which can leave pinholes there.
//
// Cube vertex encoding: v = dx*4 + dy*2 + dz over the unit cube.

namespace mc {

// 12 edges as vertex pairs
static const int EDGE_V[12][2] = {
    {0, 1}, {0, 2}, {0, 4}, {1, 3}, {1, 5}, {2, 3},
    {2, 6}, {3, 7}, {4, 5}, {4, 6}, {5, 7}, {6, 7}};

// faces as outward-CCW vertex cycles (normal points out of the cube)
static const int FACE_C[6][4] = {
    {0, 1, 3, 2},   // x = 0
    {4, 6, 7, 5},   // x = 1
    {0, 4, 5, 1},   // y = 0
    {2, 3, 7, 6},   // y = 1
    {0, 2, 6, 4},   // z = 0
    {1, 5, 7, 3}};  // z = 1

inline int edge_id(int a, int b) {
  for (int e = 0; e < 12; ++e)
    if ((EDGE_V[e][0] == a && EDGE_V[e][1] == b) ||
        (EDGE_V[e][0] == b && EDGE_V[e][1] == a))
      return e;
  return -1;
}

// per-mask loops of edge ids (built once, cached)
struct CaseTable {
  std::vector<std::vector<int>> loops[256];
};

// thread-safe lazy init (C++11 magic static): mc_extract may be called
// from several host threads at once (per-proposal extraction fan-out)
static const CaseTable &case_table() {
  static const CaseTable g_table = [] {
  CaseTable g_table;
  for (int mask = 1; mask < 255; ++mask) {
    int next_edge[12];
    bool has_seg[12] = {false};
    for (int e = 0; e < 12; ++e) next_edge[e] = -1;
    auto inside = [&](int v) { return (mask >> v) & 1; };
    for (int f = 0; f < 6; ++f) {
      const int *c = FACE_C[f];
      for (int i = 0; i < 4; ++i) {
        // run start: c[i] inside, c[i-1] outside
        if (!inside(c[i]) || inside(c[(i + 3) & 3])) continue;
        int entry = edge_id(c[(i + 3) & 3], c[i]);
        int j = i;
        while (inside(c[(j + 1) & 3])) j = (j + 1) & 3;
        int exit = edge_id(c[j], c[(j + 1) & 3]);
        next_edge[entry] = exit;  // directed segment entry -> exit
        has_seg[entry] = true;
      }
    }
    for (int e0 = 0; e0 < 12; ++e0) {
      if (!has_seg[e0]) continue;
      std::vector<int> loop;
      int e = e0;
      while (has_seg[e]) {
        loop.push_back(e);
        has_seg[e] = false;
        e = next_edge[e];
      }
      if (loop.size() >= 3) g_table.loops[mask].push_back(std::move(loop));
    }
  }
  return g_table;
  }();
  return g_table;
}

}  // namespace mc

}  // namespace

extern "C" {

// Table-based marching cubes over a dense (nx, ny, nz) float32 grid
// (C order, z fastest). Vertices in index space; shared-edge vertex dedup
// through the same cache as mt_extract, so the output is vertex-welded.
int mc_extract(const float *grid, int nx, int ny, int nz, float iso,
               double **out_verts, int **out_tris, int *out_nv, int *out_nt) {
  const auto &mc_table = mc::case_table();
  MeshAcc acc;
  auto val_at = [&](int x, int y, int z) {
    return (double)grid[((size_t)x * ny + y) * nz + z];
  };
  static const int CO[8][3] = {{0,0,0},{0,0,1},{0,1,0},{0,1,1},
                               {1,0,0},{1,0,1},{1,1,0},{1,1,1}};
  for (int x = 0; x < nx - 1; ++x)
    for (int y = 0; y < ny - 1; ++y)
      for (int z = 0; z < nz - 1; ++z) {
        double cv[8];
        uint64_t ck[8];
        V3 cp[8];
        int mask = 0;
        for (int c = 0; c < 8; ++c) {
          int cx = x + CO[c][0], cy = y + CO[c][1], cz = z + CO[c][2];
          cv[c] = val_at(cx, cy, cz);
          ck[c] = node_key(cx, cy, cz, ny, nz);
          cp[c] = V3{(double)cx, (double)cy, (double)cz};
          if (cv[c] > iso) mask |= 1 << c;
        }
        if (mask == 0 || mask == 255) continue;
        for (const auto &loop : mc_table.loops[mask]) {
          int first = -1, prev = -1;
          for (size_t i = 0; i < loop.size(); ++i) {
            int e = loop[i];
            int a = mc::EDGE_V[e][0], b = mc::EDGE_V[e][1];
            int vid = acc.edge_vertex(ck[a], ck[b], cp[a], cp[b],
                                      cv[a], cv[b], iso);
            if (i == 0) {
              first = vid;
            } else if (i >= 2) {
              acc.tris.push_back(first);
              acc.tris.push_back(prev);
              acc.tris.push_back(vid);
            }
            prev = vid;
          }
        }
      }
  *out_nv = (int)(acc.verts.size() / 3);
  *out_nt = (int)(acc.tris.size() / 3);
  double *v = new double[acc.verts.size()];
  int *t = new int[acc.tris.size()];
  std::memcpy(v, acc.verts.data(), acc.verts.size() * sizeof(double));
  std::memcpy(t, acc.tris.data(), acc.tris.size() * sizeof(int));
  *out_verts = v;
  *out_tris = t;
  return 0;
}

// Marching tetrahedra over a dense (nx, ny, nz) float32 grid (C order,
// z fastest). Vertices come back in index space [0, n-1]. Two-call-free
// interface: the library owns the buffers until mesh_free.
int mt_extract(const float *grid, int nx, int ny, int nz, float iso,
               double **out_verts, int **out_tris, int *out_nv, int *out_nt) {
  MeshAcc acc;
  auto val_at = [&](int x, int y, int z) {
    return (double)grid[((size_t)x * ny + y) * nz + z];
  };
  // corner offsets in c = dx*4 + dy*2 + dz encoding
  static const int CO[8][3] = {{0,0,0},{0,0,1},{0,1,0},{0,1,1},
                               {1,0,0},{1,0,1},{1,1,0},{1,1,1}};
  // 6-tetra split of the cube around main diagonal 0-7
  static const int TET[6][4] = {
      {0,7,3,1},{0,7,1,5},{0,7,5,4},{0,7,4,6},{0,7,6,2},{0,7,2,3}};
  for (int x = 0; x < nx - 1; ++x)
    for (int y = 0; y < ny - 1; ++y)
      for (int z = 0; z < nz - 1; ++z) {
        double cv[8];
        uint64_t ck[8];
        V3 cp[8];
        bool any_in = false, any_out = false;
        for (int c = 0; c < 8; ++c) {
          int cx = x + CO[c][0], cy = y + CO[c][1], cz = z + CO[c][2];
          cv[c] = val_at(cx, cy, cz);
          ck[c] = node_key(cx, cy, cz, ny, nz);
          cp[c] = V3{(double)cx, (double)cy, (double)cz};
          (cv[c] > iso ? any_in : any_out) = true;
        }
        if (!any_in || !any_out) continue;
        for (int t = 0; t < 6; ++t) {
          uint64_t keys[4];
          V3 pos[4];
          double val[4];
          for (int i = 0; i < 4; ++i) {
            keys[i] = ck[TET[t][i]];
            pos[i] = cp[TET[t][i]];
            val[i] = cv[TET[t][i]];
          }
          do_tetra(acc, keys, pos, val, iso);
        }
      }
  *out_nv = (int)(acc.verts.size() / 3);
  *out_nt = (int)(acc.tris.size() / 3);
  double *v = new double[acc.verts.size()];
  int *t = new int[acc.tris.size()];
  std::memcpy(v, acc.verts.data(), acc.verts.size() * sizeof(double));
  std::memcpy(t, acc.tris.data(), acc.tris.size() * sizeof(int));
  *out_verts = v;
  *out_tris = t;
  return 0;
}

void mesh_free(double *verts, int *tris) {
  delete[] verts;
  delete[] tris;
}

// ------------------------------------------------------------ voxelizer
// Triangle/AABB SAT overlap (the tribox2.h test of `external/libvoxelize`,
// reimplemented from the separating-axis theorem).
static bool tri_box_overlap(const double c[3], const double h[3],
                            const double tv[3][3]) {
  // tolerance against rounding on exactly-touching geometry (axis-aligned
  // faces landing on voxel boundaries reject by ~1e-17 otherwise)
  const double eps = 1e-9 * (h[0] + h[1] + h[2]);
  double v[3][3];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) v[i][j] = tv[i][j] - c[j];
  double e[3][3];
  for (int j = 0; j < 3; ++j) {
    e[0][j] = v[1][j] - v[0][j];
    e[1][j] = v[2][j] - v[1][j];
    e[2][j] = v[0][j] - v[2][j];
  }
  // 9 cross-product axes
  for (int i = 0; i < 3; ++i) {
    for (int a = 0; a < 3; ++a) {
      int a1 = (a + 1) % 3, a2 = (a + 2) % 3;
      // axis = cross(unit_a, e_i) -> components: axis[a]=0,
      // axis[a1]=-e[i][a2], axis[a2]=e[i][a1]
      double p0 = -e[i][a2] * v[0][a1] + e[i][a1] * v[0][a2];
      double p1 = -e[i][a2] * v[1][a1] + e[i][a1] * v[1][a2];
      double p2 = -e[i][a2] * v[2][a1] + e[i][a1] * v[2][a2];
      double mn = std::min(p0, std::min(p1, p2));
      double mx = std::max(p0, std::max(p1, p2));
      double rad = h[a1] * std::fabs(e[i][a2]) + h[a2] * std::fabs(e[i][a1]);
      if (mn > rad + eps || mx < -rad - eps) return false;
    }
  }
  // box face normals
  for (int j = 0; j < 3; ++j) {
    double mn = std::min(v[0][j], std::min(v[1][j], v[2][j]));
    double mx = std::max(v[0][j], std::max(v[1][j], v[2][j]));
    if (mn > h[j] + eps || mx < -h[j] - eps) return false;
  }
  // triangle normal
  double n[3] = {e[0][1] * e[1][2] - e[0][2] * e[1][1],
                 e[0][2] * e[1][0] - e[0][0] * e[1][2],
                 e[0][0] * e[1][1] - e[0][1] * e[1][0]};
  double d = -(n[0] * v[0][0] + n[1] * v[0][1] + n[2] * v[0][2]);
  double r = h[0] * std::fabs(n[0]) + h[1] * std::fabs(n[1]) +
             h[2] * std::fabs(n[2]);
  double s = n[0] * 0 + n[1] * 0 + n[2] * 0 + d;  // plane at box center
  return std::fabs(s) <= r + eps;
}

// Surface-voxelize a triangle mesh into a (nx, ny, nz) uint8 grid.
// Cell (i,j,k) spans origin + [i,i+1)*voxel_size etc.
void voxelize_surface(const double *verts, int nv, const int *tris, int nt,
                      const double *origin, double voxel_size, int nx, int ny,
                      int nz, uint8_t *out) {
  (void)nv;
  for (int t = 0; t < nt; ++t) {
    double tv[3][3];
    double mn[3] = {1e30, 1e30, 1e30}, mx[3] = {-1e30, -1e30, -1e30};
    for (int i = 0; i < 3; ++i) {
      const double *p = verts + 3 * tris[3 * t + i];
      for (int j = 0; j < 3; ++j) {
        tv[i][j] = p[j];
        mn[j] = std::min(mn[j], p[j]);
        mx[j] = std::max(mx[j], p[j]);
      }
    }
    int lo[3], hi[3];
    const int dims[3] = {nx, ny, nz};
    for (int j = 0; j < 3; ++j) {
      lo[j] = std::max(0, (int)std::floor((mn[j] - origin[j]) / voxel_size));
      hi[j] = std::min(dims[j] - 1,
                       (int)std::floor((mx[j] - origin[j]) / voxel_size));
    }
    double hs[3] = {voxel_size / 2, voxel_size / 2, voxel_size / 2};
    for (int i = lo[0]; i <= hi[0]; ++i)
      for (int j = lo[1]; j <= hi[1]; ++j)
        for (int k = lo[2]; k <= hi[2]; ++k) {
          size_t idx = ((size_t)i * ny + j) * nz + k;
          if (out[idx]) continue;
          double c[3] = {origin[0] + (i + 0.5) * voxel_size,
                         origin[1] + (j + 0.5) * voxel_size,
                         origin[2] + (k + 0.5) * voxel_size};
          if (tri_box_overlap(c, hs, tv)) out[idx] = 1;
        }
  }
}

// Mark interior cells: flood-fill the exterior from the boundary through
// non-surface cells; everything not reached and not surface is interior.
void fill_interior(const uint8_t *surface, int nx, int ny, int nz,
                   uint8_t *interior) {
  size_t n = (size_t)nx * ny * nz;
  std::vector<uint8_t> outside(n, 0);
  std::deque<int64_t> queue;
  auto idx_of = [&](int x, int y, int z) {
    return ((int64_t)x * ny + y) * nz + z;
  };
  auto push = [&](int x, int y, int z) {
    if (x < 0 || y < 0 || z < 0 || x >= nx || y >= ny || z >= nz) return;
    int64_t i = idx_of(x, y, z);
    if (outside[i] || surface[i]) return;
    outside[i] = 1;
    queue.push_back(i);
  };
  for (int x = 0; x < nx; ++x)
    for (int y = 0; y < ny; ++y) {
      push(x, y, 0);
      push(x, y, nz - 1);
    }
  for (int x = 0; x < nx; ++x)
    for (int z = 0; z < nz; ++z) {
      push(x, 0, z);
      push(x, ny - 1, z);
    }
  for (int y = 0; y < ny; ++y)
    for (int z = 0; z < nz; ++z) {
      push(0, y, z);
      push(nx - 1, y, z);
    }
  while (!queue.empty()) {
    int64_t i = queue.front();
    queue.pop_front();
    int z = (int)(i % nz), y = (int)((i / nz) % ny), x = (int)(i / ((int64_t)ny * nz));
    push(x + 1, y, z);
    push(x - 1, y, z);
    push(x, y + 1, z);
    push(x, y - 1, z);
    push(x, y, z + 1);
    push(x, y, z - 1);
  }
  for (size_t i = 0; i < n; ++i)
    interior[i] = (!outside[i] && !surface[i]) ? 1 : 0;
}

// Point-in-mesh by +z ray-crossing parity (the `external/libmesh`
// triangle-hash containment, with a 2D cell grid accelerator).
void points_in_mesh(const double *verts, int nv, const int *tris, int nt,
                    const double *points, int np, uint8_t *out) {
  (void)nv;
  // 2D hash over (x, y)
  double mn[2] = {1e30, 1e30}, mx[2] = {-1e30, -1e30};
  for (int t = 0; t < nt; ++t)
    for (int i = 0; i < 3; ++i) {
      const double *p = verts + 3 * tris[3 * t + i];
      for (int j = 0; j < 2; ++j) {
        mn[j] = std::min(mn[j], p[j]);
        mx[j] = std::max(mx[j], p[j]);
      }
    }
  int res = std::max(8, (int)std::sqrt((double)nt));
  res = std::min(res, 512);
  double sx = (mx[0] - mn[0]) / res + 1e-12, sy = (mx[1] - mn[1]) / res + 1e-12;
  std::vector<std::vector<int>> cells((size_t)res * res);
  auto cell_of = [&](double x, double y, int &cx, int &cy) {
    cx = (int)((x - mn[0]) / sx);
    cy = (int)((y - mn[1]) / sy);
  };
  for (int t = 0; t < nt; ++t) {
    double tmn[2] = {1e30, 1e30}, tmx[2] = {-1e30, -1e30};
    for (int i = 0; i < 3; ++i) {
      const double *p = verts + 3 * tris[3 * t + i];
      for (int j = 0; j < 2; ++j) {
        tmn[j] = std::min(tmn[j], p[j]);
        tmx[j] = std::max(tmx[j], p[j]);
      }
    }
    int c0x, c0y, c1x, c1y;
    cell_of(tmn[0], tmn[1], c0x, c0y);
    cell_of(tmx[0], tmx[1], c1x, c1y);
    for (int cx = std::max(0, c0x); cx <= std::min(res - 1, c1x); ++cx)
      for (int cy = std::max(0, c0y); cy <= std::min(res - 1, c1y); ++cy)
        cells[(size_t)cx * res + cy].push_back(t);
  }
  for (int p = 0; p < np; ++p) {
    // tiny deterministic jitter keeps the ray off shared edges/vertices
    // (a lattice-aligned query would double-count crossings)
    double x = points[3 * p] + 3.1e-7, y = points[3 * p + 1] + 1.7e-7,
           z = points[3 * p + 2];
    out[p] = 0;
    if (x < mn[0] || x > mx[0] || y < mn[1] || y > mx[1]) continue;
    int cx, cy;
    cell_of(x, y, cx, cy);
    if (cx < 0 || cy < 0 || cx >= res || cy >= res) continue;
    int crossings = 0;
    for (int t : cells[(size_t)cx * res + cy]) {
      const double *a = verts + 3 * tris[3 * t];
      const double *b = verts + 3 * tris[3 * t + 1];
      const double *c = verts + 3 * tris[3 * t + 2];
      // 2D barycentric test in (x, y)
      double d = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1]);
      if (std::fabs(d) < 1e-30) continue;
      double l1 = ((b[1] - c[1]) * (x - c[0]) + (c[0] - b[0]) * (y - c[1])) / d;
      double l2 = ((c[1] - a[1]) * (x - c[0]) + (a[0] - c[0]) * (y - c[1])) / d;
      double l3 = 1.0 - l1 - l2;
      if (l1 < 0 || l2 < 0 || l3 < 0) continue;
      double tz = l1 * a[2] + l2 * b[2] + l3 * c[2];
      if (tz > z) crossings++;
    }
    out[p] = (uint8_t)(crossings & 1);
  }
}

}  // extern "C"

// ------------------------------------------------------------------- MISE
// Multi-resolution iso-surface extraction octree (`external/libmise/
// mise.pyx` rebuilt; the reference keeps this in Cython/C++ too). The
// Python lock-step driver (meshing/mise.py) owns one handle per proposal;
// the hot bookkeeping (frontier advance, ancestor fill) runs here.
// Semantics are identical to the Python MISE class: query() returns the
// unknown lattice points in lexicographic order (matching np.unique), a
// voxel subdivides iff all 8 corners are known and their signs are mixed,
// and to_dense() fills unknowns from the coarsest known floor-aligned
// ancestor, level by level.

struct MiseTree {
  int res0, depth, R, level;
  double threshold;
  std::vector<double> values;  // (R+1)^3, NaN = unknown
  std::vector<int64_t> pending;  // flat lattice ids, ascending

  inline size_t id(int64_t x, int64_t y, int64_t z) const {
    return ((size_t)x * (R + 1) + y) * (R + 1) + z;
  }
  inline bool known(size_t i) const { return !std::isnan(values[i]); }

  MiseTree(int r0, int d, double thr)
      : res0(r0), depth(d), R(r0 << d), level(0), threshold(thr),
        values(((size_t)R + 1) * (R + 1) * (R + 1),
               std::numeric_limits<double>::quiet_NaN()) {
    int64_t step = (int64_t)1 << depth;
    for (int64_t x = 0; x <= R; x += step)
      for (int64_t y = 0; y <= R; y += step)
        for (int64_t z = 0; z <= R; z += step)
          pending.push_back((int64_t)id(x, y, z));
  }

  void advance() {
    if (level >= depth) {
      pending.clear();
      return;
    }
    int64_t s = (int64_t)1 << (depth - level);  // voxel edge at this level
    int64_t n = R / s, h = s / 2;
    std::vector<int64_t> next;
    for (int64_t i = 0; i < n; ++i)
      for (int64_t j = 0; j < n; ++j)
        for (int64_t k = 0; k < n; ++k) {
          int occ = 0, kn = 0;
          for (int dx = 0; dx <= 1; ++dx)
            for (int dy = 0; dy <= 1; ++dy)
              for (int dz = 0; dz <= 1; ++dz) {
                size_t c = id((i + dx) * s, (j + dy) * s, (k + dz) * s);
                if (known(c)) {
                  ++kn;
                  if (values[c] >= threshold) ++occ;
                }
              }
          if (kn == 8 && occ > 0 && occ < 8) {
            // queue the unknown points of the voxel's 3x3x3 half-stride
            // child lattice
            for (int64_t a = 0; a <= 2; ++a)
              for (int64_t b = 0; b <= 2; ++b)
                for (int64_t c = 0; c <= 2; ++c) {
                  size_t p =
                      id(i * s + a * h, j * s + b * h, k * s + c * h);
                  if (!known(p)) next.push_back((int64_t)p);
                }
          }
        }
    std::sort(next.begin(), next.end());
    next.erase(std::unique(next.begin(), next.end()), next.end());
    pending.swap(next);
    ++level;
    if (pending.empty() && level < depth) advance();
  }

  void to_dense(float *out) const {
    std::vector<double> v(values);
    for (int lvl = 0; lvl < depth; ++lvl) {
      int64_t s = (int64_t)1 << (depth - lvl), h = s / 2;
      for (int64_t x = 0; x <= R; x += h)
        for (int64_t y = 0; y <= R; y += h)
          for (int64_t z = 0; z <= R; z += h) {
            size_t p = id(x, y, z);
            if (std::isnan(v[p]))
              v[p] = v[id(x / s * s, y / s * s, z / s * s)];
          }
    }
    for (size_t i = 0; i < v.size(); ++i) out[i] = (float)v[i];
  }
};

extern "C" {

void *mise_create(int resolution_0, int depth, double threshold) {
  return new MiseTree(resolution_0, depth, threshold);
}

void mise_destroy(void *h) { delete (MiseTree *)h; }

// Write up to `cap` pending lattice points (x,y,z triples, ascending
// lexicographic) into out_pts; returns the number pending. Pending points
// are by construction unknown (update() only queues unknowns).
int mise_query(void *h, int64_t *out_pts, int cap) {
  MiseTree &t = *(MiseTree *)h;
  int n = (int)t.pending.size();
  int m = n < cap ? n : cap;
  int64_t r1 = t.R + 1;
  for (int i = 0; i < m; ++i) {
    int64_t f = t.pending[i];
    out_pts[3 * i + 2] = f % r1;
    out_pts[3 * i + 1] = (f / r1) % r1;
    out_pts[3 * i] = f / (r1 * r1);
  }
  return n;
}

// Store values for the given lattice points and advance the frontier.
void mise_update(void *h, const int64_t *pts, const double *vals, int n) {
  MiseTree &t = *(MiseTree *)h;
  for (int i = 0; i < n; ++i)
    t.values[t.id(pts[3 * i], pts[3 * i + 1], pts[3 * i + 2])] = vals[i];
  t.advance();
}

void mise_to_dense(void *h, float *out) { ((MiseTree *)h)->to_dense(out); }

// Marching cubes directly from the device-MISE sparse outputs for ONE
// proposal — no dense-grid materialization on the Python side. Produces
// BYTE-IDENTICAL vertices/triangles to `mc_extract` over the
// -1e6-padded dense reconstruction (meshing/mise_device.py
// reconstruct_dense -> generator.extract_mesh): the lattice is rebuilt
// here (scatter + the exact ancestor-fill replay of the device
// to_dense rule), a one-byte sign is precomputed per padded lattice
// point, and every padded cell is scanned in the dense loop's
// lexicographic order — uniform-sign cells cost an 8-byte check, mixed
// cells run the same welded tessellation — so vertex ids come out
// equal, not merely equivalent. (A one-ring candidate heuristic is NOT
// sound here: ancestor fill at finer levels floors odd coordinates
// back onto decoded face values, propagating them up to 2^steps-1
// cells beyond a refined block and creating crossings outside any
// fixed-margin ring.)
//
// Inputs: lvl0 = (res0+1)^3 f32 corner lattice (C order); idx/vals =
// per-level refined-voxel linear ids (over the (res0*2^l)^3 voxel grid)
// and their 27-point child-lattice values, levels concatenated with
// level_counts[l] entries each; vals in the (0,h,s)^3 a-major offset
// order of mise_device._offsets. iso in logit units; pad_val the
// boundary closing value (-1e6). Vertices in PADDED index space.
int mise_mc_extract(const float *lvl0, int res0, int steps,
                    const int32_t *idx, const float *vals,
                    const int32_t *level_counts, float iso, float pad_val,
                    double **out_verts, int **out_tris,
                    int *out_nv, int *out_nt) {
  const int R = res0 << steps;
  const int R1 = R + 1;
  const size_t n_lat = (size_t)R1 * R1 * R1;
  std::vector<float> val(n_lat);
  std::vector<uint8_t> kn(n_lat, 0);
  auto lat = [R1](int x, int y, int z) {
    return ((size_t)x * R1 + y) * R1 + z;
  };

  // ---- scatter level 0
  const int n01 = res0 + 1;
  for (int x = 0; x <= res0; ++x)
    for (int y = 0; y <= res0; ++y)
      for (int z = 0; z <= res0; ++z) {
        size_t p = lat(x << steps, y << steps, z << steps);
        val[p] = lvl0[((size_t)x * n01 + y) * n01 + z];
        kn[p] = 1;
      }

  // ---- scatter refinement levels
  const int CN = R + 2;  // padded cell grid side
  const int32_t *idx_l = idx;
  const float *vals_l = vals;
  for (int l = 0; l < steps; ++l) {
    const int s = 1 << (steps - l), h = s >> 1;
    const int off[3] = {0, h, s};
    const int64_t n = (int64_t)res0 << l;
    const int m = level_counts[l];
    for (int e = 0; e < m; ++e) {
      int64_t v = idx_l[e];
      int bi = (int)(v / (n * n)) * s;
      int bj = (int)((v / n) % n) * s;
      int bk = (int)(v % n) * s;
      const float *w = vals_l + (size_t)e * 27;
      int q = 0;
      for (int a = 0; a <= 2; ++a)
        for (int b = 0; b <= 2; ++b)
          for (int c = 0; c <= 2; ++c, ++q) {
            size_t p = lat(bi + off[a], bj + off[b], bk + off[c]);
            val[p] = w[q];
            kn[p] = 1;
          }
    }
    idx_l += m;
    vals_l += (size_t)m * 27;
  }

  // ---- ancestor fill (exact replay of the device to_dense rule)
  for (int l = 0; l < steps; ++l) {
    const int s = 1 << (steps - l), h = s >> 1;
    for (int x = 0; x <= R; x += h)
      for (int y = 0; y <= R; y += h)
        for (int z = 0; z <= R; z += h) {
          size_t p = lat(x, y, z);
          if (!kn[p]) {
            val[p] = val[lat(x / s * s, y / s * s, z / s * s)];
            kn[p] = 1;
          }
        }
  }

  // ---- precompute one sign byte per padded lattice point; a cell
  // whose 8 corner bytes agree cannot cross the iso and is skipped
  // with no double loads
  const int P = R + 3;  // padded lattice side
  auto val_at = [&](int x, int y, int z) -> double {
    if (x == 0 || y == 0 || z == 0 || x == P - 1 || y == P - 1 ||
        z == P - 1)
      return (double)pad_val;
    return (double)val[lat(x - 1, y - 1, z - 1)];
  };
  std::vector<uint8_t> sgn((size_t)P * P * P);
  const uint8_t pad_sgn = (double)pad_val > iso ? 1 : 0;
  std::fill(sgn.begin(), sgn.end(), pad_sgn);
  for (int x = 1; x < P - 1; ++x)
    for (int y = 1; y < P - 1; ++y) {
      uint8_t *row = &sgn[((size_t)x * P + y) * P + 1];
      const float *vrow = &val[lat(x - 1, y - 1, 0)];
      for (int z = 0; z < P - 2; ++z)
        row[z] = (double)vrow[z] > iso ? 1 : 0;
    }

  // ---- marching cubes over all padded cells, lexicographic order
  const auto &mc_table = mc::case_table();
  MeshAcc acc;
  static const int CO[8][3] = {{0,0,0},{0,0,1},{0,1,0},{0,1,1},
                               {1,0,0},{1,0,1},{1,1,0},{1,1,1}};
  const size_t SX = (size_t)P * P, SY = P;
  for (int x = 0; x < CN; ++x)
    for (int y = 0; y < CN; ++y) {
      const uint8_t *s00 = &sgn[(size_t)x * SX + (size_t)y * SY];
      const uint8_t *s01 = s00 + SY, *s10 = s00 + SX, *s11 = s10 + SY;
      for (int z = 0; z < CN; ++z) {
        uint8_t first_s = s00[z];
        if (s00[z + 1] == first_s && s01[z] == first_s &&
            s01[z + 1] == first_s && s10[z] == first_s &&
            s10[z + 1] == first_s && s11[z] == first_s &&
            s11[z + 1] == first_s)
          continue;
        double cv[8];
        uint64_t ck[8];
        V3 cp[8];
        int cmask = 0;
        for (int c = 0; c < 8; ++c) {
          int cx = x + CO[c][0], cy = y + CO[c][1], cz = z + CO[c][2];
          cv[c] = val_at(cx, cy, cz);
          ck[c] = node_key(cx, cy, cz, P, P);
          cp[c] = V3{(double)cx, (double)cy, (double)cz};
          if (cv[c] > iso) cmask |= 1 << c;
        }
        if (cmask == 0 || cmask == 255) continue;
        for (const auto &loop : mc_table.loops[cmask]) {
          int first = -1, prev = -1;
          for (size_t i = 0; i < loop.size(); ++i) {
            int e = loop[i];
            int a = mc::EDGE_V[e][0], b = mc::EDGE_V[e][1];
            int vid = acc.edge_vertex(ck[a], ck[b], cp[a], cp[b],
                                      cv[a], cv[b], iso);
            if (i == 0) {
              first = vid;
            } else if (i >= 2) {
              acc.tris.push_back(first);
              acc.tris.push_back(prev);
              acc.tris.push_back(vid);
            }
            prev = vid;
          }
        }
      }
    }
  *out_nv = (int)(acc.verts.size() / 3);
  *out_nt = (int)(acc.tris.size() / 3);
  double *ov = new double[acc.verts.size()];
  int *ot = new int[acc.tris.size()];
  std::memcpy(ov, acc.verts.data(), acc.verts.size() * sizeof(double));
  std::memcpy(ot, acc.tris.data(), acc.tris.size() * sizeof(int));
  *out_verts = ov;
  *out_tris = ot;
  return 0;
}

}  // extern "C"

// rfdnet_tpu native offline-prep library.
//
// Host-side equivalents of the reference's GPU/GL prep extensions
// (SURVEY §2.2): N9 quadric-error-metric mesh simplification
// (external/libsimplify), N14 offscreen depth rasterization
// (external/librender, OSMesa), N13 projective TSDF fusion
// (external/pyfusion, CUDA). All written from scratch against the
// published algorithms (Garland–Heckbert QEM collapse; z-buffer
// barycentric rasterization; Curless–Levoy truncated signed distance
// averaging), OpenMP-parallel, exposed through a C ABI for ctypes.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

// ------------------------------------------------------------------- QEM
// Symmetric 4x4 quadric, 10 coefficients.
struct Quadric {
  double m[10];
  Quadric() { std::memset(m, 0, sizeof(m)); }
  void add(const Quadric &o) {
    for (int i = 0; i < 10; ++i) m[i] += o.m[i];
  }
  static Quadric plane(double a, double b, double c, double d) {
    Quadric q;
    q.m[0] = a * a; q.m[1] = a * b; q.m[2] = a * c; q.m[3] = a * d;
    q.m[4] = b * b; q.m[5] = b * c; q.m[6] = b * d;
    q.m[7] = c * c; q.m[8] = c * d;
    q.m[9] = d * d;
    return q;
  }
  double eval(double x, double y, double z) const {
    return m[0] * x * x + 2 * m[1] * x * y + 2 * m[2] * x * z +
           2 * m[3] * x + m[4] * y * y + 2 * m[5] * y * z + 2 * m[6] * y +
           m[7] * z * z + 2 * m[8] * z + m[9];
  }
};

struct SVert {
  double p[3];
  Quadric q;
  bool border = false;
  int tstart = 0, tcount = 0;
};

struct STri {
  int v[3];
  double err[4];
  bool deleted = false, dirty = false;
  double n[3];
};

struct SRef {
  int tid, tvertex;
};

struct Simplifier {
  std::vector<SVert> verts;
  std::vector<STri> tris;
  std::vector<SRef> refs;

  void compute_normal(STri &t) {
    const double *p0 = verts[t.v[0]].p, *p1 = verts[t.v[1]].p,
                 *p2 = verts[t.v[2]].p;
    double e1[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
    double e2[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
    double n[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                   e1[2] * e2[0] - e1[0] * e2[2],
                   e1[0] * e2[1] - e1[1] * e2[0]};
    double l = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
    if (l < 1e-30) l = 1.0;
    t.n[0] = n[0] / l; t.n[1] = n[1] / l; t.n[2] = n[2] / l;
  }

  // error of collapsing edge (a, b); best position out in pr
  double calc_error(int a, int b, double pr[3]) {
    Quadric q = verts[a].q;
    q.add(verts[b].q);
    // try midpoint / endpoints (robust; skips the 4x4 solve of the full
    // algorithm — quality difference is negligible at our targets)
    const double *pa = verts[a].p, *pb = verts[b].p;
    double cand[3][3] = {
        {pa[0], pa[1], pa[2]},
        {pb[0], pb[1], pb[2]},
        {(pa[0] + pb[0]) / 2, (pa[1] + pb[1]) / 2, (pa[2] + pb[2]) / 2}};
    double best = 1e300;
    for (auto &c : cand) {
      double e = q.eval(c[0], c[1], c[2]);
      if (e < best) {
        best = e;
        pr[0] = c[0]; pr[1] = c[1]; pr[2] = c[2];
      }
    }
    return best;
  }

  bool flipped(const double p[3], int i0, int i1, SVert &v0,
               std::vector<bool> &deleted_mark) {
    for (int k = 0; k < v0.tcount; ++k) {
      STri &t = tris[refs[v0.tstart + k].tid];
      if (t.deleted) continue;
      int s = refs[v0.tstart + k].tvertex;
      int id1 = t.v[(s + 1) % 3], id2 = t.v[(s + 2) % 3];
      if (id1 == i1 || id2 == i1) {  // triangle vanishes
        deleted_mark[k] = true;
        continue;
      }
      double d1[3] = {verts[id1].p[0] - p[0], verts[id1].p[1] - p[1],
                      verts[id1].p[2] - p[2]};
      double d2[3] = {verts[id2].p[0] - p[0], verts[id2].p[1] - p[1],
                      verts[id2].p[2] - p[2]};
      double l1 = std::sqrt(d1[0]*d1[0]+d1[1]*d1[1]+d1[2]*d1[2]);
      double l2 = std::sqrt(d2[0]*d2[0]+d2[1]*d2[1]+d2[2]*d2[2]);
      if (l1 < 1e-30 || l2 < 1e-30) return true;
      for (int j = 0; j < 3; ++j) { d1[j] /= l1; d2[j] /= l2; }
      double dot = d1[0]*d2[0]+d1[1]*d2[1]+d1[2]*d2[2];
      if (std::fabs(dot) > 0.999) return true;  // degenerate sliver
      double n[3] = {d1[1]*d2[2]-d1[2]*d2[1], d1[2]*d2[0]-d1[0]*d2[2],
                     d1[0]*d2[1]-d1[1]*d2[0]};
      double ln = std::sqrt(n[0]*n[0]+n[1]*n[1]+n[2]*n[2]);
      if (ln < 1e-30) return true;
      for (int j = 0; j < 3; ++j) n[j] /= ln;
      if (n[0]*t.n[0]+n[1]*t.n[1]+n[2]*t.n[2] < 0.2) return true;  // flip
    }
    return false;
  }

  void update_triangles(int i0, SVert &v, std::vector<bool> &deleted_mark,
                        int &deleted_tris) {
    double pr[3];
    for (int k = 0; k < v.tcount; ++k) {
      SRef &r = refs[v.tstart + k];
      STri &t = tris[r.tid];
      if (t.deleted) continue;
      if (deleted_mark[k]) {
        t.deleted = true;
        ++deleted_tris;
        continue;
      }
      t.v[r.tvertex] = i0;
      t.dirty = true;
      t.err[0] = calc_error(t.v[0], t.v[1], pr);
      t.err[1] = calc_error(t.v[1], t.v[2], pr);
      t.err[2] = calc_error(t.v[2], t.v[0], pr);
      t.err[3] = std::min(t.err[0], std::min(t.err[1], t.err[2]));
      refs.push_back(r);
    }
    // caller re-points v0's ref block at the newly-pushed refs
  }

  void update_mesh(int iteration) {
    if (iteration > 0) {  // compact triangle list
      size_t dst = 0;
      for (size_t i = 0; i < tris.size(); ++i)
        if (!tris[i].deleted) tris[dst++] = tris[i];
      tris.resize(dst);
    }
    for (auto &v : verts) { v.tstart = 0; v.tcount = 0; }
    for (auto &t : tris)
      for (int j = 0; j < 3; ++j) ++verts[t.v[j]].tcount;
    int tstart = 0;
    for (auto &v : verts) { v.tstart = tstart; tstart += v.tcount; v.tcount = 0; }
    refs.resize(tris.size() * 3);
    for (size_t i = 0; i < tris.size(); ++i)
      for (int j = 0; j < 3; ++j) {
        SVert &v = verts[tris[i].v[j]];
        refs[v.tstart + v.tcount] = {(int)i, j};
        ++v.tcount;
      }
    if (iteration == 0) {
      // initial quadrics + borders + edge errors
      for (auto &t : tris) {
        compute_normal(t);
        const double *p0 = verts[t.v[0]].p;
        double d = -(t.n[0]*p0[0] + t.n[1]*p0[1] + t.n[2]*p0[2]);
        Quadric q = Quadric::plane(t.n[0], t.n[1], t.n[2], d);
        for (int j = 0; j < 3; ++j) verts[t.v[j]].q.add(q);
      }
      // border detection: count directed edges
      std::vector<int> vcount, vids;
      for (auto &v : verts) {
        vcount.clear(); vids.clear();
        for (int k = 0; k < v.tcount; ++k) {
          STri &t = tris[refs[v.tstart + k].tid];
          for (int j = 0; j < 3; ++j) {
            int id = t.v[j];
            if (id == (&v - verts.data())) continue;
            size_t f;
            for (f = 0; f < vids.size(); ++f)
              if (vids[f] == id) break;
            if (f == vids.size()) { vids.push_back(id); vcount.push_back(1); }
            else ++vcount[f];
          }
        }
        for (size_t f = 0; f < vids.size(); ++f)
          if (vcount[f] == 1) { v.border = true; verts[vids[f]].border = true; }
      }
      double pr[3];
      for (auto &t : tris) {
        t.err[0] = calc_error(t.v[0], t.v[1], pr);
        t.err[1] = calc_error(t.v[1], t.v[2], pr);
        t.err[2] = calc_error(t.v[2], t.v[0], pr);
        t.err[3] = std::min(t.err[0], std::min(t.err[1], t.err[2]));
      }
    }
  }

  void simplify(int target_count, double aggressiveness) {
    for (auto &t : tris) t.deleted = false;
    int deleted_tris = 0;
    int tri_count = (int)tris.size();
    std::vector<bool> del0, del1;
    for (int iteration = 0; iteration < 100; ++iteration) {
      if (tri_count - deleted_tris <= target_count) break;
      if (iteration % 5 == 0) update_mesh(iteration);
      for (auto &t : tris) t.dirty = false;
      double threshold = 1e-9 * std::pow(iteration + 3.0, aggressiveness);
      for (auto &t : tris) {
        if (t.err[3] > threshold || t.deleted || t.dirty) continue;
        for (int j = 0; j < 3; ++j) {
          if (t.err[j] > threshold) continue;
          int i0 = t.v[j], i1 = t.v[(j + 1) % 3];
          SVert &v0 = verts[i0];
          SVert &v1 = verts[i1];
          if (v0.border != v1.border) continue;
          double p[3];
          calc_error(i0, i1, p);
          del0.assign(v0.tcount, false);
          del1.assign(v1.tcount, false);
          if (flipped(p, i0, i1, v0, del0)) continue;
          if (flipped(p, i1, i0, v1, del1)) continue;
          // collapse i1 -> i0 at p
          v0.p[0] = p[0]; v0.p[1] = p[1]; v0.p[2] = p[2];
          v0.q.add(v1.q);
          int tstart = (int)refs.size();
          update_triangles(i0, v0, del0, deleted_tris);
          update_triangles(i0, v1, del1, deleted_tris);
          int tcount = (int)refs.size() - tstart;
          if (tcount <= v0.tcount) {
            if (tcount)
              std::memmove(&refs[v0.tstart], &refs[tstart],
                           tcount * sizeof(SRef));
          } else {
            v0.tstart = tstart;
          }
          v0.tcount = tcount;
          break;
        }
        if (tri_count - deleted_tris <= target_count) break;
      }
    }
    // compact output
    size_t dst = 0;
    for (size_t i = 0; i < tris.size(); ++i)
      if (!tris[i].deleted) tris[dst++] = tris[i];
    tris.resize(dst);
    std::vector<int> remap(verts.size(), -1);
    std::vector<SVert> nv;
    for (auto &t : tris)
      for (int j = 0; j < 3; ++j) {
        if (remap[t.v[j]] < 0) {
          remap[t.v[j]] = (int)nv.size();
          nv.push_back(verts[t.v[j]]);
        }
        t.v[j] = remap[t.v[j]];
      }
    verts.swap(nv);
  }
};

}  // namespace

extern "C" {

// N9: QEM simplification. Returns library-owned buffers; free with
// prep_free.
int simplify_qem(const double *in_verts, int nv, const int *in_tris, int nt,
                 int target_faces, double aggressiveness, double **out_verts,
                 int **out_tris, int *out_nv, int *out_nt) {
  Simplifier s;
  s.verts.resize(nv);
  for (int i = 0; i < nv; ++i)
    for (int j = 0; j < 3; ++j) s.verts[i].p[j] = in_verts[3 * i + j];
  s.tris.resize(nt);
  for (int i = 0; i < nt; ++i)
    for (int j = 0; j < 3; ++j) s.tris[i].v[j] = in_tris[3 * i + j];
  s.simplify(target_faces, aggressiveness);
  *out_nv = (int)s.verts.size();
  *out_nt = (int)s.tris.size();
  double *v = new double[s.verts.size() * 3];
  int *t = new int[s.tris.size() * 3];
  for (size_t i = 0; i < s.verts.size(); ++i)
    for (int j = 0; j < 3; ++j) v[3 * i + j] = s.verts[i].p[j];
  for (size_t i = 0; i < s.tris.size(); ++i)
    for (int j = 0; j < 3; ++j) t[3 * i + j] = s.tris[i].v[j];
  *out_verts = v;
  *out_tris = t;
  return 0;
}

void prep_free(double *v, int *t) {
  delete[] v;
  delete[] t;
}

// N14: pinhole z-buffer depth render. pose: row-major 4x4 world->camera
// (+z looking forward). depth: H*W float32, 0 where no geometry.
void render_depth(const double *verts, int nv, const int *tris, int nt,
                  const double *pose, double f, double cx, double cy, int W,
                  int H, float *depth) {
  (void)nv;
  std::fill(depth, depth + (size_t)W * H, 0.0f);
  std::vector<double> cam(3 * (size_t)nv);
  for (int i = 0; i < nv; ++i) {
    const double *p = verts + 3 * i;
    for (int r = 0; r < 3; ++r)
      cam[3 * i + r] = pose[4 * r + 0] * p[0] + pose[4 * r + 1] * p[1] +
                       pose[4 * r + 2] * p[2] + pose[4 * r + 3];
  }
  for (int t = 0; t < nt; ++t) {
    const double *a = &cam[3 * tris[3 * t]];
    const double *b = &cam[3 * tris[3 * t + 1]];
    const double *c = &cam[3 * tris[3 * t + 2]];
    if (a[2] <= 1e-6 || b[2] <= 1e-6 || c[2] <= 1e-6) continue;
    double ax = f * a[0] / a[2] + cx, ay = f * a[1] / a[2] + cy;
    double bx = f * b[0] / b[2] + cx, by = f * b[1] / b[2] + cy;
    double gx = f * c[0] / c[2] + cx, gy = f * c[1] / c[2] + cy;
    int x0 = std::max(0, (int)std::floor(std::min({ax, bx, gx})));
    int x1 = std::min(W - 1, (int)std::ceil(std::max({ax, bx, gx})));
    int y0 = std::max(0, (int)std::floor(std::min({ay, by, gy})));
    int y1 = std::min(H - 1, (int)std::ceil(std::max({ay, by, gy})));
    double det = (bx - ax) * (gy - ay) - (gx - ax) * (by - ay);
    if (std::fabs(det) < 1e-12) continue;
    double iza = 1.0 / a[2], izb = 1.0 / b[2], izc = 1.0 / c[2];
    for (int y = y0; y <= y1; ++y)
      for (int x = x0; x <= x1; ++x) {
        double px = x + 0.5, py = y + 0.5;
        double w1 = ((px - ax) * (gy - ay) - (gx - ax) * (py - ay)) / det;
        double w2 = ((bx - ax) * (py - ay) - (px - ax) * (by - ay)) / det;
        double w0 = 1.0 - w1 - w2;
        if (w0 < 0 || w1 < 0 || w2 < 0) continue;
        // perspective-correct depth via inverse-z interpolation
        double iz = w0 * iza + w1 * izb + w2 * izc;
        float z = (float)(1.0 / iz);
        float &d = depth[(size_t)y * W + x];
        if (d == 0.0f || z < d) d = z;
      }
  }
}

// N13: projective TSDF fusion (Curless–Levoy averaging). depths: n views
// of H*W (0 = missing). poses: n row-major 4x4 world->camera. Voxel grid:
// res^3 over bbox [min, max]. tsdf out: res^3, truncated to [-1, 1]
// (units of `trunc`), unobserved voxels = +1 (empty-ish, like the
// reference's fusion convention where outside is positive).
void tsdf_fuse(const float *depths, int n_views, int H, int W,
               const double *poses, double f, double cx, double cy, int res,
               const double *bbox, double trunc, float *tsdf) {
  double vx = (bbox[3] - bbox[0]) / res;
  double vy = (bbox[4] - bbox[1]) / res;
  double vz = (bbox[5] - bbox[2]) / res;
#pragma omp parallel for schedule(static)
  for (int i = 0; i < res; ++i) {
    for (int j = 0; j < res; ++j)
      for (int k = 0; k < res; ++k) {
        double p[3] = {bbox[0] + (i + 0.5) * vx, bbox[1] + (j + 0.5) * vy,
                       bbox[2] + (k + 0.5) * vz};
        double acc = 0.0;
        double wsum = 0.0;
        for (int v = 0; v < n_views; ++v) {
          const double *M = poses + 16 * v;
          double cxp = M[0] * p[0] + M[1] * p[1] + M[2] * p[2] + M[3];
          double cyp = M[4] * p[0] + M[5] * p[1] + M[6] * p[2] + M[7];
          double czp = M[8] * p[0] + M[9] * p[1] + M[10] * p[2] + M[11];
          if (czp <= 1e-6) continue;
          int u = (int)(f * cxp / czp + cx);
          int w = (int)(f * cyp / czp + cy);
          if (u < 0 || u >= W || w < 0 || w >= H) continue;
          float d = depths[((size_t)v * H + w) * W + u];
          if (d <= 0.0f) continue;
          double sdf = (d - czp) / trunc;  // + in front of surface
          if (sdf < -1.0) continue;        // occluded beyond truncation
          acc += std::min(sdf, 1.0);
          wsum += 1.0;
        }
        tsdf[((size_t)i * res + j) * res + k] =
            (float)(wsum > 0 ? acc / wsum : 1.0);
      }
  }
}

}  // extern "C"

// ------------------------------------------------------------- N12 kdtree
// Compact 3-D KD-tree (median split, implicit balanced layout) with k-NN
// query — the `external/libkdtree/pykdtree` role (OpenMP-parallel queries).
namespace {

struct KDTreeImpl {
  std::vector<double> pts;   // (n, 3)
  std::vector<int> idx;      // permutation, tree in in-order layout
  int n = 0;

  void build(const double *p, int count) {
    n = count;
    pts.assign(p, p + 3 * (size_t)count);
    idx.resize(count);
    for (int i = 0; i < count; ++i) idx[i] = i;
    build_rec(0, count, 0);
  }

  void build_rec(int lo, int hi, int axis) {
    if (hi - lo <= 1) return;
    int mid = (lo + hi) / 2;
    std::nth_element(
        idx.begin() + lo, idx.begin() + mid, idx.begin() + hi,
        [&](int a, int b) { return pts[3 * a + axis] < pts[3 * b + axis]; });
    build_rec(lo, mid, (axis + 1) % 3);
    build_rec(mid + 1, hi, (axis + 1) % 3);
  }

  void knn(const double *q, int k, double *out_d2, int *out_i) const {
    // bounded max-heap over (d2, idx)
    std::vector<std::pair<double, int>> heap;
    heap.reserve(k + 1);
    query_rec(q, k, 0, n, 0, heap);
    std::sort_heap(heap.begin(), heap.end());
    for (int i = 0; i < k; ++i) {
      if (i < (int)heap.size()) {
        out_d2[i] = heap[i].first;
        out_i[i] = heap[i].second;
      } else {
        out_d2[i] = 1e300;
        out_i[i] = -1;
      }
    }
  }

  void query_rec(const double *q, int k, int lo, int hi, int axis,
                 std::vector<std::pair<double, int>> &heap) const {
    if (lo >= hi) return;
    int mid = (lo + hi) / 2;
    int id = idx[mid];
    double dx = q[0] - pts[3 * id], dy = q[1] - pts[3 * id + 1],
           dz = q[2] - pts[3 * id + 2];
    double d2 = dx * dx + dy * dy + dz * dz;
    if ((int)heap.size() < k) {
      heap.emplace_back(d2, id);
      std::push_heap(heap.begin(), heap.end());
    } else if (d2 < heap.front().first) {
      std::pop_heap(heap.begin(), heap.end());
      heap.back() = {d2, id};
      std::push_heap(heap.begin(), heap.end());
    }
    double delta = q[axis] - pts[3 * id + axis];
    int next = (axis + 1) % 3;
    if (delta < 0) {
      query_rec(q, k, lo, mid, next, heap);
      if ((int)heap.size() < k || delta * delta < heap.front().first)
        query_rec(q, k, mid + 1, hi, next, heap);
    } else {
      query_rec(q, k, mid + 1, hi, next, heap);
      if ((int)heap.size() < k || delta * delta < heap.front().first)
        query_rec(q, k, lo, mid, next, heap);
    }
  }
};

}  // namespace

extern "C" {

void *kdtree_build(const double *pts, int n) {
  auto *t = new KDTreeImpl();
  t->build(pts, n);
  return t;
}

void kdtree_query(void *tree, const double *queries, int nq, int k,
                  double *out_d2, int *out_idx) {
  auto *t = (KDTreeImpl *)tree;
#pragma omp parallel for schedule(static)
  for (int i = 0; i < nq; ++i)
    t->knn(queries + 3 * (size_t)i, k, out_d2 + (size_t)i * k,
           out_idx + (size_t)i * k);
}

void kdtree_free(void *tree) { delete (KDTreeImpl *)tree; }

}  // extern "C"

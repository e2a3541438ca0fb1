// Isosurface extraction by marching tetrahedra with shared-vertex dedup.
//
// TPU-native equivalent of the reference's PyMCubes dependency
// (/root/reference/models/modules/implicit_surface.py:423
// `mcubes.marching_cubes(u, threshold)`): the SDF grid is evaluated on
// device in blocks; this host-side native kernel turns the grid into a
// triangle mesh. Marching tetrahedra (6-tet cube decomposition) produces
// exactly the same linearly-interpolated isosurface as marching cubes —
// denser triangulation, no 256-case tables, and inherently watertight.
//
// C ABI for ctypes. Vertices are emitted in grid-index space
// (0..n-1 per axis), matching mcubes conventions so callers rescale with
// (bound_max - bound_min) / (res - 1) exactly as the reference does
// (implicit_surface.py:426).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

// The 6-tetrahedra decomposition of a cube, using cube-corner indices
// with corner c = (dx, dy, dz) encoded as dx*4 + dy*2 + dz.
// All six tets share the main diagonal 0-7, giving a conforming mesh.
static const int kTets[6][4] = {
    {0, 5, 1, 7}, {0, 1, 3, 7}, {0, 3, 2, 7},
    {0, 2, 6, 7}, {0, 6, 4, 7}, {0, 4, 5, 7},
};

inline uint64_t edge_key(uint64_t a, uint64_t b) {
  if (a > b) std::swap(a, b);
  return (a << 32) | b;
}

class MeshBuilder {
 public:
  MeshBuilder(const float* grid, int64_t nx, int64_t ny, int64_t nz,
              float iso)
      : grid_(grid), nx_(nx), ny_(ny), nz_(nz), iso_(iso) {}

  inline float value(int64_t x, int64_t y, int64_t z) const {
    return grid_[(x * ny_ + y) * nz_ + z];
  }

  inline int64_t node_id(int64_t x, int64_t y, int64_t z) const {
    return (x * ny_ + y) * nz_ + z;
  }

  // Vertex on the edge between grid nodes a and b, linearly interpolated
  // to the iso crossing; deduped by edge so neighboring triangles share it.
  int edge_vertex(int64_t ax, int64_t ay, int64_t az, float va,
                  int64_t bx, int64_t by, int64_t bz, float vb) {
    uint64_t key = edge_key((uint64_t)node_id(ax, ay, az),
                            (uint64_t)node_id(bx, by, bz));
    auto it = edge_cache_.find(key);
    if (it != edge_cache_.end()) return it->second;
    float denom = vb - va;
    float t = (denom == 0.0f) ? 0.5f : (iso_ - va) / denom;
    if (t < 0.0f) t = 0.0f;
    if (t > 1.0f) t = 1.0f;
    V3 v{ax + t * (bx - ax), ay + t * (by - ay), az + t * (bz - az)};
    int idx = (int)verts_.size();
    verts_.push_back(v);
    edge_cache_.emplace(key, idx);
    return idx;
  }

  void emit_tri(int a, int b, int c) {
    tris_.push_back(a);
    tris_.push_back(b);
    tris_.push_back(c);
  }

  // Emit a triangle wound so its normal points TOWARD the below-iso side
  // (away from the above-iso corners). Marching a -sdf grid (interior
  // positive) this makes normals point outward.
  void emit_oriented(int a, int b, int c, const V3& inside) {
    const V3& va = verts_[a];
    const V3& vb = verts_[b];
    const V3& vc = verts_[c];
    float ux = vb.x - va.x, uy = vb.y - va.y, uz = vb.z - va.z;
    float wx = vc.x - va.x, wy = vc.y - va.y, wz = vc.z - va.z;
    float nx = uy * wz - uz * wy;
    float ny = uz * wx - ux * wz;
    float nz = ux * wy - uy * wx;
    float cx = (va.x + vb.x + vc.x) / 3.0f - inside.x;
    float cy = (va.y + vb.y + vc.y) / 3.0f - inside.y;
    float cz = (va.z + vb.z + vc.z) / 3.0f - inside.z;
    if (nx * cx + ny * cy + nz * cz < 0.0f)
      emit_tri(a, b, c);
    else
      emit_tri(a, c, b);
  }

  // March one tetrahedron given its 4 corner grid coords and values.
  // Case analysis is generic (1 or 2 corners below iso, or complements);
  // winding is fixed geometrically by emit_oriented, so the 6-tet cube
  // decomposition needs no per-case orientation table.
  void do_tet(const int64_t p[4][3], const float v[4]) {
    int in_idx[4], out_idx[4];
    int n_in = 0, n_out = 0;
    for (int i = 0; i < 4; ++i) {
      if (v[i] < iso_)
        in_idx[n_in++] = i;
      else
        out_idx[n_out++] = i;
    }
    if (n_in == 0 || n_in == 4) return;

    auto ev = [&](int a, int b) {
      return edge_vertex(p[a][0], p[a][1], p[a][2], v[a], p[b][0], p[b][1],
                         p[b][2], v[b]);
    };
    auto corner = [&](int i) {
      return V3{(float)p[i][0], (float)p[i][1], (float)p[i][2]};
    };

    if (n_in == 1 || n_in == 3) {
      // lone corner on one side: 3 crossing edges -> 1 triangle
      int lone = (n_in == 1) ? in_idx[0] : out_idx[0];
      int others[3];
      int k = 0;
      for (int i = 0; i < 4; ++i)
        if (i != lone) others[k++] = i;
      int t0 = ev(lone, others[0]);
      int t1 = ev(lone, others[1]);
      int t2 = ev(lone, others[2]);
      // inside centroid: mean of the below-iso corner(s)
      V3 inside{0, 0, 0};
      for (int i = 0; i < n_in; ++i) {
        V3 c = corner(in_idx[i]);
        inside.x += c.x / n_in;
        inside.y += c.y / n_in;
        inside.z += c.z / n_in;
      }
      emit_oriented(t0, t1, t2, inside);
    } else {
      // 2 in / 2 out: 4 crossing edges form a quad. Cycle order:
      // (a,c1) -> (a,c2) -> (b,c2) -> (b,c1)
      int a = in_idx[0], b = in_idx[1];
      int c1 = out_idx[0], c2 = out_idx[1];
      int q0 = ev(a, c1);
      int q1 = ev(a, c2);
      int q2 = ev(b, c2);
      int q3 = ev(b, c1);
      V3 ca = corner(a), cb = corner(b);
      V3 inside{(ca.x + cb.x) * 0.5f, (ca.y + cb.y) * 0.5f,
                (ca.z + cb.z) * 0.5f};
      emit_oriented(q0, q1, q2, inside);
      emit_oriented(q0, q2, q3, inside);
    }
  }

  void run() {
    edge_cache_.reserve((size_t)(nx_ * ny_));
    for (int64_t x = 0; x + 1 < nx_; ++x) {
      for (int64_t y = 0; y + 1 < ny_; ++y) {
        for (int64_t z = 0; z + 1 < nz_; ++z) {
          float cv[8];
          bool any_lo = false, any_hi = false;
          for (int c = 0; c < 8; ++c) {
            int dx = (c >> 2) & 1, dy = (c >> 1) & 1, dz = c & 1;
            cv[c] = value(x + dx, y + dy, z + dz);
            (cv[c] < iso_ ? any_lo : any_hi) = true;
          }
          if (!any_lo || !any_hi) continue;
          for (int t = 0; t < 6; ++t) {
            int64_t p[4][3];
            float v[4];
            for (int i = 0; i < 4; ++i) {
              int c = kTets[t][i];
              p[i][0] = x + ((c >> 2) & 1);
              p[i][1] = y + ((c >> 1) & 1);
              p[i][2] = z + (c & 1);
              v[i] = cv[c];
            }
            do_tet(p, v);
          }
        }
      }
    }
  }

  std::vector<V3> verts_;
  std::vector<int32_t> tris_;

 private:
  const float* grid_;
  int64_t nx_, ny_, nz_;
  float iso_;
  std::unordered_map<uint64_t, int> edge_cache_;
};

}  // namespace

extern "C" {

// Returns 0 on success. Caller frees out_verts/out_tris with iso_free.
int extract_isosurface(const float* grid, int64_t nx, int64_t ny, int64_t nz,
                       float iso, float** out_verts, int64_t* n_verts,
                       int32_t** out_tris, int64_t* n_tris) {
  MeshBuilder mb(grid, nx, ny, nz, iso);
  mb.run();
  *n_verts = (int64_t)mb.verts_.size();
  *n_tris = (int64_t)(mb.tris_.size() / 3);
  *out_verts = (float*)std::malloc(sizeof(float) * 3 * mb.verts_.size());
  *out_tris =
      (int32_t*)std::malloc(sizeof(int32_t) * mb.tris_.size());
  if ((*out_verts == nullptr && !mb.verts_.empty()) ||
      (*out_tris == nullptr && !mb.tris_.empty()))
    return 1;
  if (!mb.verts_.empty())
    std::memcpy(*out_verts, mb.verts_.data(),
                sizeof(float) * 3 * mb.verts_.size());
  if (!mb.tris_.empty())
    std::memcpy(*out_tris, mb.tris_.data(), sizeof(int32_t) * mb.tris_.size());
  return 0;
}

void iso_free(void* p) { std::free(p); }

}  // extern "C"

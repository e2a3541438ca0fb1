// BVH ray-caster: first-hit triangle queries for mesh cleaning.
//
// TPU-native replacement for the reference's pyembree dependency
// (/root/reference/utils/clean_mesh.py:37-106 and
// evaluation/clean_meshes.py:189-295 use trimesh.ray.ray_pyembree to find
// the first triangle hit by every camera-pixel ray). Median-split BVH +
// Moller-Trumbore intersection, C ABI for ctypes.

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

inline V3 sub(const V3& a, const V3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline float dot(const V3& a, const V3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}

struct AABB {
  V3 lo{FLT_MAX, FLT_MAX, FLT_MAX};
  V3 hi{-FLT_MAX, -FLT_MAX, -FLT_MAX};
  void grow(const V3& p) {
    lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y); lo.z = std::min(lo.z, p.z);
    hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y); hi.z = std::max(hi.z, p.z);
  }
  void grow(const AABB& b) { grow(b.lo); grow(b.hi); }
};

struct Node {
  AABB box;
  int32_t left = -1;    // child index, or -1 for leaf
  int32_t right = -1;
  int32_t start = 0;    // leaf: range into tri index array
  int32_t count = 0;
};

struct BVH {
  std::vector<V3> v0, e1, e2;  // per-triangle precomputed
  std::vector<AABB> tri_box;
  std::vector<V3> centroid;
  std::vector<int32_t> order;
  std::vector<Node> nodes;

  void build(const float* verts, const int32_t* tris, int64_t n_tris) {
    v0.resize(n_tris); e1.resize(n_tris); e2.resize(n_tris);
    tri_box.resize(n_tris); centroid.resize(n_tris);
    order.resize(n_tris);
    for (int64_t i = 0; i < n_tris; ++i) {
      const int32_t* t = tris + 3 * i;
      V3 a{verts[3 * t[0]], verts[3 * t[0] + 1], verts[3 * t[0] + 2]};
      V3 b{verts[3 * t[1]], verts[3 * t[1] + 1], verts[3 * t[1] + 2]};
      V3 c{verts[3 * t[2]], verts[3 * t[2] + 1], verts[3 * t[2] + 2]};
      v0[i] = a; e1[i] = sub(b, a); e2[i] = sub(c, a);
      tri_box[i].grow(a); tri_box[i].grow(b); tri_box[i].grow(c);
      centroid[i] = {(a.x + b.x + c.x) / 3, (a.y + b.y + c.y) / 3,
                     (a.z + b.z + c.z) / 3};
      order[i] = (int32_t)i;
    }
    nodes.reserve(2 * n_tris);
    build_node(0, (int32_t)n_tris);
  }

  int32_t build_node(int32_t start, int32_t count) {
    int32_t idx = (int32_t)nodes.size();
    nodes.emplace_back();
    AABB box;
    for (int32_t i = start; i < start + count; ++i)
      box.grow(tri_box[order[i]]);
    nodes[idx].box = box;
    if (count <= 4) {
      nodes[idx].start = start;
      nodes[idx].count = count;
      return idx;
    }
    // split along the widest centroid axis at the median
    V3 ext = sub(box.hi, box.lo);
    int axis = (ext.x > ext.y && ext.x > ext.z) ? 0 : (ext.y > ext.z ? 1 : 2);
    auto key = [&](int32_t t) {
      return axis == 0 ? centroid[t].x : (axis == 1 ? centroid[t].y
                                                    : centroid[t].z);
    };
    std::nth_element(order.begin() + start, order.begin() + start + count / 2,
                     order.begin() + start + count,
                     [&](int32_t a, int32_t b) { return key(a) < key(b); });
    int32_t mid = count / 2;
    int32_t l = build_node(start, mid);
    int32_t r = build_node(start + mid, count - mid);
    nodes[idx].left = l;
    nodes[idx].right = r;
    return idx;
  }

  static bool hit_box(const AABB& b, const V3& o, const V3& inv_d,
                      float t_max) {
    float tx1 = (b.lo.x - o.x) * inv_d.x, tx2 = (b.hi.x - o.x) * inv_d.x;
    float tmin = std::min(tx1, tx2), tmax = std::max(tx1, tx2);
    float ty1 = (b.lo.y - o.y) * inv_d.y, ty2 = (b.hi.y - o.y) * inv_d.y;
    tmin = std::max(tmin, std::min(ty1, ty2));
    tmax = std::min(tmax, std::max(ty1, ty2));
    float tz1 = (b.lo.z - o.z) * inv_d.z, tz2 = (b.hi.z - o.z) * inv_d.z;
    tmin = std::max(tmin, std::min(tz1, tz2));
    tmax = std::min(tmax, std::max(tz1, tz2));
    return tmax >= std::max(tmin, 0.0f) && tmin <= t_max;
  }

  // returns first-hit triangle index or -1; t_out gets the hit distance
  int32_t first_hit(const V3& o, const V3& d, float* t_out) const {
    // avoid 0 * inf = NaN in the slab test for axis-aligned rays
    auto safe_inv = [](float x) {
      return 1.0f / (x == 0.0f ? 1e-20f : x);
    };
    V3 inv_d{safe_inv(d.x), safe_inv(d.y), safe_inv(d.z)};
    float best_t = FLT_MAX;
    int32_t best = -1;
    int32_t stack[64];
    int sp = 0;
    stack[sp++] = 0;
    while (sp) {
      const Node& n = nodes[stack[--sp]];
      if (!hit_box(n.box, o, inv_d, best_t)) continue;
      if (n.left < 0) {
        for (int32_t i = n.start; i < n.start + n.count; ++i) {
          int32_t tri = order[i];
          // Moller-Trumbore
          V3 p = cross(d, e2[tri]);
          float det = dot(e1[tri], p);
          if (std::fabs(det) < 1e-12f) continue;
          float inv_det = 1.0f / det;
          V3 s = sub(o, v0[tri]);
          // small tolerance so rays through shared edges/vertices still
          // register on an adjacent triangle (watertight first-hit)
          const float kEps = 1e-6f;
          float u = dot(s, p) * inv_det;
          if (u < -kEps || u > 1.0f + kEps) continue;
          V3 q = cross(s, e1[tri]);
          float v = dot(d, q) * inv_det;
          if (v < -kEps || u + v > 1.0f + kEps) continue;
          float t = dot(e2[tri], q) * inv_det;
          if (t > 1e-6f && t < best_t) {
            best_t = t;
            best = tri;
          }
        }
      } else {
        stack[sp++] = n.left;
        stack[sp++] = n.right;
      }
    }
    *t_out = best_t;
    return best;
  }
};

}  // namespace

extern "C" {

void* bvh_build(const float* verts, int64_t n_verts, const int32_t* tris,
                int64_t n_tris) {
  (void)n_verts;
  BVH* bvh = new BVH();
  bvh->build(verts, tris, n_tris);
  return bvh;
}

void bvh_free(void* handle) { delete (BVH*)handle; }

// Cast n rays; writes first-hit triangle index (or -1) and distance.
void bvh_first_hit(void* handle, const float* origins, const float* dirs,
                   int64_t n, int32_t* hit_tri, float* hit_t) {
  BVH* bvh = (BVH*)handle;
#pragma omp parallel for schedule(dynamic, 1024)
  for (int64_t i = 0; i < n; ++i) {
    V3 o{origins[3 * i], origins[3 * i + 1], origins[3 * i + 2]};
    V3 d{dirs[3 * i], dirs[3 * i + 1], dirs[3 * i + 2]};
    float t;
    hit_tri[i] = bvh->first_hit(o, d, &t);
    hit_t[i] = t;
  }
}

}  // extern "C"

// Native scene-structure builders: binned-SAH BVH + SAOH light tree.
//
// C++ counterpart of accel/bvh.py and accel/lighttree.py, mirroring the
// reference's native CPU builders (BVH.cpp:65-309, LightTree.cpp:21-293)
// for build-throughput on large scenes.  Output layouts are exactly the
// framework's flat device arrays:
//   * BVH: preorder threaded nodes {lo, hi, miss, first, count} with
//     leaf-aligned prim_idx slots (scene/types.py::FlatBVH);
//   * light tree: binary {energy, axis, theta_o/e, box, left/right, tri,
//     parent} + leaf_of_tri (scene/types.py::LightTreeArrays).
// Exposed through a plain C ABI consumed by accel/native.py via ctypes.
//
// Build: g++ -O3 -shared -fPIC -fopenmp builders.cpp -o libbuilders.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kNumBins = 16;  // BVH.cpp / LightTree.cpp bin count
constexpr float kPi = 3.1415926535f;

struct Vec3 {
  float x = 0, y = 0, z = 0;
  Vec3() = default;
  Vec3(float a, float b, float c) : x(a), y(b), z(c) {}
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(float s) const { return {x * s, y * s, z * s}; }
  float operator[](int i) const { return i == 0 ? x : (i == 1 ? y : z); }
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
inline float dot(const Vec3& a, const Vec3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline Vec3 normalize(const Vec3& v) {
  float n = std::sqrt(std::max(dot(v, v), 1e-24f));
  return v * (1.0f / n);
}

struct Box {
  Vec3 lo{3e38f, 3e38f, 3e38f};
  Vec3 hi{-3e38f, -3e38f, -3e38f};
  void grow(const Box& b) { lo = vmin(lo, b.lo); hi = vmax(hi, b.hi); }
  float area() const {
    Vec3 d = vmax(hi - lo, Vec3(0, 0, 0));
    return 2.0f * (d.x * d.y + d.y * d.z + d.z * d.x);
  }
  Vec3 centroid() const { return (lo + hi) * 0.5f; }
};

// ---------------------------------------------------------------------------
// BVH (binned SAH, semantics of BVH.cpp:146-309)
// ---------------------------------------------------------------------------

struct BuildNode {
  Box box;
  int left = -1, right = -1;        // child build-node ids
  std::vector<int64_t> prims;       // leaf primitive ids
};

struct BvhBuilder {
  const float* tri_lo;
  const float* tri_hi;
  int leaf_size;
  std::vector<BuildNode> nodes;

  Box prim_box(int64_t i) const {
    Box b;
    b.lo = {tri_lo[3 * i], tri_lo[3 * i + 1], tri_lo[3 * i + 2]};
    b.hi = {tri_hi[3 * i], tri_hi[3 * i + 1], tri_hi[3 * i + 2]};
    return b;
  }

  int build(std::vector<int64_t>& ids, int first, int last) {
    int n = last - first;
    Box box;
    for (int i = first; i < last; ++i) box.grow(prim_box(ids[i]));

    int self = (int)nodes.size();
    nodes.emplace_back();
    nodes[self].box = box;

    if (n <= leaf_size) {
      nodes[self].prims.assign(ids.begin() + first, ids.begin() + last);
      return self;
    }

    // centroid bounds
    Box cb;
    for (int i = first; i < last; ++i) {
      Box pb = prim_box(ids[i]);
      Box c; c.lo = c.hi = pb.centroid();
      cb.grow(c);
    }
    Vec3 ext = cb.hi - cb.lo;

    float best_cost = 3e38f;
    int best_axis = -1, best_bin = -1;
    for (int axis = 0; axis < 3; ++axis) {
      if (ext[axis] <= 1e-12f) continue;
      Box bin_box[kNumBins];
      int bin_cnt[kNumBins] = {0};
      float inv = (float)kNumBins / ext[axis];
      for (int i = first; i < last; ++i) {
        Box pb = prim_box(ids[i]);
        int b = std::min((int)((pb.centroid()[axis] - cb.lo[axis]) * inv),
                         kNumBins - 1);
        bin_box[b].grow(pb);
        bin_cnt[b]++;
      }
      Box lbox[kNumBins]; int lcnt[kNumBins] = {0};
      Box acc; int c = 0;
      for (int b = 0; b < kNumBins - 1; ++b) {
        if (bin_cnt[b]) { acc.grow(bin_box[b]); }
        c += bin_cnt[b];
        lbox[b] = acc; lcnt[b] = c;
      }
      Box racc; int rc = 0;
      for (int b = kNumBins - 1; b >= 1; --b) {
        if (bin_cnt[b]) racc.grow(bin_box[b]);
        rc += bin_cnt[b];
        int i = b - 1;
        if (lcnt[i] == 0 || rc == 0) continue;
        float cost = lbox[i].area() * lcnt[i] + racc.area() * rc;
        if (cost < best_cost) { best_cost = cost; best_axis = axis; best_bin = i; }
      }
    }

    int mid;
    if (best_axis < 0) {
      // median fallback (BVH.cpp:110-144)
      int axis = 0;
      float e = ext.x;
      if (ext.y > e) { axis = 1; e = ext.y; }
      if (ext.z > e) { axis = 2; }
      std::sort(ids.begin() + first, ids.begin() + last,
                [&](int64_t a, int64_t b) {
                  return prim_box(a).centroid()[axis] < prim_box(b).centroid()[axis];
                });
      mid = first + n / 2;
    } else {
      float inv = (float)kNumBins / ext[best_axis];
      auto it = std::partition(
          ids.begin() + first, ids.begin() + last, [&](int64_t p) {
            Box pb = prim_box(p);
            int b = std::min((int)((pb.centroid()[best_axis] - cb.lo[best_axis]) * inv),
                             kNumBins - 1);
            return b <= best_bin;
          });
      mid = (int)(it - ids.begin());
      if (mid == first || mid == last) mid = first + n / 2;
    }

    int l = build(ids, first, mid);
    int r = build(ids, mid, last);
    nodes[self].left = l;
    nodes[self].right = r;
    return self;
  }
};

int subtree_size(const std::vector<BuildNode>& nodes, int i) {
  const BuildNode& n = nodes[i];
  if (n.left < 0) return 1;
  return 1 + subtree_size(nodes, n.left) + subtree_size(nodes, n.right);
}

struct FlatOut {
  float* lo; float* hi; int32_t* miss; int32_t* first; int32_t* count;
  int32_t* prim_idx; int leaf_size;
  int n_nodes = 0; int n_slots = 0;
};

void emit(const std::vector<BuildNode>& nodes, int node, int miss_to,
          FlatOut& out) {
  const BuildNode& n = nodes[node];
  int idx = out.n_nodes++;
  out.lo[3 * idx] = n.box.lo.x; out.lo[3 * idx + 1] = n.box.lo.y;
  out.lo[3 * idx + 2] = n.box.lo.z;
  out.hi[3 * idx] = n.box.hi.x; out.hi[3 * idx + 1] = n.box.hi.y;
  out.hi[3 * idx + 2] = n.box.hi.z;
  out.miss[idx] = miss_to;
  if (n.left < 0) {
    out.first[idx] = out.n_slots;
    out.count[idx] = (int32_t)n.prims.size();
    for (int64_t p : n.prims) out.prim_idx[out.n_slots++] = (int32_t)p;
    for (size_t k = n.prims.size(); k < (size_t)out.leaf_size; ++k)
      out.prim_idx[out.n_slots++] = -1;
  } else {
    out.first[idx] = -1;
    out.count[idx] = 0;
    int right_start = idx + 1 + subtree_size(nodes, n.left);
    emit(nodes, n.left, right_start, out);
    emit(nodes, n.right, miss_to, out);
  }
}

}  // namespace

extern "C" {

// Two-level build: per-mesh BLAS + TLAS over mesh boxes, splice-flattened.
// mesh_ranges: n_meshes pairs [start, end).  Output buffers sized by caller:
// nodes <= 2*n_tris + 2*n_meshes, prim slots <= (n_tris+1)*leaf_size.
// Returns 0 on success.
int build_scene_bvh(const float* tri_lo, const float* tri_hi, int64_t n_tris,
                    const int64_t* mesh_ranges, int n_meshes, int leaf_size,
                    float* out_lo, float* out_hi, int32_t* out_miss,
                    int32_t* out_first, int32_t* out_count,
                    int32_t* out_prim_idx, int64_t* out_n_nodes,
                    int64_t* out_n_slots) {
  if (n_tris <= 0 || n_meshes <= 0) return 1;

  BvhBuilder b{tri_lo, tri_hi, leaf_size, {}};

  // per-mesh BLAS
  std::vector<int> blas_roots(n_meshes);
  for (int m = 0; m < n_meshes; ++m) {
    int64_t s = mesh_ranges[2 * m], e = mesh_ranges[2 * m + 1];
    std::vector<int64_t> ids;
    for (int64_t i = s; i < e; ++i) ids.push_back(i);
    blas_roots[m] = b.build(ids, 0, (int)ids.size());
  }

  int root;
  if (n_meshes == 1) {
    root = blas_roots[0];
  } else {
    // TLAS over mesh boxes with leaf_size 1, spliced to BLAS roots
    std::vector<Box> mesh_box(n_meshes);
    for (int m = 0; m < n_meshes; ++m) mesh_box[m] = b.nodes[blas_roots[m]].box;
    // simple recursive median build over mesh centroids (few meshes)
    struct Tl {
      std::vector<BuildNode>& nodes;
      const std::vector<Box>& boxes;
      const std::vector<int>& roots;
      int build(std::vector<int> ids) {
        if (ids.size() == 1) return roots[ids[0]];
        Box cb;
        for (int i : ids) { Box c; c.lo = c.hi = boxes[i].centroid(); cb.grow(c); }
        Vec3 ext = cb.hi - cb.lo;
        int axis = 0; float e = ext.x;
        if (ext.y > e) { axis = 1; e = ext.y; }
        if (ext.z > e) axis = 2;
        std::sort(ids.begin(), ids.end(), [&](int a, int c) {
          return boxes[a].centroid()[axis] < boxes[c].centroid()[axis];
        });
        std::vector<int> l(ids.begin(), ids.begin() + ids.size() / 2);
        std::vector<int> r(ids.begin() + ids.size() / 2, ids.end());
        int li = build(l), ri = build(r);
        int self = (int)nodes.size();
        nodes.emplace_back();
        nodes[self].box = nodes[li].box;
        nodes[self].box.grow(nodes[ri].box);
        nodes[self].left = li;
        nodes[self].right = ri;
        return self;
      }
    } tl{b.nodes, mesh_box, blas_roots};
    std::vector<int> all(n_meshes);
    for (int m = 0; m < n_meshes; ++m) all[m] = m;
    root = tl.build(all);
  }

  FlatOut out{out_lo, out_hi, out_miss, out_first, out_count, out_prim_idx,
              leaf_size};
  int total = subtree_size(b.nodes, root);
  emit(b.nodes, root, total, out);
  *out_n_nodes = out.n_nodes;
  *out_n_slots = out.n_slots;
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Light tree (SAOH, semantics of LightTree.cpp:21-293)
// ---------------------------------------------------------------------------

namespace {

struct Cone {
  Vec3 axis{0, 0, 1};
  float theta_o = 0, theta_e = 0;
};

Cone cone_union(Cone a, Cone b) {  // ConeBounds.cuh:14-45
  if (b.theta_o > a.theta_o) std::swap(a, b);
  float d = std::min(std::max(dot(a.axis, b.axis), -1.0f), 1.0f);
  float theta_d = std::acos(d);
  float theta_e = std::max(a.theta_e, b.theta_e);
  if (std::min(theta_d + b.theta_o, kPi) <= a.theta_o)
    return {a.axis, a.theta_o, theta_e};
  float theta_o = (a.theta_o + theta_d + b.theta_o) * 0.5f;
  if (theta_o >= kPi) return {a.axis, kPi, theta_e};
  float theta_r = theta_o - a.theta_o;
  Vec3 rot = cross(a.axis, b.axis);
  float n = std::sqrt(dot(rot, rot));
  if (n < 1e-12f) return {a.axis, theta_o, theta_e};
  rot = rot * (1.0f / n);
  float c = std::cos(theta_r), s = std::sin(theta_r);
  Vec3 ax = a.axis * c + cross(rot, a.axis) * s + rot * (dot(rot, a.axis) * (1 - c));
  return {normalize(ax), theta_o, theta_e};
}

float orient_measure(float to, float te) {  // LightTree.cpp:318-329
  float tw = std::min(to + te, kPi);
  float a = 2 * kPi * (1 - std::cos(to));
  float b = 0.5f * kPi *
            (2 * tw * std::sin(to) - std::cos(to - 2 * tw) -
             2 * to * std::sin(to) + std::cos(to));
  return a + b;
}

struct LtCluster {
  Box box;
  Vec3 pos;
  Cone cone;
  float energy = 0;
  int tri = -1;
  int left = -1, right = -1;
};

struct LtBuilder {
  std::vector<LtCluster> nodes;

  int merge(int li, int ri) {
    LtCluster c;
    c.box = nodes[li].box;
    c.box.grow(nodes[ri].box);
    c.pos = c.box.centroid();
    c.cone = cone_union(nodes[li].cone, nodes[ri].cone);
    c.energy = nodes[li].energy + nodes[ri].energy;
    c.left = li;
    c.right = ri;
    nodes.push_back(c);
    return (int)nodes.size() - 1;
  }

  int build(std::vector<LtCluster>& work, int first, int last) {
    int n = last - first;
    if (n == 1) {
      nodes.push_back(work[first]);
      return (int)nodes.size() - 1;
    }
    Box pbox;
    Cone pcone = work[first].cone;
    float penergy = 0;
    Box cb;
    for (int i = first; i < last; ++i) {
      pbox.grow(work[i].box);
      if (i > first) pcone = cone_union(pcone, work[i].cone);
      penergy += work[i].energy;
      Box c; c.lo = c.hi = work[i].pos;
      cb.grow(c);
    }
    float pprob = std::max(
        pbox.area() * orient_measure(pcone.theta_o, pcone.theta_e) * penergy,
        1e-12f);
    Vec3 ext = cb.hi - cb.lo;
    float len_max = std::max(std::max(ext.x, std::max(ext.y, ext.z)), 1e-12f);
    Vec3 pext = pbox.hi - pbox.lo;
    len_max = std::max(std::max(pext.x, std::max(pext.y, pext.z)), 1e-12f);

    float best_cost = 3e38f;
    int best_axis = -1, best_bin = -1;
    for (int axis = 0; axis < 3; ++axis) {
      float cmin = cb.lo[axis], cmax = cb.hi[axis];
      if (cmin == cmax) continue;
      float inv = (kNumBins - 1) / (cmax - cmin);
      // gather per-bin aggregates
      Box bbox[kNumBins]; Cone bcone[kNumBins]; float ben[kNumBins] = {0};
      int bcnt[kNumBins] = {0};
      for (int i = first; i < last; ++i) {
        int bi = std::min(std::max((int)((work[i].pos[axis] - cmin) * inv), 0),
                          kNumBins - 1);
        bbox[bi].grow(work[i].box);
        bcone[bi] = bcnt[bi] ? cone_union(bcone[bi], work[i].cone) : work[i].cone;
        ben[bi] += work[i].energy;
        bcnt[bi]++;
      }
      for (int split = 0; split < kNumBins - 1; ++split) {
        Box lb, rb; Cone lc, rc; float le = 0, re = 0; int ln = 0, rn = 0;
        for (int b2 = 0; b2 <= split; ++b2) {
          if (!bcnt[b2]) continue;
          lb.grow(bbox[b2]);
          lc = ln ? cone_union(lc, bcone[b2]) : bcone[b2];
          le += ben[b2]; ln += bcnt[b2];
        }
        for (int b2 = split + 1; b2 < kNumBins; ++b2) {
          if (!bcnt[b2]) continue;
          rb.grow(bbox[b2]);
          rc = rn ? cone_union(rc, bcone[b2]) : bcone[b2];
          re += ben[b2]; rn += bcnt[b2];
        }
        if (!ln || !rn) continue;
        float pl = lb.area() * orient_measure(lc.theta_o, lc.theta_e) * le;
        float pr = rb.area() * orient_measure(rc.theta_o, rc.theta_e) * re;
        float cost = (pl + pr) / pprob;
        float ll = std::max(lb.hi[axis] - lb.lo[axis], 1e-12f);
        float rl = std::max(rb.hi[axis] - rb.lo[axis], 1e-12f);
        float kr = std::max(std::max(len_max / ll, len_max / rl), 1.0f);
        cost *= kr;
        if (cost < best_cost) { best_cost = cost; best_axis = axis; best_bin = split; }
      }
    }

    int mid;
    if (best_axis < 0) {
      std::sort(work.begin() + first, work.begin() + last,
                [](const LtCluster& a, const LtCluster& b) {
                  return a.pos.x < b.pos.x;
                });
      mid = first + n / 2;
    } else {
      float cmin = cb.lo[best_axis], cmax = cb.hi[best_axis];
      float inv = (kNumBins - 1) / (cmax - cmin);
      auto it = std::partition(work.begin() + first, work.begin() + last,
                               [&](const LtCluster& w) {
                                 int bi = std::min(
                                     std::max((int)((w.pos[best_axis] - cmin) * inv), 0),
                                     kNumBins - 1);
                                 return bi <= best_bin;
                               });
      mid = (int)(it - work.begin());
      if (mid == first || mid == last) mid = first + n / 2;
    }
    int li = build(work, first, mid);
    int ri = build(work, mid, last);
    return merge(li, ri);
  }
};

void lt_emit(const std::vector<LtCluster>& nodes, int node, int parent,
             float* energy, float* axis, float* theta_o, float* theta_e,
             float* box_lo, float* box_hi, int32_t* left, int32_t* right,
             int32_t* tri, int32_t* parent_out, int32_t* leaf_of_tri,
             int64_t* n_out) {
  const LtCluster& n = nodes[node];
  int idx = (int)(*n_out)++;
  energy[idx] = n.energy;
  axis[3 * idx] = n.cone.axis.x; axis[3 * idx + 1] = n.cone.axis.y;
  axis[3 * idx + 2] = n.cone.axis.z;
  theta_o[idx] = n.cone.theta_o; theta_e[idx] = n.cone.theta_e;
  box_lo[3 * idx] = n.box.lo.x; box_lo[3 * idx + 1] = n.box.lo.y;
  box_lo[3 * idx + 2] = n.box.lo.z;
  box_hi[3 * idx] = n.box.hi.x; box_hi[3 * idx + 1] = n.box.hi.y;
  box_hi[3 * idx + 2] = n.box.hi.z;
  parent_out[idx] = parent;
  if (n.left < 0) {
    left[idx] = right[idx] = -1;
    tri[idx] = n.tri;
    if (n.tri >= 0) leaf_of_tri[n.tri] = idx;
  } else {
    tri[idx] = -1;
    int l = (int)*n_out;
    lt_emit(nodes, n.left, idx, energy, axis, theta_o, theta_e, box_lo, box_hi,
            left, right, tri, parent_out, leaf_of_tri, n_out);
    int r = (int)*n_out;
    lt_emit(nodes, n.right, idx, energy, axis, theta_o, theta_e, box_lo, box_hi,
            left, right, tri, parent_out, leaf_of_tri, n_out);
    left[idx] = l;
    right[idx] = r;
  }
}

}  // namespace

extern "C" {

// SAOH light tree over emissive triangles.  Inputs: world-space vertex
// positions, triangle indices, per-triangle emission magnitude (0 = not
// emissive), mesh ranges.  Output buffers sized >= 2*n_emissive per node
// array; leaf_of_tri sized n_tris (filled with -1 first).  Returns the
// max depth (>=1), 0 if no emissive triangles, -1 on error.
int build_light_tree(const float* positions, const int32_t* tri_v,
                     int64_t n_tris, const float* tri_emission_norm,
                     const int64_t* mesh_ranges, int n_meshes,
                     float* energy, float* axis, float* theta_o,
                     float* theta_e, float* box_lo, float* box_hi,
                     int32_t* left, int32_t* right, int32_t* tri,
                     int32_t* parent, int32_t* leaf_of_tri,
                     int64_t* out_n_nodes) {
  for (int64_t i = 0; i < n_tris; ++i) leaf_of_tri[i] = -1;

  LtBuilder b;
  std::vector<int> mesh_roots;
  for (int m = 0; m < n_meshes; ++m) {
    int64_t s = mesh_ranges[2 * m], e = mesh_ranges[2 * m + 1];
    std::vector<LtCluster> leaves;
    for (int64_t t = s; t < e; ++t) {
      if (tri_emission_norm[t] <= 0.0f) continue;
      Vec3 p0{positions[3 * tri_v[3 * t]], positions[3 * tri_v[3 * t] + 1],
              positions[3 * tri_v[3 * t] + 2]};
      Vec3 p1{positions[3 * tri_v[3 * t + 1]], positions[3 * tri_v[3 * t + 1] + 1],
              positions[3 * tri_v[3 * t + 1] + 2]};
      Vec3 p2{positions[3 * tri_v[3 * t + 2]], positions[3 * tri_v[3 * t + 2] + 1],
              positions[3 * tri_v[3 * t + 2] + 2]};
      Vec3 n = cross(p1 - p0, p2 - p0);
      float area = 0.5f * std::sqrt(std::max(dot(n, n), 0.0f));
      LtCluster c;
      c.box.grow({});
      c.box.lo = vmin(vmin(p0, p1), p2);
      c.box.hi = vmax(vmax(p0, p1), p2);
      c.pos = c.box.centroid();
      c.cone.axis = normalize(n);
      c.cone.theta_o = 0.0f;
      c.cone.theta_e = kPi / 2.0f;  // Mesh.cpp:192-203
      c.energy = area * tri_emission_norm[t] * kPi;
      c.tri = (int)t;
      leaves.push_back(c);
    }
    if (leaves.empty()) continue;
    mesh_roots.push_back(b.build(leaves, 0, (int)leaves.size()));
  }
  if (mesh_roots.empty()) { *out_n_nodes = 0; return 0; }

  // TLAS combine over mesh roots (median splits — few meshes)
  std::vector<int> level = mesh_roots;
  while (level.size() > 1) {
    std::sort(level.begin(), level.end(), [&](int a, int c) {
      return b.nodes[a].pos.x < b.nodes[c].pos.x;
    });
    std::vector<int> next;
    for (size_t i = 0; i + 1 < level.size(); i += 2)
      next.push_back(b.merge(level[i], level[i + 1]));
    if (level.size() % 2) next.push_back(level.back());
    level = next;
  }
  int root = level[0];

  int64_t n_out = 0;
  lt_emit(b.nodes, root, -1, energy, axis, theta_o, theta_e, box_lo, box_hi,
          left, right, tri, parent, leaf_of_tri, &n_out);
  *out_n_nodes = n_out;

  // max depth
  std::vector<int> depth(n_out, 0);
  int maxd = 1;
  for (int64_t i = 1; i < n_out; ++i) {
    depth[i] = depth[parent[i]] + 1;
    maxd = std::max(maxd, depth[i] + 1);
  }
  return maxd;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// PNG scanline unfilter (the hot half of a PNG decoder; chunk parsing and
// zlib inflate live in Python — utils/image.py::load_png).  Plays the role
// of stb_image's row defiltering used by the reference's texture loader
// (FYPRayTracer/src/Classes/BaseClasses/Texture.cu:8-40 via stbi_load).
//
// `raw` is the inflated IDAT stream: height rows of (1 filter byte +
// stride bytes).  `out` receives height*stride reconstructed bytes.
// Returns 0 on success, -1 on an unknown filter type.
// ---------------------------------------------------------------------------

extern "C" {

int png_unfilter(const uint8_t* raw, uint8_t* out, int64_t height,
                 int64_t stride, int bpp) {
  for (int64_t y = 0; y < height; ++y) {
    const uint8_t* src = raw + y * (stride + 1);
    uint8_t* cur = out + y * stride;
    const uint8_t* up = y ? cur - stride : nullptr;
    switch (src[0]) {
      case 0:  // None
        std::memcpy(cur, src + 1, stride);
        break;
      case 1:  // Sub
        for (int64_t x = 0; x < stride; ++x)
          cur[x] = src[1 + x] + (x >= bpp ? cur[x - bpp] : 0);
        break;
      case 2:  // Up
        for (int64_t x = 0; x < stride; ++x)
          cur[x] = src[1 + x] + (up ? up[x] : 0);
        break;
      case 3:  // Average
        for (int64_t x = 0; x < stride; ++x) {
          int a = x >= bpp ? cur[x - bpp] : 0;
          int b2 = up ? up[x] : 0;
          cur[x] = src[1 + x] + ((a + b2) >> 1);
        }
        break;
      case 4:  // Paeth
        for (int64_t x = 0; x < stride; ++x) {
          int a = x >= bpp ? cur[x - bpp] : 0;
          int b2 = up ? up[x] : 0;
          int c = (up && x >= bpp) ? up[x - bpp] : 0;
          int p = a + b2 - c;
          int pa = p > a ? p - a : a - p;
          int pb = p > b2 ? p - b2 : b2 - p;
          int pc = p > c ? p - c : c - p;
          int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b2 : c);
          cur[x] = src[1 + x] + pred;
        }
        break;
      default:
        return -1;
    }
  }
  return 0;
}

}  // extern "C"

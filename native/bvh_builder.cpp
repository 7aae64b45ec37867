// Native SAH BVH builder + stackless entry/exit flatten.
//
// Capability parity with the reference's native (Rust) builder
// (src/accelerator/bvh.rs:299-457 + lbvh.rs:87-164): top-down 6-bucket SAH
// on the widest centroid axis, median fallback, multi-prim leaves, DFS
// flatten with exit-index threading. Exposed through a C ABI for ctypes;
// the Python builder (accel/sah.py) is the reference implementation and
// fallback. Scene build is host-side runtime work — exactly the layer the
// project keeps native (the device side is XLA/Pallas).
//
// Build: g++ -O3 -march=native -shared -fPIC bvh_builder.cpp -o libbvh.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kBuckets = 6;

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
inline float surface_area(const Vec3& lo, const Vec3& hi) {
  float dx = std::max(hi.x - lo.x, 0.f);
  float dy = std::max(hi.y - lo.y, 0.f);
  float dz = std::max(hi.z - lo.z, 0.f);
  return 2.f * (dx * dy + dy * dz + dz * dx);
}

struct Node {
  Vec3 lo, hi;
  int32_t left = -1, right = -1;  // -1,-1 => leaf
  int32_t first = -1, count = 0;  // into prim_order (leaf)
};

struct Builder {
  const Vec3* lo;
  const Vec3* hi;
  std::vector<Vec3> centroid;
  std::vector<Node> nodes;
  std::vector<int32_t> prim_order;
  int leaf_size;

  int build(std::vector<int32_t>& idx, int begin, int end) {
    Vec3 blo = lo[idx[begin]], bhi = hi[idx[begin]];
    for (int i = begin + 1; i < end; ++i) {
      blo = vmin(blo, lo[idx[i]]);
      bhi = vmax(bhi, hi[idx[i]]);
    }
    int n = end - begin;
    int me = (int)nodes.size();
    nodes.push_back({blo, bhi, -1, -1, -1, 0});
    if (n <= leaf_size) {
      nodes[me].first = (int32_t)prim_order.size();
      nodes[me].count = n;
      for (int i = begin; i < end; ++i) prim_order.push_back(idx[i]);
      return me;
    }
    // centroid bounds + widest axis
    Vec3 clo = centroid[idx[begin]], chi = clo;
    for (int i = begin + 1; i < end; ++i) {
      clo = vmin(clo, centroid[idx[i]]);
      chi = vmax(chi, centroid[idx[i]]);
    }
    float ext[3] = {chi.x - clo.x, chi.y - clo.y, chi.z - clo.z};
    int axis = 0;
    if (ext[1] > ext[axis]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;
    auto cget = [&](int32_t p) {
      const Vec3& c = centroid[p];
      return axis == 0 ? c.x : (axis == 1 ? c.y : c.z);
    };
    int mid;
    if (ext[axis] < 1e-5f) {
      // median fallback
      mid = begin + n / 2;
      std::nth_element(idx.begin() + begin, idx.begin() + mid, idx.begin() + end,
                       [&](int32_t a, int32_t b) { return cget(a) < cget(b); });
    } else {
      float cmin = axis == 0 ? clo.x : (axis == 1 ? clo.y : clo.z);
      float inv = kBuckets / ext[axis];
      Vec3 blos[kBuckets], bhis[kBuckets];
      int counts[kBuckets] = {0};
      for (int b = 0; b < kBuckets; ++b) {
        blos[b] = {std::numeric_limits<float>::max(), std::numeric_limits<float>::max(),
                   std::numeric_limits<float>::max()};
        bhis[b] = {-std::numeric_limits<float>::max(), -std::numeric_limits<float>::max(),
                   -std::numeric_limits<float>::max()};
      }
      auto bucket_of = [&](int32_t p) {
        int b = (int)((cget(p) - cmin) * inv);
        return std::min(b, kBuckets - 1);
      };
      for (int i = begin; i < end; ++i) {
        int b = bucket_of(idx[i]);
        counts[b]++;
        blos[b] = vmin(blos[b], lo[idx[i]]);
        bhis[b] = vmax(bhis[b], hi[idx[i]]);
      }
      float best_cost = std::numeric_limits<float>::max();
      int best_split = -1;
      for (int split = 1; split < kBuckets; ++split) {
        int nl = 0, nr = 0;
        Vec3 llo = blos[0], lhi = bhis[0], rlo, rhi;
        bool has_l = false, has_r = false;
        Vec3 alo{}, ahi{};
        // accumulate left of split
        Vec3 Llo{std::numeric_limits<float>::max(), std::numeric_limits<float>::max(),
                 std::numeric_limits<float>::max()};
        Vec3 Lhi{-std::numeric_limits<float>::max(), -std::numeric_limits<float>::max(),
                 -std::numeric_limits<float>::max()};
        Vec3 Rlo = Llo, Rhi = Lhi;
        for (int b = 0; b < split; ++b)
          if (counts[b]) {
            nl += counts[b];
            Llo = vmin(Llo, blos[b]);
            Lhi = vmax(Lhi, bhis[b]);
          }
        for (int b = split; b < kBuckets; ++b)
          if (counts[b]) {
            nr += counts[b];
            Rlo = vmin(Rlo, blos[b]);
            Rhi = vmax(Rhi, bhis[b]);
          }
        if (nl == 0 || nr == 0) continue;
        float cost = surface_area(Llo, Lhi) * nl + surface_area(Rlo, Rhi) * nr;
        if (cost < best_cost) {
          best_cost = cost;
          best_split = split;
        }
      }
      if (best_split < 0) {
        mid = begin + n / 2;
        std::nth_element(idx.begin() + begin, idx.begin() + mid, idx.begin() + end,
                         [&](int32_t a, int32_t b) { return cget(a) < cget(b); });
      } else {
        auto it = std::partition(idx.begin() + begin, idx.begin() + end,
                                 [&](int32_t p) { return bucket_of(p) < best_split; });
        mid = (int)(it - idx.begin());
        if (mid == begin || mid == end) mid = begin + n / 2;  // safety
      }
    }
    int li = build(idx, begin, mid);
    int ri = build(idx, mid, end);
    nodes[me].left = li;
    nodes[me].right = ri;
    return me;
  }
};

int subtree_size(const std::vector<Node>& nodes, int i, std::vector<int32_t>& size) {
  const Node& nd = nodes[i];
  if (nd.left < 0) {
    size[i] = 1;
  } else {
    size[i] = 1 + subtree_size(nodes, nd.left, size) + subtree_size(nodes, nd.right, size);
  }
  return size[i];
}

void assign(const std::vector<Node>& nodes, const std::vector<int32_t>& size, int i,
            int slot, int exit_to, float* out_lo, float* out_hi, int32_t* out_exit,
            int32_t* out_start, int32_t* out_count) {
  const Node& nd = nodes[i];
  out_lo[3 * slot] = nd.lo.x;
  out_lo[3 * slot + 1] = nd.lo.y;
  out_lo[3 * slot + 2] = nd.lo.z;
  out_hi[3 * slot] = nd.hi.x;
  out_hi[3 * slot + 1] = nd.hi.y;
  out_hi[3 * slot + 2] = nd.hi.z;
  out_exit[slot] = exit_to;
  if (nd.left < 0) {
    out_start[slot] = nd.first;
    out_count[slot] = nd.count;
  } else {
    out_start[slot] = -1;
    out_count[slot] = 0;
    int left_slot = slot + 1;
    int right_slot = left_slot + size[nd.left];
    assign(nodes, size, nd.left, left_slot, right_slot, out_lo, out_hi, out_exit,
           out_start, out_count);
    assign(nodes, size, nd.right, right_slot, exit_to, out_lo, out_hi, out_exit,
           out_start, out_count);
  }
}

}  // namespace

extern "C" {

// Returns the node count, or -1 if max_nodes is insufficient.
int32_t build_bvh(const float* lo, const float* hi, int32_t n, int32_t leaf_size,
                  float* out_node_lo, float* out_node_hi, int32_t* out_exit,
                  int32_t* out_prim_start, int32_t* out_prim_count,
                  int32_t* out_prim_order, int32_t max_nodes) {
  if (n <= 0) return -1;
  Builder b;
  b.lo = reinterpret_cast<const Vec3*>(lo);
  b.hi = reinterpret_cast<const Vec3*>(hi);
  b.leaf_size = leaf_size;
  b.centroid.resize(n);
  for (int i = 0; i < n; ++i) {
    b.centroid[i] = {(b.lo[i].x + b.hi[i].x) * 0.5f, (b.lo[i].y + b.hi[i].y) * 0.5f,
                     (b.lo[i].z + b.hi[i].z) * 0.5f};
  }
  b.nodes.reserve(2 * n);
  b.prim_order.reserve(n);
  std::vector<int32_t> idx(n);
  for (int i = 0; i < n; ++i) idx[i] = i;
  b.build(idx, 0, n);
  int m = (int)b.nodes.size();
  if (m > max_nodes) return -1;
  std::vector<int32_t> size(m, 0);
  subtree_size(b.nodes, 0, size);
  assign(b.nodes, size, 0, 0, m, out_node_lo, out_node_hi, out_exit, out_prim_start,
         out_prim_count);
  std::memcpy(out_prim_order, b.prim_order.data(), n * sizeof(int32_t));
  return m;
}

}  // extern "C"

// Binned-SAH BVH builder (top-down, 16 bins), emitting the same DFS
// pre-order + skip-link flat layout as bvh_build.cpp / ops/bvh.py.
//
// Tree quality is the main multiplier on traversal cost; the Morton
// median-split builder is fast but produces heavily overlapping nodes on
// clustered scenes.  This is the standard binned surface-area-heuristic
// build (Wald 2007 style) as a host-side native routine — the analogue of
// the driver-side PREFER_FAST_TRACE acceleration-structure build the
// reference requests (blas.cppm:115).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct AABB {
  float lo[3] = {1e30f, 1e30f, 1e30f};
  float hi[3] = {-1e30f, -1e30f, -1e30f};
  void grow(const float* p) {
    for (int a = 0; a < 3; ++a) {
      lo[a] = std::min(lo[a], p[a]);
      hi[a] = std::max(hi[a], p[a]);
    }
  }
  void grow(const AABB& o) {
    for (int a = 0; a < 3; ++a) {
      lo[a] = std::min(lo[a], o.lo[a]);
      hi[a] = std::max(hi[a], o.hi[a]);
    }
  }
  float area() const {
    float dx = std::max(hi[0] - lo[0], 0.0f);
    float dy = std::max(hi[1] - lo[1], 0.0f);
    float dz = std::max(hi[2] - lo[2], 0.0f);
    return 2.0f * (dx * dy + dy * dz + dz * dx);
  }
};

struct Range {
  int64_t s, e;
};

constexpr int kBins = 16;

}  // namespace

extern "C" {

// Outputs sized by bvh_num_nodes-style worst case: callers allocate
// 2*ceil(t/1)-1 — we just report the actual count. To keep the ABI simple,
// outputs must be preallocated for max_nodes = 2*t (safe upper bound);
// returns the node count written, or -1 if it would exceed max_nodes.
int64_t bvh_build_sah(const float* v0, const float* v1, const float* v2,
                      int64_t t, int64_t leaf_size, int64_t max_nodes,
                      float* node_min, float* node_max, int32_t* node_skip,
                      int32_t* node_first, int32_t* node_count,
                      int32_t* order) {
  if (t <= 0) return 0;

  std::vector<AABB> tri_box(t);
  std::vector<float> cent(t * 3);
  for (int64_t i = 0; i < t; ++i) {
    tri_box[i].grow(v0 + i * 3);
    tri_box[i].grow(v1 + i * 3);
    tri_box[i].grow(v2 + i * 3);
    for (int a = 0; a < 3; ++a)
      cent[i * 3 + a] = (tri_box[i].lo[a] + tri_box[i].hi[a]) * 0.5f;
  }
  std::vector<int32_t> idx(t);
  for (int64_t i = 0; i < t; ++i) idx[i] = static_cast<int32_t>(i);

  // Recursive build with an explicit stack, emitting DFS pre-order.
  struct Frame {
    int64_t s, e;
  };
  std::vector<Frame> stack{{0, t}};
  std::vector<Range> ranges;
  ranges.reserve(2 * t);

  while (!stack.empty()) {
    Frame f = stack.back();
    stack.pop_back();
    ranges.push_back({f.s, f.e});
    int64_t n = f.e - f.s;
    if (n <= leaf_size) continue;

    // Centroid bounds.
    AABB cb;
    for (int64_t i = f.s; i < f.e; ++i) cb.grow(&cent[idx[i] * 3]);
    int axis = 0;
    float ext[3];
    for (int a = 0; a < 3; ++a) ext[a] = cb.hi[a] - cb.lo[a];
    if (ext[1] > ext[axis]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;

    int64_t mid;
    if (ext[axis] <= 1e-12f) {
      mid = (f.s + f.e) / 2;  // degenerate spread: median split
    } else {
      // Bin triangles by centroid.
      AABB bin_box[kBins];
      int64_t bin_cnt[kBins] = {0};
      float inv = kBins / ext[axis];
      auto bin_of = [&](int32_t tri) {
        int b = static_cast<int>((cent[tri * 3 + axis] - cb.lo[axis]) * inv);
        return std::min(std::max(b, 0), kBins - 1);
      };
      for (int64_t i = f.s; i < f.e; ++i) {
        int b = bin_of(idx[i]);
        bin_box[b].grow(tri_box[idx[i]]);
        ++bin_cnt[b];
      }
      // Sweep SAH.
      AABB right_acc[kBins];
      AABB acc;
      for (int b = kBins - 1; b > 0; --b) {
        acc.grow(bin_box[b]);
        right_acc[b] = acc;
      }
      AABB left;
      int64_t left_n = 0;
      float best_cost = 1e30f;
      int best_split = -1;
      for (int b = 0; b < kBins - 1; ++b) {
        left.grow(bin_box[b]);
        left_n += bin_cnt[b];
        int64_t right_n = n - left_n;
        if (left_n == 0 || right_n == 0) continue;
        float cost = left.area() * left_n + right_acc[b + 1].area() * right_n;
        if (cost < best_cost) {
          best_cost = cost;
          best_split = b;
        }
      }
      if (best_split < 0) {
        mid = (f.s + f.e) / 2;
      } else {
        auto* first = idx.data() + f.s;
        auto* last = idx.data() + f.e;
        auto* pivot = std::partition(first, last, [&](int32_t tri) {
          return bin_of(tri) <= best_split;
        });
        mid = f.s + (pivot - first);
        if (mid == f.s || mid == f.e) mid = (f.s + f.e) / 2;
      }
    }
    stack.push_back({mid, f.e});
    stack.push_back({f.s, mid});
  }

  int64_t nn = static_cast<int64_t>(ranges.size());
  if (nn > max_nodes) return -1;

  std::memcpy(order, idx.data(), t * sizeof(int32_t));
  // Sorted-order tri AABBs for node box computation.
  std::vector<float> tmin(t * 3), tmax(t * 3);
  for (int64_t i = 0; i < t; ++i) {
    const AABB& b = tri_box[idx[i]];
    for (int a = 0; a < 3; ++a) {
      tmin[i * 3 + a] = b.lo[a];
      tmax[i * 3 + a] = b.hi[a];
    }
  }
  for (int64_t i = 0; i < nn; ++i) {
    const Range r = ranges[i];
    AABB b;
    for (int64_t k = r.s; k < r.e; ++k) {
      b.grow(&tmin[k * 3]);  // lo corners
      b.grow(&tmax[k * 3]);  // hi corners
    }
    for (int a = 0; a < 3; ++a) {
      node_min[i * 3 + a] = b.lo[a];
      node_max[i * 3 + a] = b.hi[a];
    }
    if (r.e - r.s <= leaf_size) {
      node_first[i] = static_cast<int32_t>(r.s);
      node_count[i] = static_cast<int32_t>(r.e - r.s);
    } else {
      node_first[i] = 0;
      node_count[i] = 0;
    }
  }
  std::vector<int32_t> next_at_start(t + 1, static_cast<int32_t>(nn));
  for (int64_t i = nn - 1; i >= 0; --i) {
    node_skip[i] = next_at_start[ranges[i].e];
    next_at_start[ranges[i].s] = static_cast<int32_t>(i);
  }
  return nn;
}

}  // extern "C"

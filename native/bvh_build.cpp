// Native LBVH builder — C++ twin of realtimeraytracer_tpu/ops/bvh.py.
//
// The reference builds its acceleration structures in the Vulkan driver on
// GPU (blas.cppm:121-160, tlas.cppm:96-149); here the build is a host-side
// native routine (Morton sort + DFS range emission + skip links) writing
// the same flat arrays the JAX traversal consumes.  Python falls back to
// the NumPy builder when the shared library isn't present; outputs are
// structurally identical (same ranges, same skip links) though triangle
// order may differ between sort implementations only when Morton keys tie.
//
// C ABI for ctypes; build: see native/Makefile.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline uint64_t expand_bits(uint64_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

struct Range {
  int64_t s, e;
};

}  // namespace

extern "C" {

// Returns the node count for t triangles at the given leaf size (callers
// preallocate). Matches the Python builder's DFS emission exactly.
int64_t bvh_num_nodes(int64_t t, int64_t leaf_size) {
  if (t <= 0) return 0;
  int64_t n = 0;
  std::vector<Range> stack{{0, t}};
  while (!stack.empty()) {
    Range r = stack.back();
    stack.pop_back();
    ++n;
    if (r.e - r.s > leaf_size) {
      int64_t m = (r.s + r.e) / 2;
      stack.push_back({m, r.e});
      stack.push_back({r.s, m});
    }
  }
  return n;
}

// Build. Inputs: v0/v1/v2 (t*3 floats each). Outputs (preallocated):
//   node_min/node_max (n*3 f32), node_skip/node_first/node_count (n i32),
//   order (t i32): sorted -> original triangle index.
// Returns the node count actually written.
int64_t bvh_build(const float* v0, const float* v1, const float* v2,
                  int64_t t, int64_t leaf_size,
                  float* node_min, float* node_max, int32_t* node_skip,
                  int32_t* node_first, int32_t* node_count, int32_t* order) {
  if (t <= 0) return 0;

  // Centroids + scene bounds.
  std::vector<float> cx(t), cy(t), cz(t);
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = 0; i < t; ++i) {
    float c[3];
    for (int a = 0; a < 3; ++a) {
      c[a] = (v0[i * 3 + a] + v1[i * 3 + a] + v2[i * 3 + a]) / 3.0f;
      lo[a] = std::min(lo[a], c[a]);
      hi[a] = std::max(hi[a], c[a]);
    }
    cx[i] = c[0]; cy[i] = c[1]; cz[i] = c[2];
  }
  float ext[3];
  for (int a = 0; a < 3; ++a) ext[a] = std::max(hi[a] - lo[a], 1e-12f);

  // Morton codes + stable sort.
  std::vector<uint64_t> code(t);
  for (int64_t i = 0; i < t; ++i) {
    auto q = [&](float v, int a) -> uint64_t {
      float u = (v - lo[a]) / ext[a] * 1023.0f;
      u = std::min(std::max(u, 0.0f), 1023.0f);
      return static_cast<uint64_t>(u);
    };
    code[i] = (expand_bits(q(cx[i], 0)) << 2) | (expand_bits(q(cy[i], 1)) << 1)
              | expand_bits(q(cz[i], 2));
  }
  std::vector<int32_t> ord(t);
  for (int64_t i = 0; i < t; ++i) ord[i] = static_cast<int32_t>(i);
  std::stable_sort(ord.begin(), ord.end(),
                   [&](int32_t a, int32_t b) { return code[a] < code[b]; });
  std::memcpy(order, ord.data(), t * sizeof(int32_t));

  // Per-sorted-triangle AABBs.
  std::vector<float> tmin(t * 3), tmax(t * 3);
  for (int64_t i = 0; i < t; ++i) {
    int64_t j = ord[i];
    for (int a = 0; a < 3; ++a) {
      float m = std::min(v0[j * 3 + a], std::min(v1[j * 3 + a], v2[j * 3 + a]));
      float M = std::max(v0[j * 3 + a], std::max(v1[j * 3 + a], v2[j * 3 + a]));
      tmin[i * 3 + a] = m;
      tmax[i * 3 + a] = M;
    }
  }

  // DFS pre-order ranges.
  std::vector<Range> ranges;
  std::vector<Range> stack{{0, t}};
  while (!stack.empty()) {
    Range r = stack.back();
    stack.pop_back();
    ranges.push_back(r);
    if (r.e - r.s > leaf_size) {
      int64_t m = (r.s + r.e) / 2;
      stack.push_back({m, r.e});
      stack.push_back({r.s, m});
    }
  }
  int64_t n = static_cast<int64_t>(ranges.size());

  // Node boxes + leaf info.  O(total range length) = O(t log t).
  for (int64_t i = 0; i < n; ++i) {
    const Range r = ranges[i];
    float bmin[3] = {1e30f, 1e30f, 1e30f}, bmax[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t k = r.s; k < r.e; ++k) {
      for (int a = 0; a < 3; ++a) {
        bmin[a] = std::min(bmin[a], tmin[k * 3 + a]);
        bmax[a] = std::max(bmax[a], tmax[k * 3 + a]);
      }
    }
    for (int a = 0; a < 3; ++a) {
      node_min[i * 3 + a] = bmin[a];
      node_max[i * 3 + a] = bmax[a];
    }
    if (r.e - r.s <= leaf_size) {
      node_first[i] = static_cast<int32_t>(r.s);
      node_count[i] = static_cast<int32_t>(r.e - r.s);
    } else {
      node_first[i] = 0;
      node_count[i] = 0;
    }
  }

  // Skip links: reverse sweep, map range-start -> node index.
  std::vector<int32_t> next_at_start(t + 1, static_cast<int32_t>(n));
  for (int64_t i = n - 1; i >= 0; --i) {
    node_skip[i] = next_at_start[ranges[i].e];
    next_at_start[ranges[i].s] = static_cast<int32_t>(i);
  }
  return n;
}

}  // extern "C"

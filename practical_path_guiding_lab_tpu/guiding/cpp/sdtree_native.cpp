// Native SD-tree host engine: bottom-up propagation, kd/quad refinement,
// deep copies and compaction over the fixed-capacity arrays owned by
// guiding/sdtree.py. Semantics mirror the Python implementation exactly
// (which mirrors the reference: kd split at vertCount > threshold with
// vertCount/2 per child, kdtree.py:229-358; quad merge-below/split-above
// 1%-of-root-flux with irradiance/4 per child, quadtree.py:512-637;
// compaction quadtree.py:844-851). The Python paths remain as the
// reference implementation for differential testing.
//
// Build: g++ -O2 -shared -fPIC -o _sdtree_native.so sdtree_native.cpp
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// bottom-up sums (children always have larger indices)
// ---------------------------------------------------------------------

void kd_propagate(const double* leaf_vals, double* out, const int32_t* left,
                  int64_t count) {
  std::memcpy(out, leaf_vals, count * sizeof(double));
  for (int64_t i = count - 1; i >= 0; --i) {
    int32_t l = left[i];
    if (l >= 0) out[i] += out[l] + out[l + 1];
  }
}

void quad_propagate(const double* leaf_vals, double* out,
                    const int32_t* child, int64_t count) {
  std::memcpy(out, leaf_vals, count * sizeof(double));
  for (int64_t i = count - 1; i >= 0; --i) {
    const int32_t* c = child + i * 4;
    if (c[0] >= 0) out[i] += out[c[0]] + out[c[1]] + out[c[2]] + out[c[3]];
  }
}

// ---------------------------------------------------------------------
// quadtree helpers
// ---------------------------------------------------------------------

struct QuadArrays {
  int32_t* child;    // (cap, 4)
  double* irr;       // (cap,)
  int32_t* depth;    // (cap,)
  float* thresh;     // (cap,)
  int64_t count;
  int64_t cap;
};

static int64_t quad_alloc(QuadArrays& q, int64_t n) {
  if (q.count + n > q.cap) return -1;
  int64_t base = q.count;
  q.count += n;
  return base;
}

static int64_t quad_deep_copy(QuadArrays& q, int64_t root) {
  if (root < 0) return -1;
  int64_t new_root = quad_alloc(q, 1);
  if (new_root < 0) return -2;
  for (int k = 0; k < 4; ++k) q.child[new_root * 4 + k] = -1;
  q.irr[new_root] = q.irr[root];
  q.depth[new_root] = 0;
  q.thresh[new_root] = q.thresh[root];
  std::vector<std::pair<int64_t, int64_t>> stack{{root, new_root}};
  while (!stack.empty()) {
    auto [src, dst] = stack.back();
    stack.pop_back();
    if (q.child[src * 4] < 0) continue;
    int64_t base = quad_alloc(q, 4);
    if (base < 0) return -2;
    for (int c = 0; c < 4; ++c) {
      int64_t sc = q.child[src * 4 + c];
      int64_t dc = base + c;
      q.child[dst * 4 + c] = (int32_t)dc;
      for (int k = 0; k < 4; ++k) q.child[dc * 4 + k] = -1;
      q.irr[dc] = q.irr[sc];
      q.depth[dc] = q.depth[dst] + 1;
      q.thresh[dc] = q.thresh[sc];
      stack.push_back({sc, dc});
    }
  }
  return new_root;
}

// ---------------------------------------------------------------------
// kd refinement (iterated split; right child gets a quadtree deep copy)
// ---------------------------------------------------------------------

// Returns 0 ok, -1 kd capacity exceeded, -2 quad capacity exceeded.
int kd_refine(int32_t* kd_left, uint8_t* kd_leaf, int32_t* kd_depth,
              double* kd_vert, int32_t* kd_quad_root, int64_t* kd_count,
              int64_t kd_cap, int32_t kd_max_depth, double threshold,
              double max_leaf_size,
              int32_t* q_child, double* q_irr, int32_t* q_depth,
              float* q_thresh, int64_t* q_count, int64_t q_cap) {
  QuadArrays q{q_child, q_irr, q_depth, q_thresh, *q_count, q_cap};
  std::vector<int64_t> work;
  for (int64_t i = 0; i < *kd_count; ++i)
    if (kd_leaf[i]) work.push_back(i);
  double limit = threshold * max_leaf_size;
  while (!work.empty()) {
    std::vector<int64_t> next;
    for (int64_t i : work) {
      if (!kd_leaf[i] || kd_vert[i] <= limit || kd_depth[i] >= kd_max_depth)
        continue;
      if (*kd_count + 2 > kd_cap) return -1;
      int64_t l = *kd_count;
      *kd_count += 2;
      int32_t root = kd_quad_root[i];
      kd_left[i] = (int32_t)l;
      kd_leaf[i] = 0;
      for (int c = 0; c < 2; ++c) {
        int64_t ci = l + c;
        kd_leaf[ci] = 1;
        kd_left[ci] = -1;
        kd_depth[ci] = kd_depth[i] + 1;
        kd_vert[ci] = kd_vert[i] / 2.0;
      }
      kd_quad_root[l] = root;
      kd_quad_root[i] = -1;  // internal nodes own no quadtree
      int64_t copy = quad_deep_copy(q, root);
      if (copy == -2) return -2;
      kd_quad_root[l + 1] = (int32_t)copy;
      next.push_back(l);
      next.push_back(l + 1);
    }
    work.swap(next);
  }
  *q_count = q.count;
  return 0;
}

// ---------------------------------------------------------------------
// quad refinement: per live root, merge below threshold then split above
// ---------------------------------------------------------------------

int quad_refine(const int32_t* kd_quad_root, const uint8_t* kd_leaf,
                int64_t kd_count, int32_t* q_child, double* q_irr,
                int32_t* q_depth, float* q_thresh, int64_t* q_count,
                int64_t q_cap, int32_t quad_max_depth, double flux_fraction) {
  QuadArrays q{q_child, q_irr, q_depth, q_thresh, *q_count, q_cap};
  std::vector<uint8_t> seen(q.cap, 0);
  std::vector<int64_t> stack;
  for (int64_t i = 0; i < kd_count; ++i) {
    if (!kd_leaf[i]) continue;
    int64_t root = kd_quad_root[i];
    if (root < 0 || seen[root]) continue;
    seen[root] = 1;
    double thresh = q.irr[root] * flux_fraction;
    // merge pass
    stack.assign(1, root);
    while (!stack.empty()) {
      int64_t n = stack.back();
      stack.pop_back();
      if (q.child[n * 4] < 0) continue;
      if (q.irr[n] < thresh && n != root) {
        for (int k = 0; k < 4; ++k) q.child[n * 4 + k] = -1;
      } else {
        for (int k = 0; k < 4; ++k) stack.push_back(q.child[n * 4 + k]);
      }
    }
    // split pass (iterated)
    stack.assign(1, root);
    while (!stack.empty()) {
      int64_t n = stack.back();
      stack.pop_back();
      if (q.child[n * 4] >= 0) {
        for (int k = 0; k < 4; ++k) stack.push_back(q.child[n * 4 + k]);
        continue;
      }
      if (q.irr[n] > thresh && q.depth[n] < quad_max_depth) {
        int64_t base = quad_alloc(q, 4);
        if (base < 0) return -2;
        for (int c = 0; c < 4; ++c) {
          int64_t ci = base + c;
          q.child[n * 4 + c] = (int32_t)ci;
          for (int k = 0; k < 4; ++k) q.child[ci * 4 + k] = -1;
          q.irr[ci] = q.irr[n] / 4.0;
          q.depth[ci] = q.depth[n] + 1;
          q.thresh[ci] = (float)thresh;
          stack.push_back(ci);
        }
      }
    }
    q.thresh[root] = (float)thresh;
  }
  *q_count = q.count;
  return 0;
}

// ---------------------------------------------------------------------
// compaction: keep only nodes reachable from live roots, renumber DFS
// ---------------------------------------------------------------------

int quad_compact(int32_t* kd_quad_root, const uint8_t* kd_leaf,
                 int64_t kd_count, int32_t* q_child, double* q_irr,
                 int32_t* q_depth, float* q_thresh, int64_t* q_count,
                 int64_t q_cap) {
  std::vector<int32_t> new_child(q_cap * 4, -1);
  std::vector<double> new_irr(q_cap, 0.0);
  std::vector<int32_t> new_depth(q_cap, 0);
  std::vector<float> new_thresh(q_cap, 0.0f);
  std::vector<int32_t> remap(q_cap, -1);
  int64_t count = 0;
  std::vector<int64_t> stack;
  for (int64_t i = 0; i < kd_count; ++i) {
    if (!kd_leaf[i]) continue;
    int64_t root = kd_quad_root[i];
    if (root < 0 || remap[root] >= 0) continue;
    remap[root] = (int32_t)count++;
    stack.assign(1, root);
    while (!stack.empty()) {
      int64_t n = stack.back();
      stack.pop_back();
      int64_t ni = remap[n];
      new_irr[ni] = q_irr[n];
      new_depth[ni] = q_depth[n];
      new_thresh[ni] = q_thresh[n];
      if (q_child[n * 4] >= 0) {
        for (int c = 0; c < 4; ++c) {
          int64_t ci = q_child[n * 4 + c];
          remap[ci] = (int32_t)count;
          new_child[ni * 4 + c] = (int32_t)count;
          ++count;
          stack.push_back(ci);
        }
      }
    }
  }
  std::memcpy(q_child, new_child.data(), q_cap * 4 * sizeof(int32_t));
  std::memcpy(q_irr, new_irr.data(), q_cap * sizeof(double));
  std::memcpy(q_depth, new_depth.data(), q_cap * sizeof(int32_t));
  std::memcpy(q_thresh, new_thresh.data(), q_cap * sizeof(float));
  for (int64_t i = 0; i < kd_count; ++i) {
    int32_t r = kd_quad_root[i];
    if (r >= 0 && remap[r] >= 0) kd_quad_root[i] = remap[r];
  }
  *q_count = count > 0 ? count : 1;
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------
// Flattened lookup tables for fast device-side sampling/point location:
// per live root, a DFS-ordered leaf list with CDF + bbox, plus a 32x32
// grid mapping canonical cells to the covering node (leaf, or the
// internal node at grid depth for deeper subtrees). Semantics are exactly
// the quadtree distribution: with consistent sums (children sum to
// parent), the CDF-descent probability of a leaf equals irr_leaf/irr_root
// and the solid-angle pdf is irr_leaf * 4^depth / (4*pi*irr_root).
// ---------------------------------------------------------------------

extern "C" int build_lookup(
    const int32_t* kd_quad_root, const uint8_t* kd_leaf, int64_t kd_count,
    const int32_t* q_child, const double* q_irr, const int32_t* q_depth,
    int64_t q_count,
    int32_t grid_l,           // grid depth (cells = 4^grid_l per root)
    int32_t* root_slot,       // (q_cap,) out: -1 or slot id
    int32_t* grid_node,       // (max_roots, 4^grid_l) out
    int32_t* leaf_node,       // (q_cap,) out
    float* leaf_cdf,          // (q_cap,) out (inclusive, per tree)
    float* leaf_lo,           // (q_cap, 2) out
    int32_t* leaf_depth,      // (q_cap,) out
    int32_t* root_leaf_off,   // (max_roots,) out
    int32_t* root_leaf_cnt,   // (max_roots,) out
    int64_t max_roots, int64_t* n_roots_out) {
  const int32_t res = 1 << grid_l;
  const int64_t cells = (int64_t)res * res;
  for (int64_t i = 0; i < q_count; ++i) root_slot[i] = -1;

  int64_t slot = 0;
  int64_t leaf_pos = 0;

  struct Frame {
    int64_t node;
    float lx, ly, size;
    int32_t depth;
  };
  std::vector<Frame> stack;

  for (int64_t i = 0; i < kd_count; ++i) {
    if (!kd_leaf[i]) continue;
    int64_t root = kd_quad_root[i];
    if (root < 0 || root >= q_count || root_slot[root] >= 0) continue;
    if (slot >= max_roots) return -1;
    root_slot[root] = (int32_t)slot;
    int32_t* grid = grid_node + slot * cells;
    root_leaf_off[slot] = (int32_t)leaf_pos;
    double root_irr = q_irr[root];
    double acc = 0.0;
    int32_t cnt = 0;

    // DFS in child order 2,3,1,0? Order only matters for CDF determinism;
    // use ascending child index for reproducibility.
    stack.clear();
    stack.push_back({root, 0.f, 0.f, 1.f, 0});
    while (!stack.empty()) {
      Frame f = stack.back();
      stack.pop_back();
      const int32_t* c = q_child + f.node * 4;
      bool is_leaf = c[0] < 0;
      // grid fill: stamp shallow leaves (cover >= 1 full cell) and any node
      // at exactly grid depth (covers exactly 1 cell). A node DEEPER than
      // the grid covers only a fraction of its cell — stamping it would
      // clobber the cell's covering ancestor and mislocate points in the
      // rest of the cell (the runtime descent cannot walk upward).
      if ((is_leaf && f.depth <= grid_l) || f.depth == grid_l) {
        int32_t x0 = (int32_t)(f.lx * res + 0.5f);
        int32_t y0 = (int32_t)(f.ly * res + 0.5f);
        int32_t span = f.depth >= grid_l ? 1 : (res >> f.depth);
        for (int32_t yy = y0; yy < y0 + span && yy < res; ++yy)
          for (int32_t xx = x0; xx < x0 + span && xx < res; ++xx)
            grid[(int64_t)yy * res + xx] = (int32_t)f.node;
      }
      if (is_leaf) {
        double p = root_irr > 0.0 ? q_irr[f.node] / root_irr : 0.0;
        acc += p;
        leaf_node[leaf_pos] = (int32_t)f.node;
        leaf_cdf[leaf_pos] = (float)acc;
        leaf_lo[leaf_pos * 2 + 0] = f.lx;
        leaf_lo[leaf_pos * 2 + 1] = f.ly;
        leaf_depth[leaf_pos] = f.depth;
        ++leaf_pos;
        ++cnt;
        continue;
      }
      float h = f.size * 0.5f;
      float mx = f.lx + h, my = f.ly + h;
      int32_t d = f.depth + 1;
      // children: 0=(x>=m,y>=m) 1=(x<m,y>=m) 2=(x<m,y<m) 3=(x>=m,y<m)
      stack.push_back({c[0], mx, my, h, d});
      stack.push_back({c[1], f.lx, my, h, d});
      stack.push_back({c[2], f.lx, f.ly, h, d});
      stack.push_back({c[3], mx, f.ly, h, d});
    }
    if (cnt > 0) leaf_cdf[leaf_pos - 1] = 1.0f;  // close rounding
    root_leaf_cnt[slot] = cnt;
    ++slot;
  }
  *n_roots_out = slot;
  return 0;
}

// ---------------------------------------------------------------------
// Walker alias tables over each root's leaf list (built from the leaf
// CDFs produced by build_lookup). Sampling a leaf then costs two packed
// row gathers on device instead of a ~11-step binary search.
// ---------------------------------------------------------------------

extern "C" int build_alias(
    const float* leaf_cdf, int64_t n_roots,
    const int32_t* root_leaf_off, const int32_t* root_leaf_cnt,
    float* alias_prob,   // (q_cap,) out
    int32_t* alias_other // (q_cap,) out
) {
  std::vector<int32_t> small_s, large_s;
  std::vector<double> scaled;
  for (int64_t s = 0; s < n_roots; ++s) {
    int32_t off = root_leaf_off[s], cnt = root_leaf_cnt[s];
    if (cnt <= 0) continue;
    scaled.resize(cnt);
    small_s.clear();
    large_s.clear();
    double prev = 0.0;
    for (int32_t i = 0; i < cnt; ++i) {
      double p = (double)leaf_cdf[off + i] - prev;
      prev = leaf_cdf[off + i];
      scaled[i] = p * cnt;
      alias_prob[off + i] = 1.0f;
      alias_other[off + i] = i;
      (scaled[i] < 1.0 ? small_s : large_s).push_back(i);
    }
    while (!small_s.empty() && !large_s.empty()) {
      int32_t si = small_s.back(); small_s.pop_back();
      int32_t li = large_s.back(); large_s.pop_back();
      alias_prob[off + si] = (float)scaled[si];
      alias_other[off + si] = li;
      scaled[li] = scaled[li] + scaled[si] - 1.0;
      (scaled[li] < 1.0 ? small_s : large_s).push_back(li);
    }
    // leftovers keep prob = 1 / self alias (already initialized)
  }
  return 0;
}

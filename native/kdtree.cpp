// Minimal 3-D kd-tree: build + nearest-neighbor queries.
//
// Purpose: a CPU oracle for validating the TPU brute-force/tiled NN
// kernels and for generating golden correspondence data (SURVEY.md §4:
// "golden-file parity tests ... against NumPy/SciPy oracles") — the same
// role pcl::KdTreeFLANN plays inside PCL's ICP (SURVEY.md X1). Not on the
// TPU compute path.

#include <algorithm>
#include <cstdint>
#include <cmath>
#include <vector>

namespace {

struct Node {
  int32_t point;  // index into the point array
  int32_t left;
  int32_t right;
  int8_t axis;
};

struct Tree {
  std::vector<float> pts;  // 3*N
  std::vector<Node> nodes;
  int32_t root = -1;

  int32_t build(std::vector<int32_t>& idx, int lo, int hi, int depth) {
    if (lo >= hi) return -1;
    int axis = depth % 3;
    int mid = (lo + hi) / 2;
    std::nth_element(
        idx.begin() + lo, idx.begin() + mid, idx.begin() + hi,
        [&](int32_t a, int32_t b) { return pts[3 * a + axis] < pts[3 * b + axis]; });
    int32_t id = static_cast<int32_t>(nodes.size());
    nodes.push_back({idx[mid], -1, -1, static_cast<int8_t>(axis)});
    int32_t l = build(idx, lo, mid, depth + 1);
    int32_t r = build(idx, mid + 1, hi, depth + 1);
    nodes[id].left = l;
    nodes[id].right = r;
    return id;
  }

  void nn(int32_t node, const float* q, int32_t* best, float* best_d2) const {
    if (node < 0) return;
    const Node& n = nodes[node];
    const float* p = &pts[3 * n.point];
    float d2 = 0;
    for (int k = 0; k < 3; ++k) {
      float d = p[k] - q[k];
      d2 += d * d;
    }
    if (d2 < *best_d2) {
      *best_d2 = d2;
      *best = n.point;
    }
    float diff = q[n.axis] - p[n.axis];
    int32_t near = diff < 0 ? n.left : n.right;
    int32_t far = diff < 0 ? n.right : n.left;
    nn(near, q, best, best_d2);
    if (diff * diff < *best_d2) nn(far, q, best, best_d2);
  }
};

}  // namespace

extern "C" {

void* rspc_kdtree_build(const float* xyz, int64_t n) {
  Tree* t = new Tree();
  t->pts.assign(xyz, xyz + 3 * n);
  t->nodes.reserve(n);
  std::vector<int32_t> idx(n);
  for (int64_t i = 0; i < n; ++i) idx[i] = static_cast<int32_t>(i);
  t->root = t->build(idx, 0, static_cast<int>(n), 0);
  return t;
}

void rspc_kdtree_nn(const void* tree, const float* queries, int64_t m,
                    int32_t* out_idx, float* out_d2) {
  const Tree* t = static_cast<const Tree*>(tree);
  for (int64_t i = 0; i < m; ++i) {
    int32_t best = -1;
    float best_d2 = INFINITY;
    if (t->root >= 0) t->nn(t->root, queries + 3 * i, &best, &best_d2);
    out_idx[i] = best;
    out_d2[i] = best_d2;
  }
}

void rspc_kdtree_free(void* tree) { delete static_cast<Tree*>(tree); }

}  // extern "C"

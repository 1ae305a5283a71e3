// Host-side segment-tree builder for the non-local cost aggregation path.
//
// TPU-native split of the reference's CSegmentTree::BuildSegmentTree
// (STMatching/SegmentTree.cpp:38-139) + Felzenszwalb-Huttenlocher
// segmentation (STMatching/segment-graph.h): the spanning-tree construction
// is irreducibly sequential (sorted-edge union-find scans), so it runs here
// in C++ on the host; it emits flat arrays (BFS order, parents, quantized
// edge distances, per-depth level offsets, DFS intervals) that drive the
// massively parallel tree-scan aggregation kernels on the TPU.
//
// Semantics intentionally matched to the reference:
//  * 4-connected grid edges, enumerated right then up per pixel
//    (SegmentTree.cpp:44-62), with caller-provided weights;
//  * edges sorted ascending by (w, b, a) (SegmentTree.h edge::operator<);
//  * FH criterion: join when w <= min(threshold[a], threshold[b]), with
//    threshold update w + tau/size (segment-graph.h:62-79);
//  * a second scan joins the remaining components into a single spanning
//    tree, adding `penalty` to the weight of cross-segment edges whose
//    smaller side exceeds `min_size` (segment-graph.h:82-96);
//  * per-edge distance quantization min(int(w*scale+0.5), 255)
//    (SegmentTree.cpp:80);
//  * BFS from node 0 defines the node ordering (SegmentTree.cpp:97-132).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsegtree.so segment_tree.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Edge {
  float w;
  int32_t a;
  int32_t b;
};

inline bool edge_less(const Edge& x, const Edge& y) {
  if (x.w != y.w) return x.w < y.w;
  if (x.b != y.b) return x.b < y.b;
  return x.a < y.a;
}

class DisjointSet {
 public:
  explicit DisjointSet(int n) : parent_(n), rank_(n, 0), size_(n, 1) {
    for (int i = 0; i < n; ++i) parent_[i] = i;
  }
  int find(int x) {
    int root = x;
    while (root != parent_[root]) root = parent_[root];
    while (x != root) {
      int next = parent_[x];
      parent_[x] = root;
      x = next;
    }
    return root;
  }
  // Union by rank; returns the new root.
  int join(int x, int y) {
    x = find(x);
    y = find(y);
    if (x == y) return x;
    if (rank_[x] > rank_[y]) std::swap(x, y);
    parent_[x] = y;
    size_[y] += size_[x];
    if (rank_[x] == rank_[y]) ++rank_[y];
    return y;
  }
  int size(int x) { return size_[find(x)]; }

 private:
  std::vector<int> parent_;
  std::vector<int> rank_;
  std::vector<int> size_;
};

}  // namespace

extern "C" {

// Number of grid edges for an H x W image (right + up neighbors).
int32_t gsm_num_edges(int32_t height, int32_t width) {
  return 2 * height * width - height - width;
}

// Fill (a, b) endpoints for the canonical edge enumeration. Buffers of
// length gsm_num_edges().
void gsm_grid_edges(int32_t height, int32_t width, int32_t* ea, int32_t* eb) {
  int32_t n = 0;
  for (int32_t y = 0; y < height; ++y) {
    for (int32_t x = 0; x < width; ++x) {
      if (x < width - 1) {
        ea[n] = y * width + x;
        eb[n] = y * width + x + 1;
        ++n;
      }
      if (y >= 1) {
        ea[n] = y * width + x;
        eb[n] = (y - 1) * width + x;
        ++n;
      }
    }
  }
}

// Build the segment tree.
//
// Inputs:
//   height, width      image size; N = height*width nodes
//   weights            edge weights in canonical enumeration order
//   tau                FH threshold constant
//   min_size           segments larger than this pay `penalty` when joined
//   penalty            cross-segment joining penalty added to the weight
//   weight_scale       distance quantization scale (1.0 color / 255.0 ST-2)
//
// Outputs (caller-allocated, length N unless noted):
//   bfs_order          node ids in BFS order from root 0
//   parent             parent node id per node (root maps to itself)
//   parent_dist        quantized uchar distance to parent (root: 0), int32
//   level_of           BFS depth per node
//   dfs_order          node ids in DFS preorder (for Euler-interval scans)
//   subtree_size       subtree size per node
//   level_start        per-depth offsets into bfs_order, length >= depth+1
//
// Returns the number of BFS levels (depth of tree + 1), or -1 on error.
int32_t gsm_build_segment_tree(
    int32_t height, int32_t width, const float* weights, float tau,
    int32_t min_size, float penalty, float weight_scale,
    int32_t* bfs_order, int32_t* parent, int32_t* parent_dist,
    int32_t* level_of, int32_t* dfs_order, int32_t* subtree_size,
    int32_t* level_start, int32_t level_start_capacity) {
  const int32_t n_nodes = height * width;
  const int32_t n_edges = gsm_num_edges(height, width);

  std::vector<Edge> edges(n_edges);
  {
    int32_t n = 0;
    for (int32_t y = 0; y < height; ++y) {
      for (int32_t x = 0; x < width; ++x) {
        if (x < width - 1) {
          edges[n] = {weights[n], y * width + x, y * width + x + 1};
          ++n;
        }
        if (y >= 1) {
          edges[n] = {weights[n], y * width + x, (y - 1) * width + x};
          ++n;
        }
      }
    }
  }

  std::sort(edges.begin(), edges.end(), edge_less);

  DisjointSet ds(n_nodes);
  std::vector<uint8_t> selected(n_edges, 0);
  std::vector<float> threshold(n_nodes, tau);  // THRESHOLD(1, tau) = tau

  // Pass 1: FH segmentation.
  for (int32_t i = 0; i < n_edges; ++i) {
    int a = ds.find(edges[i].a);
    int b = ds.find(edges[i].b);
    if (a == b) continue;
    if (edges[i].w <= threshold[a] && edges[i].w <= threshold[b]) {
      selected[i] = 1;
      int root = ds.join(a, b);
      threshold[root] = edges[i].w + tau / ds.size(root);
    }
  }

  // Pass 2: join remaining components into one spanning tree.
  for (int32_t i = 0; i < n_edges; ++i) {
    int a = ds.find(edges[i].a);
    int b = ds.find(edges[i].b);
    if (a == b) continue;
    int size_min = std::min(ds.size(a), ds.size(b));
    ds.join(a, b);
    selected[i] = 1;
    if (size_min > min_size) edges[i].w += penalty;
  }

  // Adjacency over selected edges (grid nodes have degree <= 4).
  std::vector<int32_t> adj_head(n_nodes, -1);
  struct AdjEntry {
    int32_t to;
    int32_t dist;
    int32_t next;
  };
  std::vector<AdjEntry> adj;
  adj.reserve(2 * (size_t)n_nodes);
  auto add_adj = [&](int32_t u, int32_t v, int32_t dist) {
    adj.push_back({v, dist, adj_head[u]});
    adj_head[u] = (int32_t)adj.size() - 1;
  };
  for (int32_t i = 0; i < n_edges; ++i) {
    if (!selected[i]) continue;
    int32_t dist = std::min((int32_t)(edges[i].w * weight_scale + 0.5f), 255);
    add_adj(edges[i].a, edges[i].b, dist);
    add_adj(edges[i].b, edges[i].a, dist);
  }

  // BFS from node 0.
  std::vector<uint8_t> visited(n_nodes, 0);
  bfs_order[0] = 0;
  parent[0] = 0;
  parent_dist[0] = 0;
  level_of[0] = 0;
  visited[0] = 1;
  int32_t head = 0, tail = 1;
  int32_t max_level = 0;
  while (head < tail) {
    int32_t u = bfs_order[head++];
    for (int32_t e = adj_head[u]; e != -1; e = adj[e].next) {
      int32_t v = adj[e].to;
      if (visited[v]) continue;
      visited[v] = 1;
      parent[v] = u;
      parent_dist[v] = adj[e].dist;
      level_of[v] = level_of[u] + 1;
      if (level_of[v] > max_level) max_level = level_of[v];
      bfs_order[tail++] = v;
    }
  }
  if (tail != n_nodes) return -1;  // graph was not connected

  const int32_t n_levels = max_level + 1;
  if (n_levels + 1 > level_start_capacity) return -2;
  // BFS order is monotone in level; compute level offsets by counting.
  for (int32_t l = 0; l <= n_levels; ++l) level_start[l] = 0;
  for (int32_t i = 0; i < n_nodes; ++i) ++level_start[level_of[i] + 1];
  for (int32_t l = 0; l < n_levels; ++l) level_start[l + 1] += level_start[l];

  // Iterative DFS preorder + subtree sizes (children discovered via a
  // second adjacency walk, skipping the parent).
  {
    std::vector<int32_t> stack;
    stack.reserve(n_nodes);
    stack.push_back(0);
    int32_t idx = 0;
    std::vector<int32_t> dfs_pos(n_nodes);
    while (!stack.empty()) {
      int32_t u = stack.back();
      stack.pop_back();
      dfs_pos[u] = idx;
      dfs_order[idx++] = u;
      for (int32_t e = adj_head[u]; e != -1; e = adj[e].next) {
        int32_t v = adj[e].to;
        if (v != parent[u] || u == 0) {
          if (parent[v] == u && v != u) stack.push_back(v);
        }
      }
    }
    // subtree sizes: accumulate bottom-up over BFS order reversed.
    for (int32_t i = 0; i < n_nodes; ++i) subtree_size[i] = 1;
    for (int32_t i = n_nodes - 1; i >= 1; --i) {
      int32_t v = bfs_order[i];
      subtree_size[parent[v]] += subtree_size[v];
    }
  }

  return n_levels;
}

}  // extern "C"

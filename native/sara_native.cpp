// Native host-side runtime for sara-tpu: disjoint sets / feature-track
// connected components.
//
// TPU-native counterpart of the reference's union-find machinery
// (reference: cpp/src/DO/Sara/DisjointSets/DisjointSets.hpp, DisjointSetsV2.hpp,
// SfM/Graph/FeatureDisjointSets.hpp; used by
// SfM/Graph/FeatureTracker.cpp:21-130 to maintain feature tracks).
//
// The device side of the framework is JAX/XLA; this is deliberately host
// code: incremental graph bookkeeping is branchy, pointer-chasing work that
// belongs on the CPU next to the Python orchestrator. Exposed via a C ABI
// for ctypes (no pybind11 in the image).

#include <cstdint>
#include <vector>

namespace {

struct DisjointSets {
  std::vector<int64_t> parent;
  std::vector<int32_t> rank;

  explicit DisjointSets(int64_t n) : parent(n), rank(n, 0) {
    for (int64_t i = 0; i < n; ++i) parent[i] = i;
  }

  int64_t find(int64_t x) {
    int64_t root = x;
    while (parent[root] != root) root = parent[root];
    // Path compression.
    while (parent[x] != root) {
      int64_t next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
  }

  void unite(int64_t a, int64_t b) {
    int64_t ra = find(a), rb = find(b);
    if (ra == rb) return;
    if (rank[ra] < rank[rb]) std::swap(ra, rb);
    parent[rb] = ra;
    if (rank[ra] == rank[rb]) ++rank[ra];
  }
};

}  // namespace

extern "C" {

// Opaque handle API ---------------------------------------------------------

void* ds_create(int64_t n) { return new DisjointSets(n); }

void ds_destroy(void* h) { delete static_cast<DisjointSets*>(h); }

void ds_union_edges(void* h, const int64_t* a, const int64_t* b, int64_t m) {
  auto* ds = static_cast<DisjointSets*>(h);
  for (int64_t i = 0; i < m; ++i) ds->unite(a[i], b[i]);
}

// Writes the representative of every element into out[n].
void ds_components(void* h, int64_t* out, int64_t n) {
  auto* ds = static_cast<DisjointSets*>(h);
  for (int64_t i = 0; i < n; ++i) out[i] = ds->find(i);
}

// One-shot connected components over an edge list: out[i] = component root.
void connected_components(int64_t n, const int64_t* a, const int64_t* b,
                          int64_t m, int64_t* out) {
  DisjointSets ds(n);
  for (int64_t i = 0; i < m; ++i) ds.unite(a[i], b[i]);
  for (int64_t i = 0; i < n; ++i) out[i] = ds.find(i);
}

// Relabel roots to dense [0, k) component ids; returns k.
int64_t compress_labels(int64_t* labels, int64_t n, int64_t* scratch) {
  // scratch must have size n; maps old root -> dense id via sort-free pass.
  for (int64_t i = 0; i < n; ++i) scratch[i] = -1;
  int64_t k = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t r = labels[i];
    if (scratch[r] < 0) scratch[r] = k++;
    labels[i] = scratch[r];
  }
  return k;
}

}  // extern "C"

// gnnhost — native host-side runtime for gnn_computing_tpu.
//
// The reference implements its graph loader, scheduler and sampling
// compaction in C++/CUDA (src/data.cu, include/graph_schedule.h,
// include/sample.h).  The TPU rebuild keeps device compute in XLA/Pallas,
// but the host-side O(m) preprocessing passes are equally native here:
// this library provides the hot loops that are slow as interpreted Python
// (text parsing, schedule emission, union-find clustering, subgraph
// compaction).  Python binds via ctypes (gnn_computing_tpu/native.py)
// with numpy fallbacks, so the framework works without a compiler.
//
// Build: g++ -O3 -march=native -shared -fPIC gnnhost.cpp -o libgnnhost.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <algorithm>
#include <queue>
#include <unordered_set>
#include <vector>

#include <sys/mman.h>
#include <sys/stat.h>
#include <fcntl.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------- parsing
// Parse whitespace-separated non-negative integers from a text file.
// Mirrors the reference loader's fscanf loop (src/data.cu:63-88) but mmap'd.
// Returns the number of integers written (<= cap), or -1 on IO error.
// Pass out=nullptr to count tokens only.
int64_t gs_parse_ints(const char* path, int64_t* out, int64_t cap) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  size_t len = (size_t)st.st_size;
  if (len == 0) {
    close(fd);
    return 0;
  }
  const char* p =
      (const char*)mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  if (p == MAP_FAILED) {
    close(fd);
    return -1;
  }
  const char* end = p + len;
  int64_t count = 0;
  const char* s = p;
  while (s < end) {
    while (s < end && (*s < '0' || *s > '9') && *s != '-') s++;
    if (s >= end) break;
    bool neg = false;
    if (*s == '-') {
      neg = true;
      s++;
    }
    int64_t v = 0;
    while (s < end && *s >= '0' && *s <= '9') {
      v = v * 10 + (*s - '0');
      s++;
    }
    if (out != nullptr) {
      if (count >= cap) break;
      out[count] = neg ? -v : v;
    }
    count++;
  }
  munmap((void*)p, len);
  close(fd);
  return count;
}

// -------------------------------------------------------------- scheduling
// Neighbor-grouping task emission (reference neighbor_grouping_schedule,
// graph_schedule.h:91-154): split each CSR row into tasks of <= block
// edges.  Returns num_tasks.  Pass task_start=nullptr to count only.
// task_start[t] = first edge of task t (CSR edge order)
// task_count[t] = edges in task t; task_dst[t] = destination row.
int64_t gs_ng_schedule(int64_t n, const int32_t* indptr, int64_t block,
                       int64_t* task_start, int32_t* task_count,
                       int32_t* task_dst) {
  int64_t t = 0;
  for (int64_t v = 0; v < n; v++) {
    int64_t beg = indptr[v], deg = indptr[v + 1] - beg;
    for (int64_t off = 0; off < deg; off += block) {
      if (task_start != nullptr) {
        task_start[t] = beg + off;
        task_count[t] = (int32_t)(deg - off < block ? deg - off : block);
        task_dst[t] = (int32_t)v;
      }
      t++;
    }
  }
  return t;
}

// ------------------------------------------------------------- clustering
// Union-find agglomerative merge with cluster-size cap — the merge loop of
// the reference's LSH reordering (script/cluster2.py:108-153).  ``pairs``
// is 2*npairs int64s ordered best-first; afterwards root[i] holds each
// vertex's representative.
void gs_union_find_merge(int64_t n, int64_t npairs, const int64_t* pairs,
                         int64_t cap, int64_t* root) {
  int64_t* parent = (int64_t*)malloc(sizeof(int64_t) * n);
  int64_t* size = (int64_t*)malloc(sizeof(int64_t) * n);
  for (int64_t i = 0; i < n; i++) {
    parent[i] = i;
    size[i] = 1;
  }
  auto find = [&](int64_t x) {
    int64_t r = x;
    while (parent[r] != r) r = parent[r];
    while (parent[x] != r) {
      int64_t nx = parent[x];
      parent[x] = r;
      x = nx;
    }
    return r;
  };
  for (int64_t k = 0; k < npairs; k++) {
    int64_t ru = find(pairs[2 * k]);
    int64_t rv = find(pairs[2 * k + 1]);
    if (ru == rv || size[ru] + size[rv] > cap) continue;
    parent[rv] = ru;
    size[ru] += size[rv];
  }
  for (int64_t i = 0; i < n; i++) root[i] = find(i);
  free(parent);
  free(size);
}

// ---------------------------------------------------------------- sampling
// Subgraph row compaction (reference getSubDegree/moveEdge,
// sample.h:20-45,59-75 and the capped variants :47-107): for each vertex in
// ``vertices`` (original ids), copy its in-edges whose source is active,
// renumbered through ``renum``; cap > 0 limits edges per row via a simple
// xorshift reservoir (deterministic in ``seed``).
// Returns total edges written.  First call with out_src=nullptr sizes the
// output (upper bound: cap<=0 ? sum of filtered degrees : num_v*cap).
int64_t gs_subgraph_compact(int64_t num_v, const int32_t* vertices,
                            const int32_t* indptr, const int32_t* indices,
                            const uint8_t* active, const int64_t* renum,
                            int64_t cap, uint64_t seed, int32_t* out_src,
                            int32_t* out_dst, int64_t* out_rowptr) {
  uint64_t state = seed ? seed : 0x9E3779B97F4A7C15ull;
  auto next = [&]() {
    state ^= state << 13;
    state ^= state >> 7;
    state ^= state << 17;
    return state;
  };
  int64_t w = 0;
  for (int64_t i = 0; i < num_v; i++) {
    if (out_rowptr != nullptr) out_rowptr[i] = w;
    int32_t v = vertices[i];
    int64_t beg = indptr[v], end = indptr[v + 1];
    if (cap <= 0) {
      for (int64_t e = beg; e < end; e++) {
        int32_t s = indices[e];
        if (!active[s]) continue;
        if (out_src != nullptr) {
          out_src[w] = (int32_t)renum[s];
          out_dst[w] = (int32_t)i;
        }
        w++;
      }
    } else {
      // reservoir sample up to cap active sources of this row
      int64_t kept = 0;
      int64_t row_start = w;
      for (int64_t e = beg; e < end; e++) {
        int32_t s = indices[e];
        if (!active[s]) continue;
        if (kept < cap) {
          if (out_src != nullptr) {
            out_src[row_start + kept] = (int32_t)renum[s];
            out_dst[row_start + kept] = (int32_t)i;
          }
          kept++;
        } else {
          int64_t j = (int64_t)(next() % (uint64_t)(kept + 1));
          if (j < cap && out_src != nullptr) {
            out_src[row_start + j] = (int32_t)renum[s];
          }
          kept++;  // counts seen actives for reservoir correctness
        }
      }
      w = row_start + (kept < cap ? kept : cap);
    }
  }
  if (out_rowptr != nullptr) out_rowptr[num_v] = w;
  return w;
}

// ------------------------------------------------------------- frontier
// One hop of frontier expansion (reference expandActive, sample.h:109-124):
// mark sources of all active frontier rows; writes newly-activated ids to
// out_new, returns their count.
int64_t gs_expand_frontier(int64_t frontier_n, const int32_t* frontier,
                           const int32_t* indptr, const int32_t* indices,
                           uint8_t* active, int32_t* out_new,
                           int64_t out_cap) {
  int64_t cnt = 0;
  for (int64_t i = 0; i < frontier_n; i++) {
    int32_t v = frontier[i];
    for (int64_t e = indptr[v]; e < indptr[v + 1]; e++) {
      int32_t s = indices[e];
      if (!active[s]) {
        active[s] = 1;
        if (cnt < out_cap) out_new[cnt] = s;
        cnt++;
      }
    }
  }
  return cnt;
}

}  // extern "C"

extern "C" {

// ----------------------------------------------------- densification fills
// Scatter-add f32 values into a flat buffer: out[flat[e]] += val[e].
// The hot fill of schedule/tiles.densify (numpy np.add.at is unvectorized
// and ~100x slower at 100M+ edges).
void gs_scatter_add_f32(int64_t m, const int64_t* flat, const float* val,
                        float* out) {
  for (int64_t e = 0; e < m; e++) out[flat[e]] += val[e];
}

// Saturating int8 edge-count fill with spill reporting: out[flat[e]]++
// until ``cap``; edges beyond the cap get spill[e]=1 (they return to the
// gather residual).  Replaces densify's sort+rank spill machinery.
void gs_saturating_count_i8(int64_t m, const int64_t* flat, int64_t cap,
                            int8_t* out, uint8_t* spill) {
  for (int64_t e = 0; e < m; e++) {
    int8_t c = out[flat[e]];
    if ((int64_t)c >= cap) {
      spill[e] = 1;
    } else {
      out[flat[e]] = (int8_t)(c + 1);
      spill[e] = 0;
    }
  }
}

// Exact-Jaccard agglomerative clustering with lazy root re-enqueue — the
// reference's full merge algorithm (script/cluster2.py:108-153), which the
// banding-only cluster_reorder approximates.  Candidate ``pairs`` (from LSH
// banding, Python side) seed a max-heap ordered by EXACT Jaccard similarity
// of the two vertices' neighbor sets.  Pop best pair: if both endpoints are
// live cluster representatives, merge smaller into larger (representative =
// larger side's root VERTEX, whose own adjacency list keeps representing
// the cluster — reference semantics); clusters reaching ``cap`` retire.  If
// an endpoint was already merged away, re-score its current root against
// the other root and RE-ENQUEUE (the lazy transitive closure the one-shot
// union-find merge lacks).  root[i] <- final representative per vertex.
void gs_jaccard_cluster(int64_t n, const int64_t* indptr,
                        const int32_t* indices, int64_t npairs,
                        const int64_t* pairs, int64_t cap, int64_t* root) {
  // sorted, deduplicated neighbor list per vertex (for 2-pointer Jaccard)
  std::vector<int32_t> nbr(indptr[n]);
  std::vector<int64_t> nptr(n + 1);
  int64_t w = 0;
  for (int64_t v = 0; v < n; v++) {
    nptr[v] = w;
    int64_t beg = indptr[v], end = indptr[v + 1];
    int64_t start = w;
    for (int64_t e = beg; e < end; e++) nbr[w++] = indices[e];
    std::sort(nbr.begin() + start, nbr.begin() + w);
    w = std::unique(nbr.begin() + start, nbr.begin() + w) -
        nbr.begin();
  }
  nptr[n] = w;

  auto jd = [&](int64_t u, int64_t v) -> double {
    int64_t a = nptr[u], ae = nptr[u + 1];
    int64_t b = nptr[v], be = nptr[v + 1];
    if (a == ae || b == be) return 0.0;
    int64_t inter = 0;
    while (a < ae && b < be) {
      int32_t x = nbr[a], y = nbr[b];
      inter += (x == y);
      a += (x <= y);
      b += (y <= x);
    }
    int64_t uni = (ae - nptr[u]) + (be - nptr[v]) - inter;
    return uni ? (double)inter / (double)uni : 0.0;
  };

  struct Pair {
    double simi;
    int64_t p1, p2;
    bool operator<(const Pair& o) const { return simi < o.simi; }
  };
  std::priority_queue<Pair> que;
  std::unordered_set<int64_t> sset;
  sset.reserve((size_t)npairs * 2);
  auto makenum = [n](int64_t a, int64_t b) {
    if (a > b) std::swap(a, b);
    return a * n + b;
  };
  for (int64_t k = 0; k < npairs; k++) {
    int64_t p1 = pairs[2 * k], p2 = pairs[2 * k + 1];
    if (p1 == p2) continue;
    int64_t key = makenum(p1, p2);
    if (!sset.insert(key).second) continue;
    que.push({jd(p1, p2), p1, p2});
  }

  std::vector<int64_t> cluster_id(n);
  std::vector<int64_t> cluster_sz(n, 1);
  std::vector<uint8_t> deleted(n, 0);
  for (int64_t i = 0; i < n; i++) cluster_id[i] = i;
  auto find = [&](int64_t x) {
    int64_t r = x;
    while (cluster_id[r] != r) r = cluster_id[r];
    while (cluster_id[x] != r) {
      int64_t nx = cluster_id[x];
      cluster_id[x] = r;
      x = nx;
    }
    return r;
  };

  while (!que.empty()) {
    Pair it = que.top();
    que.pop();
    int64_t p1 = it.p1, p2 = it.p2;
    sset.erase(makenum(p1, p2));
    if (cluster_id[p1] == p1 && cluster_id[p2] == p2) {
      if (deleted[p1] || deleted[p2]) continue;
      // merge smaller cluster into larger; representative keeps ITS OWN
      // adjacency list (cluster2.py:126-143)
      int64_t keep = (cluster_sz[p1] < cluster_sz[p2]) ? p2 : p1;
      int64_t gone = (keep == p1) ? p2 : p1;
      cluster_id[gone] = keep;
      cluster_sz[keep] += cluster_sz[gone];
      if (cluster_sz[keep] >= cap) deleted[keep] = 1;
    } else {
      // stale pair: rescore the CURRENT roots, lazily re-enqueue
      p1 = find(p1);
      p2 = find(p2);
      if (deleted[p1] || deleted[p2] || p1 == p2) continue;
      int64_t key = makenum(p1, p2);
      if (sset.insert(key).second) que.push({jd(p1, p2), p1, p2});
    }
  }
  for (int64_t i = 0; i < n; i++) root[i] = find(i);
}

// Stable counting sort by key (key[e] < nbins): writes the permutation
// ``order`` such that key[order] is ascending with original order preserved
// within equal keys.  O(m + nbins); replaces np.argsort(kind='stable') in
// CSRGraph.from_edges (reference csr2edgelist-era sorts, aggregator.h:11).
void gs_counting_sort(int64_t m, const int64_t* key, int64_t nbins,
                      int64_t* scratch_counts, int64_t* order) {
  memset(scratch_counts, 0, sizeof(int64_t) * nbins);
  for (int64_t e = 0; e < m; e++) scratch_counts[key[e]]++;
  int64_t acc = 0;
  for (int64_t b = 0; b < nbins; b++) {
    int64_t c = scratch_counts[b];
    scratch_counts[b] = acc;
    acc += c;
  }
  for (int64_t e = 0; e < m; e++) order[scratch_counts[key[e]]++] = e;
}

}  // extern "C"

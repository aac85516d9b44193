// Host-side native graph builder.
//
// The reference's host-side graph work is pure Python/torch (k-hop via PyG,
// edge membership via cupy/numpy in1d — /root/reference/src/
// pathway_explanations/data.py:281-451).  This framework's equivalent is a
// small C++ runtime that prepares TPU-friendly static layouts:
//
//   * CSR (receiver-sorted) edge layout with original edge ids,
//   * padded neighbour tables (ELL) for MXU-friendly aggregation,
//   * k-hop BFS reachability (directed, towards-query) for computational
//     subgraph extraction on graphs too large to sweep on device.
//
// Exposed as a plain C ABI consumed through ctypes (no pybind11 in the
// image).  All buffers are caller-allocated numpy arrays.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// In-degree (over receivers). out must hold n int64.
void degree_count(int64_t n, int64_t e, const int32_t* dst, int64_t* out) {
  std::memset(out, 0, sizeof(int64_t) * n);
  for (int64_t i = 0; i < e; ++i) out[dst[i]] += 1;
}

// CSR by receiver.  row_ptr: n+1 int64; col: e int32 (senders, grouped by
// receiver, original order preserved within a row); eid: e int32 (original
// edge index, for per-edge weights/types).
void build_csr(int64_t n, int64_t e, const int32_t* src, const int32_t* dst,
               int64_t* row_ptr, int32_t* col, int32_t* eid) {
  std::vector<int64_t> cnt(n + 1, 0);
  for (int64_t i = 0; i < e; ++i) cnt[dst[i] + 1]++;
  row_ptr[0] = 0;
  for (int64_t v = 0; v < n; ++v) row_ptr[v + 1] = row_ptr[v] + cnt[v + 1];
  std::vector<int64_t> cursor(row_ptr, row_ptr + n);
  for (int64_t i = 0; i < e; ++i) {
    int64_t pos = cursor[dst[i]]++;
    col[pos] = src[i];
    eid[pos] = static_cast<int32_t>(i);
  }
}

// Padded neighbour table (ELL): nbr/eid are [n, k] int32, valid is [n, k]
// uint8.  Returns the number of edges dropped because a row overflowed k.
int64_t build_ell(int64_t n, int64_t e, int64_t k, const int32_t* src,
                  const int32_t* dst, int32_t* nbr, int32_t* eid,
                  uint8_t* valid) {
  std::memset(nbr, 0, sizeof(int32_t) * n * k);
  std::memset(eid, 0, sizeof(int32_t) * n * k);
  std::memset(valid, 0, sizeof(uint8_t) * n * k);
  std::vector<int64_t> fill(n, 0);
  int64_t dropped = 0;
  for (int64_t i = 0; i < e; ++i) {
    int64_t v = dst[i];
    int64_t f = fill[v];
    if (f >= k) {
      ++dropped;
      continue;
    }
    nbr[v * k + f] = src[i];
    eid[v * k + f] = static_cast<int32_t>(i);
    valid[v * k + f] = 1;
    fill[v] = f + 1;
  }
  return dropped;
}

// Max in-degree — callers size ELL tables with it.
int64_t max_degree(int64_t n, int64_t e, const int32_t* dst) {
  std::vector<int64_t> cnt(n, 0);
  int64_t m = 0;
  for (int64_t i = 0; i < e; ++i) {
    int64_t c = ++cnt[dst[i]];
    if (c > m) m = c;
  }
  return m;
}

// Directed k-hop reachability towards the query (PyG
// k_hop_subgraph flow="source_to_target" semantics: follow edges backwards
// from the query; a node is kept iff it reaches the query in <= hops steps).
// Uses CSR-by-receiver built internally.  out_mask: n uint8.
void khop_reachable(int64_t n, int64_t e, const int32_t* src,
                    const int32_t* dst, int64_t query, int64_t hops,
                    uint8_t* out_mask) {
  std::vector<int64_t> row_ptr(n + 1);
  std::vector<int32_t> col(e), eid(e);
  build_csr(n, e, src, dst, row_ptr.data(), col.data(), eid.data());
  std::memset(out_mask, 0, sizeof(uint8_t) * n);
  out_mask[query] = 1;
  std::vector<int64_t> frontier{query}, next;
  for (int64_t h = 0; h < hops && !frontier.empty(); ++h) {
    next.clear();
    for (int64_t v : frontier) {
      for (int64_t p = row_ptr[v]; p < row_ptr[v + 1]; ++p) {
        int32_t u = col[p];
        if (!out_mask[u]) {
          out_mask[u] = 1;
          next.push_back(u);
        }
      }
    }
    frontier.swap(next);
  }
}

// BFS level per node from `query` over a prebuilt receiver-CSR (walking
// col = in-neighbours), capped at max_hops; unreached nodes get max_hops+1.
// One call replaces (max_hops+1) khop_reachable calls, each of which
// rebuilt the CSR (O(E)) — this is the per-query planning hot path.
void bfs_levels_csr(int64_t n, const int64_t* row_ptr, const int32_t* col,
                    int64_t query, int64_t max_hops, int32_t* out_dist) {
  const int32_t unreached = static_cast<int32_t>(max_hops + 1);
  for (int64_t i = 0; i < n; ++i) out_dist[i] = unreached;
  out_dist[query] = 0;
  std::vector<int64_t> frontier{query}, next;
  for (int64_t h = 1; h <= max_hops && !frontier.empty(); ++h) {
    next.clear();
    for (int64_t v : frontier) {
      for (int64_t p = row_ptr[v]; p < row_ptr[v + 1]; ++p) {
        int32_t u = col[p];
        if (out_dist[u] == unreached) {
          out_dist[u] = static_cast<int32_t>(h);
          next.push_back(u);
        }
      }
    }
    frontier.swap(next);
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Halo partition planning (see parallel/halo.py).  Nodes are range-owned
// (owner = v / n_local); an edge lives with its receiver's owner.  The plan
// lists, per (owner o -> requester dd) pair, the unique boundary rows o must
// ship to dd, and rewrites each device's edge shard against its local
// lookup buffer [own rows | received halo rows].  Two passes: sizes, fill.
// ---------------------------------------------------------------------------

namespace {
// Edge ids grouped by owning device (receiver's owner), original order kept.
struct DeviceBuckets {
  std::vector<int64_t> ptr;    // d+1
  std::vector<int64_t> order;  // e
  DeviceBuckets(int64_t e, const int32_t* dst, int64_t n_local, int64_t d) {
    ptr.assign(d + 1, 0);
    for (int64_t i = 0; i < e; ++i) ptr[dst[i] / n_local + 1]++;
    for (int64_t dd = 0; dd < d; ++dd) ptr[dd + 1] += ptr[dd];
    order.resize(e);
    std::vector<int64_t> cur(ptr.begin(), ptr.end() - 1);
    for (int64_t i = 0; i < e; ++i) order[cur[dst[i] / n_local]++] = i;
  }
};
}  // namespace

extern "C" {

// Pass 1: halo = max unique boundary rows over (owner, requester) pairs;
// e_loc = max edges owned by one device.
void halo_plan_sizes(int64_t n, int64_t e, const int32_t* src,
                     const int32_t* dst, int64_t n_local, int64_t d,
                     int64_t* halo_out, int64_t* eloc_out) {
  DeviceBuckets b(e, dst, n_local, d);
  std::vector<int64_t> stamp(n, -1);
  std::vector<int64_t> cnt(d);
  int64_t halo = 0, eloc = 0;
  for (int64_t dd = 0; dd < d; ++dd) {
    int64_t ecount = b.ptr[dd + 1] - b.ptr[dd];
    if (ecount > eloc) eloc = ecount;
    std::fill(cnt.begin(), cnt.end(), 0);
    for (int64_t p = b.ptr[dd]; p < b.ptr[dd + 1]; ++p) {
      int32_t u = src[b.order[p]];
      int64_t o = u / n_local;
      if (o != dd && stamp[u] != dd) {
        stamp[u] = dd;
        cnt[o]++;
      }
    }
    for (int64_t o = 0; o < d; ++o)
      if (cnt[o] > halo) halo = cnt[o];
  }
  *halo_out = halo;
  *eloc_out = eloc;
}

// Pass 2: fill caller-zeroed buffers sized with (rounded-up) halo / e_loc.
// send_idx [d,d,halo] i32; edge_slot/edge_rcv/edge_id [d,e_loc] i32;
// edge_valid [d,e_loc] u8.
void halo_plan_fill(int64_t n, int64_t e, const int32_t* src,
                    const int32_t* dst, int64_t n_local, int64_t d,
                    int64_t halo, int64_t e_loc, int32_t* send_idx,
                    int32_t* edge_slot, int32_t* edge_rcv, int32_t* edge_id,
                    uint8_t* edge_valid) {
  DeviceBuckets b(e, dst, n_local, d);
  std::vector<int64_t> stamp(n, -1);
  std::vector<int64_t> slot(n, 0);
  std::vector<int64_t> fill(d);
  for (int64_t dd = 0; dd < d; ++dd) {
    std::fill(fill.begin(), fill.end(), 0);
    for (int64_t p = b.ptr[dd]; p < b.ptr[dd + 1]; ++p) {
      int32_t u = src[b.order[p]];
      int64_t o = u / n_local;
      if (o != dd && stamp[u] != dd) {
        stamp[u] = dd;
        int64_t pos = fill[o]++;
        send_idx[(o * d + dd) * halo + pos] =
            static_cast<int32_t>(u - o * n_local);
        slot[u] = n_local + o * halo + pos;
      }
    }
    int64_t k = 0;
    for (int64_t p = b.ptr[dd]; p < b.ptr[dd + 1]; ++p, ++k) {
      int64_t ei = b.order[p];
      int32_t u = src[ei];
      int64_t o = u / n_local;
      edge_slot[dd * e_loc + k] = static_cast<int32_t>(
          o == dd ? u - dd * n_local : slot[u]);
      edge_rcv[dd * e_loc + k] = static_cast<int32_t>(dst[ei] - dd * n_local);
      edge_id[dd * e_loc + k] = static_cast<int32_t>(ei);
      edge_valid[dd * e_loc + k] = 1;
    }
  }
}

}  // extern "C"

extern "C" {

// Membership filter: keep[i] = mask[src[i]] && mask[dst[i]] — the native
// equivalent of the reference's cupy/numpy in1d edge filtering
// (data.py:431-451).
void edge_mask_from_node_mask(int64_t e, const int32_t* src,
                              const int32_t* dst, const uint8_t* node_mask,
                              uint8_t* keep) {
  for (int64_t i = 0; i < e; ++i)
    keep[i] = node_mask[src[i]] && node_mask[dst[i]];
}

}  // extern "C"

// dipole_native — host-side native runtime for dipole_tpu.
//
// The reference reaches native code through third-party libraries
// (scipy/sklearn C KD-trees, Open3D C++; SURVEY §2.3). This library is the
// first-party equivalent: a 3D KD-tree with multithreaded kNN queries, kNN
// graph construction (CSR), BFS route extraction, and a pairwise flip-
// assignment local-search solver. C ABI, consumed via ctypes
// (dipole_tpu/native.py); scipy remains the fallback when the library is
// not built.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libdipole_native.so dipole_native.cpp -lpthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

struct KDNode {
  int left = -1, right = -1;
  int axis = 0;
  float split = 0.f;
  int begin = 0, end = 0;  // leaf range into order[]
};

struct KDTree {
  const float* pts;  // (n, 3)
  int n;
  std::vector<int> order;
  std::vector<KDNode> nodes;
  static constexpr int kLeaf = 16;

  KDTree(const float* p, int n_) : pts(p), n(n_), order(n_) {
    for (int i = 0; i < n_; ++i) order[i] = i;
    nodes.reserve(2 * n_ / kLeaf + 8);
    build(0, n_);
  }

  int build(int b, int e) {
    int id = (int)nodes.size();
    nodes.emplace_back();
    if (e - b <= kLeaf) {
      nodes[id].begin = b;
      nodes[id].end = e;
      return id;
    }
    // split on the widest axis at the median
    float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int i = b; i < e; ++i) {
      const float* q = pts + 3 * order[i];
      for (int a = 0; a < 3; ++a) {
        lo[a] = std::min(lo[a], q[a]);
        hi[a] = std::max(hi[a], q[a]);
      }
    }
    int axis = 0;
    for (int a = 1; a < 3; ++a)
      if (hi[a] - lo[a] > hi[axis] - lo[axis]) axis = a;
    int mid = (b + e) / 2;
    std::nth_element(order.begin() + b, order.begin() + mid, order.begin() + e,
                     [&](int x, int y) { return pts[3 * x + axis] < pts[3 * y + axis]; });
    int node_axis = axis;
    float split = pts[3 * order[mid] + axis];
    int l = build(b, mid);
    int r = build(mid, e);
    nodes[id].left = l;
    nodes[id].right = r;
    nodes[id].axis = node_axis;
    nodes[id].split = split;
    return id;
  }

  // k nearest (squared distances), sorted ascending. `heap` is caller
  // scratch (cleared here): one allocation per thread instead of per query.
  void query(const float* q, int k, int* out_idx, float* out_d2,
             std::vector<std::pair<float, int>>& heap) const {
    heap.clear();
    search(0, q, k, heap);
    std::sort_heap(heap.begin(), heap.end());
    int m = (int)heap.size();
    for (int i = 0; i < m; ++i) {
      out_d2[i] = heap[i].first;
      out_idx[i] = heap[i].second;
    }
    for (int i = m; i < k; ++i) {
      out_d2[i] = 1e30f;
      out_idx[i] = m ? heap[m - 1].second : 0;
    }
  }

  void search(int id, const float* q, int k,
              std::vector<std::pair<float, int>>& heap) const {
    const KDNode& nd = nodes[id];
    if (nd.left < 0) {
      for (int i = nd.begin; i < nd.end; ++i) {
        int p = order[i];
        const float* r = pts + 3 * p;
        float d2 = (r[0] - q[0]) * (r[0] - q[0]) + (r[1] - q[1]) * (r[1] - q[1]) +
                   (r[2] - q[2]) * (r[2] - q[2]);
        if ((int)heap.size() < k) {
          heap.emplace_back(d2, p);
          std::push_heap(heap.begin(), heap.end());
        } else if (d2 < heap.front().first) {
          std::pop_heap(heap.begin(), heap.end());
          heap.back() = {d2, p};
          std::push_heap(heap.begin(), heap.end());
        }
      }
      return;
    }
    float diff = q[nd.axis] - nd.split;
    int near = diff <= 0 ? nd.left : nd.right;
    int far = diff <= 0 ? nd.right : nd.left;
    search(near, q, k, heap);
    if ((int)heap.size() < k || diff * diff < heap.front().first)
      search(far, q, k, heap);
  }
};

void parallel_for(int n, const std::function<void(int, int)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int n_threads = std::max(1u, std::min(hw, 32u));
  if (n < 1024) n_threads = 1;
  std::vector<std::thread> threads;
  int chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int b = t * chunk, e = std::min(n, b + chunk);
    if (b >= e) break;
    threads.emplace_back([=, &fn] { fn(b, e); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// kNN of m query points against n base points; out_idx/out_d2 are (m, k).
void dn_knn(const float* base, int n, const float* query, int m, int k,
            int* out_idx, float* out_d2) {
  if (n <= 0 || m <= 0 || k <= 0) return;
  if (k > n) k = n;
  KDTree tree(base, n);
  // Self-kNN (the normal-estimation hot path): walking queries in the
  // tree's spatial order makes consecutive queries hit the same leaves, so
  // the traversal's working set stays cache-resident (measured ~1.5x at
  // 180k points, k=50, single-core host).
  const bool self = (query == base && m == n);
  parallel_for(m, [&](int b, int e) {
    std::vector<std::pair<float, int>> heap;
    heap.reserve(k + 1);
    for (int i = b; i < e; ++i) {
      int qi = self ? tree.order[i] : i;
      tree.query(query + 3 * qi, k, out_idx + (int64_t)qi * k,
                 out_d2 + (int64_t)qi * k, heap);
    }
  });
}

// BFS route over a CSR graph with disconnected-component restart.
// Returns the number of components.
int dn_bfs_route(int n, const int64_t* indptr, const int* indices, int start,
                 int64_t* out) {
  std::vector<uint8_t> visited(n, 0);
  std::vector<int> queue;
  queue.reserve(n);
  int head = 0;
  int components = 1;
  visited[start] = 1;
  queue.push_back(start);
  int written = 0;
  int scan = 0;  // next-unvisited scan cursor
  while (written < n) {
    if (head == (int)queue.size()) {
      while (scan < n && visited[scan]) ++scan;
      if (scan >= n) break;
      visited[scan] = 1;
      queue.push_back(scan);
      ++components;
    }
    int u = queue[head++];
    out[written++] = u;
    for (int64_t j = indptr[u]; j < indptr[u + 1]; ++j) {
      int v = indices[j];
      if (!visited[v]) {
        visited[v] = 1;
        queue.push_back(v);
      }
    }
  }
  return components;
}

// Hoppe consistent tangent-plane orientation (the capability the reference
// gets from Open3D C++, socket_server.py:40-60), fully native: kNN graph
// (k+1 incl. self) -> deduped undirected edges weighted 1 - |n_i . n_j| ->
// Prim MST per component -> each component seeded at its max-z vertex with
// the normal forced to +z -> depth-first sign propagation along the tree.
// Replaces the Python seen-set edge loop + heapq MST (the serving host
// path's hotspot on this 1-core machine). out_sign: +1 keep / -1 flip.
void dn_hoppe_orient(const float* xyz, const float* nrm, int n, int k,
                     int8_t* out_sign) {
  if (n <= 0) return;
  for (int i = 0; i < n; ++i) out_sign[i] = 1;
  if (n == 1) {
    if (nrm[2] < 0) out_sign[0] = -1;
    return;
  }
  int kk = std::min(k + 1, n);
  std::vector<int> idx((size_t)n * kk);
  std::vector<float> d2((size_t)n * kk);
  {
    KDTree tree(xyz, n);
    const bool self = true;
    parallel_for(n, [&](int b, int e) {
      std::vector<std::pair<float, int>> heap;
      heap.reserve(kk + 1);
      for (int i = b; i < e; ++i) {
        int qi = self ? tree.order[i] : i;
        tree.query(xyz + 3 * qi, kk, idx.data() + (size_t)qi * kk,
                   d2.data() + (size_t)qi * kk, heap);
      }
    });
  }
  // deduped undirected edge list: (min, max) keys, sort + unique
  std::vector<uint64_t> keys;
  keys.reserve((size_t)n * kk);
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j < kk; ++j) {
      int v = idx[(size_t)i * kk + j];
      if (v == i) continue;
      uint32_t a = (uint32_t)std::min(i, v), b = (uint32_t)std::max(i, v);
      keys.push_back(((uint64_t)a << 32) | b);
    }
  }
  std::sort(keys.begin(), keys.end());
  keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
  size_t ne = keys.size();
  // adjacency (CSR) over the deduped edges with Hoppe weights
  std::vector<int> deg(n, 0);
  for (uint64_t key : keys) {
    ++deg[(int)(key >> 32)];
    ++deg[(int)(key & 0xffffffffu)];
  }
  std::vector<int64_t> aptr(n + 1, 0);
  for (int i = 0; i < n; ++i) aptr[i + 1] = aptr[i] + deg[i];
  std::vector<int> anbr(2 * ne);
  std::vector<float> awgt(2 * ne);
  {
    std::vector<int64_t> cur(aptr.begin(), aptr.end() - 1);
    for (uint64_t key : keys) {
      int a = (int)(key >> 32), b = (int)(key & 0xffffffffu);
      const float* na = nrm + 3 * a;
      const float* nb = nrm + 3 * b;
      float w = 1.0f - std::fabs(na[0] * nb[0] + na[1] * nb[1] + na[2] * nb[2]);
      anbr[cur[a]] = b; awgt[cur[a]] = w; ++cur[a];
      anbr[cur[b]] = a; awgt[cur[b]] = w; ++cur[b];
    }
  }
  // Prim MST per component (roots scanned 0..n-1, matching the Python
  // formulation); tree stored as adjacency lists
  std::vector<int64_t> tptr(n + 1, 0);
  std::vector<int> tdeg(n, 0);
  std::vector<std::pair<int, int>> tedges;  // (u, v) accepted MST edges
  tedges.reserve(n ? n - 1 : 0);
  {
    std::vector<uint8_t> visited(n, 0);
    // heap entries: (w, u, v) — lexicographic like Python's tuple heap
    struct HE { float w; int u, v; };
    auto cmp = [](const HE& x, const HE& y) {
      if (x.w != y.w) return x.w > y.w;
      if (x.u != y.u) return x.u > y.u;
      return x.v > y.v;
    };
    std::priority_queue<HE, std::vector<HE>, decltype(cmp)> heap(cmp);
    for (int root = 0; root < n; ++root) {
      if (visited[root]) continue;
      visited[root] = 1;
      for (int64_t j = aptr[root]; j < aptr[root + 1]; ++j)
        heap.push({awgt[j], root, anbr[j]});
      while (!heap.empty()) {
        HE e = heap.top();
        heap.pop();
        if (visited[e.v]) continue;
        visited[e.v] = 1;
        tedges.emplace_back(e.u, e.v);
        ++tdeg[e.u];
        ++tdeg[e.v];
        for (int64_t j = aptr[e.v]; j < aptr[e.v + 1]; ++j)
          if (!visited[anbr[j]]) heap.push({awgt[j], e.v, anbr[j]});
      }
    }
  }
  for (int i = 0; i < n; ++i) tptr[i + 1] = tptr[i] + tdeg[i];
  std::vector<int> tnbr(2 * tedges.size());
  {
    std::vector<int64_t> cur(tptr.begin(), tptr.end() - 1);
    for (auto& e : tedges) {
      tnbr[cur[e.first]++] = e.second;
      tnbr[cur[e.second]++] = e.first;
    }
  }
  // per-component max-z seeding + DFS sign propagation
  std::vector<uint8_t> visited(n, 0);
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  // stable: equal-z ties resolve to the lowest index, like np.argmax
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return xyz[3 * a + 2] > xyz[3 * b + 2]; });
  std::vector<int> stack;
  for (int oi = 0; oi < n; ++oi) {
    int root = order[oi];
    if (visited[root]) continue;
    visited[root] = 1;
    out_sign[root] = nrm[3 * root + 2] < 0 ? -1 : 1;
    stack.clear();
    stack.push_back(root);
    while (!stack.empty()) {
      int u = stack.back();
      stack.pop_back();
      const float* nu = nrm + 3 * u;
      for (int64_t j = tptr[u]; j < tptr[u + 1]; ++j) {
        int v = tnbr[j];
        if (visited[v]) continue;
        visited[v] = 1;
        const float* nv = nrm + 3 * v;
        float d = nu[0] * nv[0] + nu[1] * nv[1] + nu[2] * nv[2];
        // flip v iff dot(corrected u, raw v) = sign_u * d is negative
        out_sign[v] = (int8_t)(out_sign[u] * d < 0 ? -1 : 1);
        stack.push_back(v);
      }
    }
  }
}

// Iterated local search for the pairwise flip objective
// obj(x) = sum_ij M_ij * xor(x_i, x_j); minimizes when sign=-1, maximizes +1.
// x (n) in/out as uint8. Returns achieved objective.
double dn_flip_local_search(int n, const double* M, int8_t sign, uint8_t* x,
                            int max_rounds) {
  std::vector<double> Msym((size_t)n * n);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j)
      Msym[(size_t)i * n + j] = M[(size_t)i * n + j] + M[(size_t)j * n + i];
  for (int round = 0; round < max_rounds; ++round) {
    double best_gain = 0;
    int best_i = -1;
    for (int i = 0; i < n; ++i) {
      double delta = 0;
      for (int j = 0; j < n; ++j) {
        if (j == i) continue;
        double xo = (x[i] != x[j]) ? 1.0 : 0.0;
        delta += Msym[(size_t)i * n + j] * (1.0 - 2.0 * xo);
      }
      double gain = sign * delta;
      if (gain > best_gain + 1e-12) {
        best_gain = gain;
        best_i = i;
      }
    }
    if (best_i < 0) break;
    x[best_i] ^= 1;
  }
  double obj = 0;
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j)
      if (x[i] != x[j]) obj += M[(size_t)i * n + j];
  return obj;
}

// Masked PCA normals: for each of n points, the covariance over its <=k
// neighbors with d2 <= r2, then the smallest eigenvector via the SAME
// closed form as dipole_tpu/ops/linalg.py (Smith trigonometric
// eigenvalues + the Cayley-Hamilton column with the largest norm, first
// max on ties, (0,0,1) degenerate fallback) so the native and device
// paths agree to float tolerance (the serving host-floor hot stage:
// BASELINE round-5 breakdown, estimate 157 ms/req of which ~115 ms is
// the gather + CPU-jax PCA this replaces).
void dn_pca_normals(const float* pos, int n, const int* idx,
                    const float* d2, int k, float r2, float* out) {
  parallel_for(n, [&](int b, int e) {
    for (int i = b; i < e; ++i) {
      const int* nb = idx + (int64_t)i * k;
      const float* dd = d2 + (int64_t)i * k;
      double mx = 0, my = 0, mz = 0;
      int cnt = 0;
      for (int j = 0; j < k; ++j)
        if (dd[j] <= r2) {
          const float* p = pos + 3 * (int64_t)nb[j];
          mx += p[0]; my += p[1]; mz += p[2];
          ++cnt;
        }
      double c = cnt > 0 ? (double)cnt : 1.0;
      mx /= c; my /= c; mz /= c;
      double a00 = 0, a01 = 0, a02 = 0, a11 = 0, a12 = 0, a22 = 0;
      for (int j = 0; j < k; ++j)
        if (dd[j] <= r2) {
          const float* p = pos + 3 * (int64_t)nb[j];
          double dx = p[0] - mx, dy = p[1] - my, dz = p[2] - mz;
          a00 += dx * dx; a01 += dx * dy; a02 += dx * dz;
          a11 += dy * dy; a12 += dy * dz; a22 += dz * dz;
        }
      a00 /= c; a01 /= c; a02 /= c; a11 /= c; a12 /= c; a22 /= c;
      // Smith eigenvalues (we need the two larger ones: the smallest
      // eigenvector comes from (A - mid I)(A - big I))
      double q = (a00 + a11 + a22) / 3.0;
      double p1 = a01 * a01 + a02 * a02 + a12 * a12;
      double b00 = a00 - q, b11 = a11 - q, b22 = a22 - q;
      double p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1;
      double lam_mid = q, lam_big = q;
      if (p2 > 1e-30) {
        double pp = std::sqrt(p2 / 6.0);
        double inv = 1.0 / pp;
        double c00 = b00 * inv, c11 = b11 * inv, c22 = b22 * inv;
        double c01 = a01 * inv, c02 = a02 * inv, c12 = a12 * inv;
        double detB = c00 * (c11 * c22 - c12 * c12)
                    - c01 * (c01 * c22 - c12 * c02)
                    + c02 * (c01 * c12 - c11 * c02);
        double r = detB / 2.0;
        r = std::min(std::max(r, -1.0 + 1e-6), 1.0 - 1e-6);
        double phi = std::acos(r) / 3.0;
        double big = q + 2.0 * pp * std::cos(phi);
        double small = q + 2.0 * pp * std::cos(phi + 2.0 * M_PI / 3.0);
        lam_mid = 3.0 * q - big - small;
        lam_big = big;
      }
      double A[3][3] = {{a00, a01, a02}, {a01, a11, a12}, {a02, a12, a22}};
      double Ma[3][3], Mb[3][3], P[3][3];
      for (int r = 0; r < 3; ++r)
        for (int cc = 0; cc < 3; ++cc) {
          Ma[r][cc] = A[r][cc] - (r == cc ? lam_mid : 0.0);
          Mb[r][cc] = A[r][cc] - (r == cc ? lam_big : 0.0);
        }
      for (int r = 0; r < 3; ++r)
        for (int cc = 0; cc < 3; ++cc)
          P[r][cc] = Ma[r][0] * Mb[0][cc] + Ma[r][1] * Mb[1][cc]
                   + Ma[r][2] * Mb[2][cc];
      int best = 0;
      double bn = -1.0;
      for (int cc = 0; cc < 3; ++cc) {
        double s = P[0][cc] * P[0][cc] + P[1][cc] * P[1][cc]
                 + P[2][cc] * P[2][cc];
        if (s > bn) { bn = s; best = cc; }
      }
      double vx = P[0][best], vy = P[1][best], vz = P[2][best];
      double n2 = vx * vx + vy * vy + vz * vz;
      if (n2 > 1e-24) {
        double inv = 1.0 / std::sqrt(n2);
        vx *= inv; vy *= inv; vz *= inv;
      } else {
        vx = 0.0; vy = 0.0; vz = 1.0;
      }
      out[3 * (int64_t)i + 0] = (float)vx;
      out[3 * (int64_t)i + 1] = (float)vy;
      out[3 * (int64_t)i + 2] = (float)vz;
    }
  });
}

}  // extern "C"

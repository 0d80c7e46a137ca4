// Heuristic max-clique finder for PCM inlier selection.
//
// Native-runtime counterpart of the reference's vendored
// fast_max-clique_finder (FMC::maxCliqueHeu, used at
// /root/reference/swarm_localization/src/swarm_outlier_rejection/
// swarm_outlier_rejection.cpp:288). Independent implementation: greedy
// degree-ordered expansion from each of the top-K seed vertices, followed by
// a 1-swap local improvement. Consistency graphs here are small (<= a few
// hundred loops per drone pair), so this is exact in practice on the dense
// cliques PCM produces.
//
// C ABI for ctypes: adj is a row-major n*n 0/1 matrix.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

inline bool adj_at(const uint8_t* adj, int n, int i, int j) {
  return adj[static_cast<size_t>(i) * n + j] != 0;
}

// Greedy expansion seeded at v: repeatedly add the candidate with the most
// connections into the remaining candidate set.
int greedy_from(const uint8_t* adj, int n, int seed,
                std::vector<int>& clique) {
  clique.clear();
  clique.push_back(seed);
  std::vector<int> cand;
  cand.reserve(n);
  for (int u = 0; u < n; ++u)
    if (u != seed && adj_at(adj, n, seed, u)) cand.push_back(u);

  while (!cand.empty()) {
    int best = -1, best_deg = -1;
    for (int u : cand) {
      int deg = 0;
      for (int w : cand)
        if (w != u && adj_at(adj, n, u, w)) ++deg;
      if (deg > best_deg) {
        best_deg = deg;
        best = u;
      }
    }
    clique.push_back(best);
    std::vector<int> next;
    next.reserve(cand.size());
    for (int u : cand)
      if (u != best && adj_at(adj, n, best, u)) next.push_back(u);
    cand.swap(next);
  }
  return static_cast<int>(clique.size());
}

}  // namespace

extern "C" {

// Returns clique size; writes member indices into out (capacity >= n).
int max_clique_heu(const uint8_t* adj, int n, int* out) {
  if (n <= 0) return 0;
  // Degree ordering for seed selection.
  std::vector<int> order(n), deg(n, 0);
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j < n; ++j)
      if (i != j && adj_at(adj, n, i, j)) ++deg[i];
    order[i] = i;
  }
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return deg[a] > deg[b]; });

  const int kSeeds = std::min(n, 16);
  std::vector<int> best, cur;
  for (int s = 0; s < kSeeds; ++s) {
    greedy_from(adj, n, order[s], cur);
    if (cur.size() > best.size()) best = cur;
  }
  if (best.empty()) best.push_back(order[0]);

  // 1-swap improvement: try to add any vertex adjacent to all members.
  bool improved = true;
  while (improved) {
    improved = false;
    for (int u = 0; u < n; ++u) {
      if (std::find(best.begin(), best.end(), u) != best.end()) continue;
      bool ok = true;
      for (int w : best)
        if (!adj_at(adj, n, u, w)) { ok = false; break; }
      if (ok) {
        best.push_back(u);
        improved = true;
      }
    }
  }

  std::sort(best.begin(), best.end());
  std::memcpy(out, best.data(), best.size() * sizeof(int));
  return static_cast<int>(best.size());
}

}  // extern "C"

// Cell-list k-nearest-neighbor search — C API for ctypes.
//
// Host-side fast path for graph construction (the reference delegates
// neighbor search to MDAnalysis/nmrdata C extensions,
// reference: library.py:112-113, main.py:239-240). O(N*k) expected via
// spatial binning with expanding shell search; exact kNN (matches the
// KD-tree result up to distance ties).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Candidate {
  float d2;
  int32_t idx;
  bool operator<(const Candidate& o) const { return d2 < o.d2; }
};

}  // namespace

extern "C" {

// coords: [n,3] float32. Outputs nlist [n,k] int32, dists [n,k] float32,
// sorted ascending; slots beyond the neighbor count padded with 0/0.
// Returns 0 on success.
int cell_list_knn(const float* coords, long n, long k, int32_t* nlist,
                  float* dists) {
  if (n <= 0 || k <= 0) return -1;
  float lo[3] = {coords[0], coords[1], coords[2]};
  float hi[3] = {coords[0], coords[1], coords[2]};
  for (long i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], coords[i * 3 + d]);
      hi[d] = std::max(hi[d], coords[i * 3 + d]);
    }
  // target ~2 atoms per cell for dense molecular systems
  float vol = 1.0f;
  for (int d = 0; d < 3; ++d) vol *= std::max(hi[d] - lo[d], 1e-3f);
  float cell = std::cbrt(vol * 2.0f / static_cast<float>(n));
  cell = std::max(cell, 1e-3f);
  int dims[3];
  for (int d = 0; d < 3; ++d)
    dims[d] = std::max(1, static_cast<int>((hi[d] - lo[d]) / cell) + 1);
  const long ncells = static_cast<long>(dims[0]) * dims[1] * dims[2];

  auto cell_of = [&](long i, int* c) {
    for (int d = 0; d < 3; ++d) {
      int v = static_cast<int>((coords[i * 3 + d] - lo[d]) / cell);
      c[d] = std::min(std::max(v, 0), dims[d] - 1);
    }
  };
  auto cell_index = [&](const int* c) {
    return (static_cast<long>(c[0]) * dims[1] + c[1]) * dims[2] + c[2];
  };

  // counting-sort atoms into cells
  std::vector<int32_t> counts(ncells + 1, 0);
  std::vector<int32_t> atom_cell(n);
  for (long i = 0; i < n; ++i) {
    int c[3];
    cell_of(i, c);
    atom_cell[i] = static_cast<int32_t>(cell_index(c));
    counts[atom_cell[i] + 1]++;
  }
  for (long c = 0; c < ncells; ++c) counts[c + 1] += counts[c];
  std::vector<int32_t> order(n);
  {
    std::vector<int32_t> cursor(counts.begin(), counts.end() - 1);
    for (long i = 0; i < n; ++i) order[cursor[atom_cell[i]]++] = static_cast<int32_t>(i);
  }

  const int max_dim = std::max(dims[0], std::max(dims[1], dims[2]));

  auto process_range = [&](long i_begin, long i_end) {
  std::vector<Candidate> cand;
  cand.reserve(256);
  for (long i = i_begin; i < i_end; ++i) {
    int c[3];
    cell_of(i, c);
    cand.clear();
    const float xi = coords[i * 3], yi = coords[i * 3 + 1], zi = coords[i * 3 + 2];
    long found = 0;
    float kth_d2 = INFINITY;
    // expanding shells of cells; stop when the next shell cannot beat
    // the current k-th distance
    for (int r = 0; r < max_dim; ++r) {
      if (found >= k) {
        const float shell_min = (r - 1) * cell;  // min distance to shell r
        if (shell_min > 0 && shell_min * shell_min > kth_d2) break;
      }
      bool any_cell = false;
      for (int dx = -r; dx <= r; ++dx) {
        const int cx = c[0] + dx;
        if (cx < 0 || cx >= dims[0]) continue;
        for (int dy = -r; dy <= r; ++dy) {
          const int cy = c[1] + dy;
          if (cy < 0 || cy >= dims[1]) continue;
          for (int dz = -r; dz <= r; ++dz) {
            // shell only: at least one coordinate at radius r
            if (std::max(std::abs(dx), std::max(std::abs(dy), std::abs(dz))) != r)
              continue;
            const int cz = c[2] + dz;
            if (cz < 0 || cz >= dims[2]) continue;
            any_cell = true;
            const int cc[3] = {cx, cy, cz};
            const long ci = cell_index(cc);
            for (int32_t s = counts[ci]; s < counts[ci + 1]; ++s) {
              const int32_t j = order[s];
              if (j == i) continue;
              const float dx_ = coords[j * 3] - xi;
              const float dy_ = coords[j * 3 + 1] - yi;
              const float dz_ = coords[j * 3 + 2] - zi;
              const float d2 = dx_ * dx_ + dy_ * dy_ + dz_ * dz_;
              cand.push_back({d2, j});
            }
          }
        }
      }
      if (!any_cell && r > 0 && found >= k) break;
      if (static_cast<long>(cand.size()) >= k) {
        std::nth_element(cand.begin(), cand.begin() + (k - 1), cand.end());
        kth_d2 = cand[k - 1].d2;
        found = static_cast<long>(cand.size());
      } else {
        found = static_cast<long>(cand.size());
      }
    }
    const long kk = std::min<long>(k, static_cast<long>(cand.size()));
    std::partial_sort(cand.begin(), cand.begin() + kk, cand.end());
    for (long s = 0; s < kk; ++s) {
      nlist[i * k + s] = cand[s].idx;
      dists[i * k + s] = std::sqrt(cand[s].d2);
    }
    for (long s = kk; s < k; ++s) {
      nlist[i * k + s] = 0;
      dists[i * k + s] = 0.0f;
    }
  }
  };

  unsigned hw = std::thread::hardware_concurrency();
  long n_threads = std::max(1L, std::min<long>(hw ? hw : 1, n / 1024));
  if (n_threads <= 1) {
    process_range(0, n);
  } else {
    std::vector<std::thread> pool;
    const long chunk = (n + n_threads - 1) / n_threads;
    for (long t = 0; t < n_threads; ++t)
      pool.emplace_back(process_range, t * chunk, std::min(n, (t + 1) * chunk));
    for (auto& th : pool) th.join();
  }
  return 0;
}

}  // extern "C"

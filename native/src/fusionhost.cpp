// fusionhost: native host-side runtime for the TPU fusion framework.
//
// C++ equivalents of the reference's host/CPU components (the engine's
// GPU-side work lives in XLA/Pallas; this library covers what the
// reference ran in C++ on the host):
//  - depth-pair packing            (storage layout of m_bufDepthPairs,
//                                   reference gpu_depthmap_fusion.cpp:1583)
//  - LSD radix sort u32 + grouping (reference radix_sort.h / radix_grouper.h,
//                                   OpenMP parallel count/scatter)
//  - counting-sort grouping        (reference uint_grouper.h)
//  - 8-connected component labeling per layer (reference labelVoxels's
//                                   cv::connectedComponentsWithStats role)
//  - Moore contour tracing with Jacob's criterion (cv::findContours role)
//  - point-sequence staging append (reference addPointSequence copy loop)
//
// Exposed as a plain C ABI for ctypes.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// depth pair packing (two u16 per u32, little end first)
// ---------------------------------------------------------------------------
void fh_pack_depth_pairs(const uint16_t* in, uint32_t* out, int64_t n_pairs) {
#pragma omp parallel for
  for (int64_t i = 0; i < n_pairs; ++i) {
    out[i] = (uint32_t)in[2 * i] | ((uint32_t)in[2 * i + 1] << 16);
  }
}

void fh_unpack_depth_pairs(const uint32_t* in, uint16_t* out,
                           int64_t n_pairs) {
#pragma omp parallel for
  for (int64_t i = 0; i < n_pairs; ++i) {
    out[2 * i] = (uint16_t)(in[i] & 0xFFFFu);
    out[2 * i + 1] = (uint16_t)(in[i] >> 16);
  }
}

// ---------------------------------------------------------------------------
// LSD radix sort (4 passes of 8 bits) carrying original indices.
// Parallel per-thread counting + redistribution, mirroring the structure of
// the reference's radixWithRedistribution (radix_sort.h:108-239).
// ---------------------------------------------------------------------------
void fh_radix_sort_u32(const uint32_t* keys, uint32_t* out_keys,
                       uint32_t* out_idx, int64_t n) {
  std::vector<uint32_t> k(keys, keys + n);
  std::vector<uint32_t> idx(n);
  for (int64_t i = 0; i < n; ++i) idx[i] = (uint32_t)i;
  std::vector<uint32_t> k2(n), idx2(n);

  int nt = 1;
#ifdef _OPENMP
  nt = omp_get_max_threads();
#endif
  std::vector<int64_t> counts((size_t)nt * 256);

  for (int pass = 0; pass < 4; ++pass) {
    const int shift = pass * 8;
    std::fill(counts.begin(), counts.end(), 0);
#pragma omp parallel num_threads(nt)
    {
      int t = 0;
#ifdef _OPENMP
      t = omp_get_thread_num();
#endif
      int64_t lo = n * t / nt, hi = n * (t + 1) / nt;
      int64_t* c = &counts[(size_t)t * 256];
      for (int64_t i = lo; i < hi; ++i) c[(k[i] >> shift) & 0xFF]++;
    }
    // skip-pass optimization: all keys share this digit
    {
      bool single = false;
      for (int d = 0; d < 256; ++d) {
        int64_t tot = 0;
        for (int t = 0; t < nt; ++t) tot += counts[(size_t)t * 256 + d];
        if (tot == n) { single = true; break; }
        if (tot > 0 && tot < n) break;
      }
      if (single) continue;
    }
    // exclusive prefix over (digit, thread)
    std::vector<int64_t> offs((size_t)nt * 256);
    int64_t run = 0;
    for (int d = 0; d < 256; ++d) {
      for (int t = 0; t < nt; ++t) {
        offs[(size_t)t * 256 + d] = run;
        run += counts[(size_t)t * 256 + d];
      }
    }
#pragma omp parallel num_threads(nt)
    {
      int t = 0;
#ifdef _OPENMP
      t = omp_get_thread_num();
#endif
      int64_t lo = n * t / nt, hi = n * (t + 1) / nt;
      int64_t* o = &offs[(size_t)t * 256];
      for (int64_t i = lo; i < hi; ++i) {
        int d = (k[i] >> shift) & 0xFF;
        int64_t dst = o[d]++;
        k2[dst] = k[i];
        idx2[dst] = idx[i];
      }
    }
    k.swap(k2);
    idx.swap(idx2);
  }
  std::memcpy(out_keys, k.data(), (size_t)n * 4);
  std::memcpy(out_idx, idx.data(), (size_t)n * 4);
}

// run-length group equal sorted keys (radix_grouper.h:35-64 role)
int64_t fh_group_sorted_u32(const uint32_t* sorted_keys, int64_t n,
                            int64_t* starts, int64_t* sizes,
                            uint32_t* values, int64_t cap) {
  int64_t g = -1;
  for (int64_t i = 0; i < n; ++i) {
    if (i == 0 || sorted_keys[i] != sorted_keys[i - 1]) {
      ++g;
      if (g >= cap) return cap;
      starts[g] = i;
      sizes[g] = 0;
      values[g] = sorted_keys[i];
    }
    sizes[g]++;
  }
  return g + 1;
}

// ---------------------------------------------------------------------------
// 8-connected component labeling (two-pass union-find), cv semantics:
// background 0, labels numbered in raster order of first pixel; returns
// numLabels including background. stats: [label][5] = x, y, w, h, area;
// centroids: [label][2].
// ---------------------------------------------------------------------------
static uint32_t fh_find(std::vector<uint32_t>& parent, uint32_t x) {
  while (parent[x] != x) {
    parent[x] = parent[parent[x]];
    x = parent[x];
  }
  return x;
}

int32_t fh_cc_label_u8(const uint8_t* img, uint16_t* labels, int32_t h,
                       int32_t w, int32_t* stats, double* centroids,
                       int32_t max_labels) {
  std::vector<uint32_t> raw((size_t)h * w, 0);
  std::vector<uint32_t> parent(1, 0);
  // first pass
  for (int32_t y = 0; y < h; ++y) {
    for (int32_t x = 0; x < w; ++x) {
      if (!img[(size_t)y * w + x]) continue;
      uint32_t neigh[4];
      int nn = 0;
      if (y > 0) {
        if (x > 0 && raw[(size_t)(y - 1) * w + x - 1])
          neigh[nn++] = raw[(size_t)(y - 1) * w + x - 1];
        if (raw[(size_t)(y - 1) * w + x])
          neigh[nn++] = raw[(size_t)(y - 1) * w + x];
        if (x + 1 < w && raw[(size_t)(y - 1) * w + x + 1])
          neigh[nn++] = raw[(size_t)(y - 1) * w + x + 1];
      }
      if (x > 0 && raw[(size_t)y * w + x - 1])
        neigh[nn++] = raw[(size_t)y * w + x - 1];
      if (nn == 0) {
        uint32_t nl = (uint32_t)parent.size();
        parent.push_back(nl);
        raw[(size_t)y * w + x] = nl;
      } else {
        uint32_t m = neigh[0];
        for (int i = 1; i < nn; ++i) m = std::min(m, neigh[i]);
        raw[(size_t)y * w + x] = m;
        for (int i = 0; i < nn; ++i) {
          uint32_t ra = fh_find(parent, m);
          uint32_t rb = fh_find(parent, neigh[i]);
          if (ra != rb) parent[std::max(ra, rb)] = std::min(ra, rb);
        }
      }
    }
  }
  // resolve roots -> dense labels in raster order of first pixel
  std::vector<uint16_t> dense(parent.size(), 0);
  std::vector<uint8_t> seen(parent.size(), 0);
  uint16_t next = 1;
  for (int64_t i = 0; i < (int64_t)h * w; ++i) {
    if (!raw[i]) {
      labels[i] = 0;
      continue;
    }
    uint32_t root = fh_find(parent, raw[i]);
    if (!seen[root]) {
      seen[root] = 1;
      dense[root] = (next < max_labels) ? next++ : (uint16_t)(max_labels - 1);
    }
    labels[i] = dense[root];
  }
  int32_t num = next;  // includes background
  if (stats && centroids) {
    for (int32_t l = 0; l < num; ++l) {
      stats[l * 5 + 0] = w;  // min x
      stats[l * 5 + 1] = h;  // min y
      stats[l * 5 + 2] = -1; // max x (temp)
      stats[l * 5 + 3] = -1; // max y (temp)
      stats[l * 5 + 4] = 0;  // area
      centroids[l * 2] = 0;
      centroids[l * 2 + 1] = 0;
    }
    for (int32_t y = 0; y < h; ++y)
      for (int32_t x = 0; x < w; ++x) {
        uint16_t l = labels[(size_t)y * w + x];
        stats[l * 5 + 0] = std::min(stats[l * 5 + 0], x);
        stats[l * 5 + 1] = std::min(stats[l * 5 + 1], y);
        stats[l * 5 + 2] = std::max(stats[l * 5 + 2], x);
        stats[l * 5 + 3] = std::max(stats[l * 5 + 3], y);
        stats[l * 5 + 4]++;
        centroids[l * 2] += x;
        centroids[l * 2 + 1] += y;
      }
    for (int32_t l = 0; l < num; ++l) {
      int32_t area = stats[l * 5 + 4];
      if (area > 0) {
        centroids[l * 2] /= area;
        centroids[l * 2 + 1] /= area;
      }
      stats[l * 5 + 2] -= stats[l * 5 + 0] - 1;  // -> width
      stats[l * 5 + 3] -= stats[l * 5 + 1] - 1;  // -> height
    }
  }
  return num;
}

// ---------------------------------------------------------------------------
// Moore contour tracing (Jacob's stopping criterion), mask != 0 foreground.
// Returns number of contour points written as interleaved (x, y).
// ---------------------------------------------------------------------------
static const int MOORE_DX[8] = {1, 1, 0, -1, -1, -1, 0, 1};
static const int MOORE_DY[8] = {0, 1, 1, 1, 0, -1, -1, -1};

int64_t fh_trace_contour(const uint8_t* mask, int32_t h, int32_t w,
                         int32_t sy, int32_t sx, int32_t* out_xy,
                         int64_t max_pts) {
  auto at = [&](int32_t y, int32_t x) {
    return y >= 0 && y < h && x >= 0 && x < w && mask[(size_t)y * w + x];
  };
  int64_t n = 0;
  if (max_pts < 1) return 0;
  out_xy[0] = sx;
  out_xy[1] = sy;
  n = 1;
  int32_t cy = sy, cx = sx;
  int backtrack = 4;  // entered from the West
  int first_move = -1;
  while (true) {
    int found = -1;
    for (int k = 1; k <= 8; ++k) {
      int d = (backtrack + k) & 7;
      if (at(cy + MOORE_DY[d], cx + MOORE_DX[d])) {
        found = d;
        break;
      }
    }
    if (found < 0) return n;  // isolated pixel
    if (cy == sy && cx == sx) {
      if (first_move < 0)
        first_move = found;
      else if (found == first_move && n > 1)
        return n - 1;  // drop the duplicate start re-entry
    }
    cy += MOORE_DY[found];
    cx += MOORE_DX[found];
    if (n >= max_pts) return n;
    out_xy[2 * n] = cx;
    out_xy[2 * n + 1] = cy;
    ++n;
    backtrack = (found + 4) & 7;
    if (n > 4 * (int64_t)h * w) return n;  // safety backstop
  }
}

// ---------------------------------------------------------------------------
// point-sequence staging append (reference addPointSequence copy loop,
// gpu_depthmap_fusion.cpp:747-796): copy xyz (stride float) with w = 1.
// ---------------------------------------------------------------------------
int64_t fh_stage_points_xyz(const float* xyz, int64_t n, int64_t stride_floats,
                            float* out_xyzw, int64_t cap) {
  int64_t m = std::min(n, cap);
#pragma omp parallel for
  for (int64_t i = 0; i < m; ++i) {
    out_xyzw[4 * i + 0] = xyz[stride_floats * i + 0];
    out_xyzw[4 * i + 1] = xyz[stride_floats * i + 1];
    out_xyzw[4 * i + 2] = xyz[stride_floats * i + 2];
    out_xyzw[4 * i + 3] = 1.0f;
  }
  return m;
}

}  // extern "C"

// Native host-side preprocessing kernels for the data layer.
//
// Replaces the reference's numba.jit point filter (the only compiled code the
// reference has: Highway_bridge/utils/BriPCDMulti.py:179-189) and the Open3D
// voxel downsampler (utils/BriPCDMulti_comp.py:521-564) with plain C++,
// exposed through ctypes (pointcloud_bridge_tpu/data/native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libpcbpre.so preproc.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>
#include <cmath>

extern "C" {

// Mask of points inside the xy box whose z lies within +-z_threshold of the
// box z-center (BriPCDMulti.find_points_in_block semantics).
void points_in_block_mask(const float* points, int64_t n,
                          const float* block_min, const float* block_max,
                          float z_threshold, uint8_t* mask_out) {
  const float zc = 0.5f * (block_min[2] + block_max[2]);
  for (int64_t i = 0; i < n; ++i) {
    const float x = points[3 * i], y = points[3 * i + 1], z = points[3 * i + 2];
    mask_out[i] = (x >= block_min[0] && x <= block_max[0] &&
                   y >= block_min[1] && y <= block_max[1] &&
                   std::fabs(z - zc) <= z_threshold)
                      ? 1
                      : 0;
  }
}

// Batched variant: one mask row per block center (xy box of size block_size
// centered at each center, z within +-z_threshold of the center z).
void multi_block_masks(const float* points, int64_t n, const float* centers,
                       int64_t m, float block_size, float z_threshold,
                       uint8_t* mask_out /* m x n */) {
  const float h = 0.5f * block_size;
  for (int64_t b = 0; b < m; ++b) {
    const float cx = centers[3 * b], cy = centers[3 * b + 1],
                cz = centers[3 * b + 2];
    uint8_t* row = mask_out + b * n;
    for (int64_t i = 0; i < n; ++i) {
      const float x = points[3 * i], y = points[3 * i + 1],
                  z = points[3 * i + 2];
      row[i] = (x >= cx - h && x <= cx + h && y >= cy - h && y <= cy + h &&
                std::fabs(z - cz) <= z_threshold)
                   ? 1
                   : 0;
    }
  }
}

struct Key3 {
  int64_t x, y, z;
  bool operator==(const Key3& o) const { return x == o.x && y == o.y && z == o.z; }
};
struct Key3Hash {
  size_t operator()(const Key3& k) const {
    size_t h = static_cast<size_t>(k.x) * 73856093u;
    h ^= static_cast<size_t>(k.y) * 19349663u;
    h ^= static_cast<size_t>(k.z) * 83492791u;
    return h;
  }
};

// First-point-per-voxel downsampling (WL_iden.data_voxel semantics: keep the
// first point encountered in each voxel, in index order). Returns the number
// of selected indices written to idx_out (caller allocates n entries).
int64_t voxel_first_indices(const double* points, int64_t n, double voxel_size,
                            int64_t* idx_out) {
  std::unordered_map<Key3, int64_t, Key3Hash> seen;
  seen.reserve(static_cast<size_t>(n));
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    Key3 k{static_cast<int64_t>(std::floor(points[3 * i] / voxel_size)),
           static_cast<int64_t>(std::floor(points[3 * i + 1] / voxel_size)),
           static_cast<int64_t>(std::floor(points[3 * i + 2] / voxel_size))};
    auto it = seen.find(k);
    if (it == seen.end()) {
      seen.emplace(k, i);
      idx_out[count++] = i;
    }
  }
  return count;
}

// Voxel-centroid downsampling: writes centroids (caller allocates 3n) and the
// voxel id of every input point; returns the number of voxels.
int64_t voxel_centroids(const double* points, int64_t n, double voxel_size,
                        double* centroids_out, int64_t* voxel_id_out) {
  std::unordered_map<Key3, int64_t, Key3Hash> ids;
  ids.reserve(static_cast<size_t>(n));
  std::vector<double> sums;
  std::vector<int64_t> counts;
  for (int64_t i = 0; i < n; ++i) {
    Key3 k{static_cast<int64_t>(std::floor(points[3 * i] / voxel_size)),
           static_cast<int64_t>(std::floor(points[3 * i + 1] / voxel_size)),
           static_cast<int64_t>(std::floor(points[3 * i + 2] / voxel_size))};
    auto it = ids.find(k);
    int64_t vid;
    if (it == ids.end()) {
      vid = static_cast<int64_t>(ids.size());
      ids.emplace(k, vid);
      sums.resize(3 * (vid + 1), 0.0);
      counts.resize(vid + 1, 0);
    } else {
      vid = it->second;
    }
    voxel_id_out[i] = vid;
    sums[3 * vid] += points[3 * i];
    sums[3 * vid + 1] += points[3 * i + 1];
    sums[3 * vid + 2] += points[3 * i + 2];
    counts[vid] += 1;
  }
  const int64_t m = static_cast<int64_t>(ids.size());
  for (int64_t v = 0; v < m; ++v) {
    centroids_out[3 * v] = sums[3 * v] / counts[v];
    centroids_out[3 * v + 1] = sums[3 * v + 1] / counts[v];
    centroids_out[3 * v + 2] = sums[3 * v + 2] / counts[v];
  }
  return m;
}

// Per-class histogram of int32 labels (hot in class-weight computation).
void label_histogram(const int32_t* labels, int64_t n, int32_t num_classes,
                     int64_t* hist_out) {
  std::memset(hist_out, 0, sizeof(int64_t) * num_classes);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t l = labels[i];
    if (l >= 0 && l < num_classes) hist_out[l] += 1;
  }
}

// Decode raw LAS point records in one pass: int32 xyz -> scaled float64,
// optional u16 rgb triplet, classification byte (masked), u16 intensity.
// Replaces four strided numpy passes over the record buffer (data/lasio.py).
void las_decode(const uint8_t* body, int64_t n, int32_t record_len,
                int32_t rgb_off, int32_t cls_off, int32_t cls_mask,
                const double* scale, const double* offset, double* xyz_out,
                uint16_t* rgb_out, uint8_t* cls_out, uint16_t* int_out) {
  const double sx = scale[0], sy = scale[1], sz = scale[2];
  const double ox = offset[0], oy = offset[1], oz = offset[2];
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* rec = body + i * record_len;
    int32_t v[3];
    std::memcpy(v, rec, 12);
    xyz_out[3 * i] = v[0] * sx + ox;
    xyz_out[3 * i + 1] = v[1] * sy + oy;
    xyz_out[3 * i + 2] = v[2] * sz + oz;
    uint16_t inten;
    std::memcpy(&inten, rec + 12, 2);
    int_out[i] = inten;
    cls_out[i] = rec[cls_off] & static_cast<uint8_t>(cls_mask);
    if (rgb_off >= 0) std::memcpy(rgb_out + 3 * i, rec + rgb_off, 6);
  }
}

// ---------------------------------------------------------------------------
// Sliding-grid cell membership (data/blocks.py::_grid_cell_members).
//
// A point covers a CONTIGUOUS run of overlapping windows per axis, found by
// binary search on the monotone window-threshold arrays (identical
// semantics to np.searchsorted: lo = searchsorted(hi_t, x, 'left'),
// hi = searchsorted(lo_t, x, 'right') - 1). The numpy path then
// materializes all (cell, point) pairs and stable-sorts by cell (~13M
// int32 keys at 5M points); here a counting sort over cells replaces the
// comparison sort entirely: histogram -> exclusive scan -> scatter in
// ascending point order, which preserves the point-ascending-within-cell
// contract by construction.

// Pass 1: per-point window ranges + total pair count.
int64_t grid_ranges(const double* xs, const double* ys, int64_t n,
                    const double* lox, const double* hix, int64_t gx,
                    const double* loy, const double* hiy, int64_t gy,
                    int32_t* ix_lo, int32_t* ix_hi, int32_t* iy_lo,
                    int32_t* iy_hi) {
  int64_t total = 0;
  for (int64_t i = 0; i < n; ++i) {
    const double x = xs[i], y = ys[i];
    // first window with hi >= x  (searchsorted left on the hi thresholds)
    int64_t xl = std::lower_bound(hix, hix + gx, x) - hix;
    // last window with lo <= x  (searchsorted right on the lo thresholds - 1)
    int64_t xh = std::upper_bound(lox, lox + gx, x) - lox - 1;
    int64_t yl = std::lower_bound(hiy, hiy + gy, y) - hiy;
    int64_t yh = std::upper_bound(loy, loy + gy, y) - loy - 1;
    ix_lo[i] = static_cast<int32_t>(xl);
    ix_hi[i] = static_cast<int32_t>(xh);
    iy_lo[i] = static_cast<int32_t>(yl);
    iy_hi[i] = static_cast<int32_t>(yh);
    const int64_t cx = xh >= xl ? xh - xl + 1 : 0;
    const int64_t cy = yh >= yl ? yh - yl + 1 : 0;
    total += cx * cy;
  }
  return total;
}

// Pass 2: counting-sort scatter. offsets: gx*gy+1 int64, filled with the
// exclusive pair-count scan (cell c's point ids land at
// point_out[offsets[c] : offsets[c+1]], ascending). Returns the number of
// nonempty cells.
int64_t grid_scatter(const int32_t* ix_lo, const int32_t* ix_hi,
                     const int32_t* iy_lo, const int32_t* iy_hi, int64_t n,
                     int64_t gx, int64_t gy, int64_t* offsets,
                     int32_t* point_out) {
  const int64_t cells = gx * gy;
  std::vector<int64_t> cnt(cells, 0);
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t jy = iy_lo[i]; jy <= iy_hi[i]; ++jy) {
      const int64_t base = jy * gx;
      for (int64_t jx = ix_lo[i]; jx <= ix_hi[i]; ++jx) cnt[base + jx] += 1;
    }
  }
  int64_t run = 0, nonempty = 0;
  for (int64_t c = 0; c < cells; ++c) {
    offsets[c] = run;
    run += cnt[c];
    if (cnt[c]) ++nonempty;
  }
  offsets[cells] = run;
  std::vector<int64_t> cur(offsets, offsets + cells);
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t jy = iy_lo[i]; jy <= iy_hi[i]; ++jy) {
      const int64_t base = jy * gx;
      for (int64_t jx = ix_lo[i]; jx <= ix_hi[i]; ++jx)
        point_out[cur[base + jx]++] = static_cast<int32_t>(i);
    }
  }
  return nonempty;
}

}  // extern "C"


// lvislam_native — the host-side data plane in C++.
//
// The reference's runtime around the estimators is native C++ (ROS executors,
// PCL conversions, message (de)serialization). The TPU build keeps the same
// split: JAX/XLA owns the device compute; this library owns the host data
// plane — sensor packet decoding, fixed-capacity padding, voxel prefilters
// and IMU window assembly — the per-message work that sits between IO and
// the jitted kernels. Exposed as a plain C ABI for ctypes
// (`lvislam_tpu/utils/native.py`); every function is allocation-free on the
// hot path and safe to call from a single scheduler thread.
//
// Reference touchpoints:
//  - decode_pointcloud2: pcl::fromROSMsg / moveFromCustomMsg
//    (`lidar_odometry/src/imageProjection.cpp:240-260`)
//  - pad/window helpers: the deque scans of `imageProjection.cpp:354-410`
//    and `estimator_node.cpp:179-216`
//  - voxel_prefilter: the host-side face of pcl::VoxelGrid (the exact
//    centroid version runs on device, `ops/pointcloud.py`).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// Decode a PointCloud2-style packed binary blob into padded SoA arrays.
// field offsets < 0 mean "absent". Returns the number of valid points
// written (<= capacity).
int decode_pointcloud2(
    const uint8_t* data, int64_t n_points, int32_t point_step,
    int32_t off_x, int32_t off_y, int32_t off_z,
    int32_t off_intensity, int32_t off_ring, int32_t off_time,
    int32_t ring_is_uint8,  // livox CustomMsg line field is u8
    int64_t capacity,
    float* xyz_out,        // (capacity, 3)
    float* intensity_out,  // (capacity,)
    int32_t* ring_out,     // (capacity,)
    float* time_out,       // (capacity,)
    uint8_t* valid_out) {  // (capacity,)
  int64_t n = n_points < capacity ? n_points : capacity;
  int64_t w = 0;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = data + i * point_step;
    float x, y, z;
    std::memcpy(&x, p + off_x, 4);
    std::memcpy(&y, p + off_y, 4);
    std::memcpy(&z, p + off_z, 4);
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    xyz_out[w * 3 + 0] = x;
    xyz_out[w * 3 + 1] = y;
    xyz_out[w * 3 + 2] = z;
    if (off_intensity >= 0) {
      std::memcpy(&intensity_out[w], p + off_intensity, 4);
    } else {
      intensity_out[w] = 0.f;
    }
    if (off_ring >= 0) {
      if (ring_is_uint8) {
        ring_out[w] = p[off_ring];
      } else {
        uint16_t r;
        std::memcpy(&r, p + off_ring, 2);
        ring_out[w] = r;
      }
    } else {
      ring_out[w] = 0;
    }
    if (off_time >= 0) {
      std::memcpy(&time_out[w], p + off_time, 4);
    } else {
      time_out[w] = 0.f;
    }
    valid_out[w] = 1;
    ++w;
  }
  for (int64_t i = w; i < capacity; ++i) {
    xyz_out[i * 3 + 0] = xyz_out[i * 3 + 1] = xyz_out[i * 3 + 2] = 0.f;
    intensity_out[i] = 0.f;
    ring_out[i] = 0;
    time_out[i] = 0.f;
    valid_out[i] = 0;
  }
  return (int)w;
}

// Assemble the IMU samples in (t0, t1] from ring-style arrays into a padded
// window: dts/accs/gyros with trailing repeats (the padding convention the
// preintegration kernels expect: dt==0 no-ops).
int imu_window(
    const double* stamps, const float* gyro, const float* acc, int64_t n,
    double t0, double t1, int64_t capacity,
    float* dts_out, float* acc_out, float* gyro_out) {
  // binary search for first stamp > t0
  int64_t lo = 0, hi = n;
  while (lo < hi) {
    int64_t mid = (lo + hi) / 2;
    if (stamps[mid] <= t0) lo = mid + 1; else hi = mid;
  }
  int64_t w = 0;
  double prev = t0;
  for (int64_t i = lo; i < n && w < capacity; ++i) {
    if (stamps[i] > t1) break;
    dts_out[w] = (float)(stamps[i] - prev);
    prev = stamps[i];
    for (int k = 0; k < 3; ++k) {
      acc_out[w * 3 + k] = acc[i * 3 + k];
      gyro_out[w * 3 + k] = gyro[i * 3 + k];
    }
    ++w;
  }
  for (int64_t i = w; i < capacity; ++i) {
    dts_out[i] = 0.f;
    for (int k = 0; k < 3; ++k) {
      acc_out[i * 3 + k] = w ? acc_out[(w - 1) * 3 + k] : 0.f;
      gyro_out[i * 3 + k] = w ? gyro_out[(w - 1) * 3 + k] : 0.f;
    }
  }
  return (int)w;
}

// Host-side voxel prefilter (first-point-per-voxel, open-addressed hash):
// thins oversampled clouds before upload. Exact centroid downsampling runs
// on device; this is the bandwidth guard.
int voxel_prefilter(
    const float* xyz, const uint8_t* valid, int64_t n, float leaf,
    int64_t capacity, float* xyz_out, uint8_t* valid_out) {
  int64_t table_size = 1;
  while (table_size < n * 2) table_size <<= 1;
  std::vector<int64_t> table(table_size, -1);
  const float inv_leaf = 1.0f / leaf;
  int64_t w = 0;
  for (int64_t i = 0; i < n && w < capacity; ++i) {
    if (!valid[i]) continue;
    int64_t cx = (int64_t)std::floor(xyz[i * 3 + 0] * inv_leaf) + (1 << 20);
    int64_t cy = (int64_t)std::floor(xyz[i * 3 + 1] * inv_leaf) + (1 << 20);
    int64_t cz = (int64_t)std::floor(xyz[i * 3 + 2] * inv_leaf) + (1 << 20);
    uint64_t h = (uint64_t)(cx * 73856093ULL ^ cy * 19349669ULL ^ cz * 83492791ULL);
    uint64_t slot = h & (table_size - 1);
    int64_t key = (cx << 42) | (cy << 21) | cz;
    bool fresh = true;
    for (;;) {
      int64_t cur = table[slot];
      if (cur == -1) {
        table[slot] = key;
        break;
      }
      if (cur == key) {
        fresh = false;
        break;
      }
      slot = (slot + 1) & (table_size - 1);
    }
    if (fresh) {
      xyz_out[w * 3 + 0] = xyz[i * 3 + 0];
      xyz_out[w * 3 + 1] = xyz[i * 3 + 1];
      xyz_out[w * 3 + 2] = xyz[i * 3 + 2];
      valid_out[w] = 1;
      ++w;
    }
  }
  for (int64_t i = w; i < capacity; ++i) {
    xyz_out[i * 3 + 0] = xyz_out[i * 3 + 1] = xyz_out[i * 3 + 2] = 0.f;
    valid_out[i] = 0;
  }
  return (int)w;
}

}  // extern "C"

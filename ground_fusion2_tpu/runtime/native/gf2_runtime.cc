// gf2 native runtime: sensor ring buffers, measurement synchronization,
// point-cloud preprocessing, and a TLV dataset log.
//
// This is the host-side runtime the reference implements with ROS queues +
// hand-rolled mutexes (rosNodeTest.cpp:42-64 buffers, sync_process:305-598
// 3ms image pairing, lidarodom.cpp:1433-1542 measure groups,
// main_eskf.cpp:48-110 subsample+sort). Rebuilt as a dependency-free C++17
// library with a C ABI for ctypes: the Python/JAX side owns device compute,
// this library owns high-rate host bookkeeping.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <unordered_map>
#include <vector>

extern "C" {

// ----------------------------------------------------------------- types
struct ImuSample { double t; float acc[3]; float gyr[3]; };
struct WheelSample { double t; float vel[3]; };
struct StampedId { double t; int64_t id; };

// ------------------------------------------------------ measurement sync
struct Synchronizer {
  std::mutex mu;
  std::deque<ImuSample> imu;
  std::deque<WheelSample> wheel;
  std::deque<StampedId> color;      // color frames
  std::deque<StampedId> depth;      // depth frames
  std::deque<StampedId> cloud;      // lidar sweeps (t = sweep end)
  double depth_tol = 0.003;         // reference 3 ms pairing
  double last_camera_t = -1.0;
  double last_cloud_t = -1.0;
  size_t max_queue = 4096;

  void trim() {
    while (imu.size() > max_queue) imu.pop_front();
    while (wheel.size() > max_queue) wheel.pop_front();
    while (color.size() > 512) color.pop_front();
    while (depth.size() > 512) depth.pop_front();
    while (cloud.size() > 512) cloud.pop_front();
  }
};

void* gf2_sync_create(double depth_tol) {
  auto* s = new Synchronizer();
  if (depth_tol > 0) s->depth_tol = depth_tol;
  return s;
}

void gf2_sync_destroy(void* h) { delete static_cast<Synchronizer*>(h); }

void gf2_sync_push_imu(void* h, double t, const float* acc, const float* gyr) {
  auto* s = static_cast<Synchronizer*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  ImuSample smp; smp.t = t;
  std::memcpy(smp.acc, acc, 12);
  std::memcpy(smp.gyr, gyr, 12);
  s->imu.push_back(smp);
  s->trim();
}

void gf2_sync_push_wheel(void* h, double t, const float* vel) {
  auto* s = static_cast<Synchronizer*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  WheelSample smp; smp.t = t;
  std::memcpy(smp.vel, vel, 12);
  s->wheel.push_back(smp);
  s->trim();
}

void gf2_sync_push_color(void* h, double t, int64_t id) {
  auto* s = static_cast<Synchronizer*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  s->color.push_back({t, id});
  s->trim();
}

void gf2_sync_push_depth(void* h, double t, int64_t id) {
  auto* s = static_cast<Synchronizer*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  s->depth.push_back({t, id});
  s->trim();
}

void gf2_sync_push_cloud(void* h, double t_end, int64_t id) {
  auto* s = static_cast<Synchronizer*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  s->cloud.push_back({t_end, id});
  s->trim();
}

// Pop one synchronized camera group: a color frame whose depth partner is
// within tol and whose IMU coverage extends past the frame stamp. Returns 1
// on success. IMU/wheel samples in (last_camera_t, t] are copied out
// (bounded by max_n; *n_imu set to the count, endpoint sample included).
int gf2_sync_pop_camera(void* h, double* t_out, int64_t* color_id,
                        int64_t* depth_id, ImuSample* imu_out,
                        WheelSample* wheel_out, int max_n, int* n_imu) {
  auto* s = static_cast<Synchronizer*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  while (!s->color.empty()) {
    StampedId c = s->color.front();
    // find depth partner (reference: 0.003 s window)
    int64_t dep = -1;
    while (!s->depth.empty() && s->depth.front().t < c.t - s->depth_tol)
      s->depth.pop_front();
    if (!s->depth.empty() &&
        std::abs(s->depth.front().t - c.t) <= s->depth_tol)
      dep = s->depth.front().id;
    // IMU coverage: need a sample at/after the frame stamp
    if (s->imu.empty() || s->imu.back().t < c.t) return 0;  // wait
    s->color.pop_front();

    double t0 = s->last_camera_t;
    int n = 0;
    for (const auto& m : s->imu) {
      if (m.t <= t0) continue;
      if (n < max_n) imu_out[n] = m;
      if (m.t >= c.t) { n = std::min(n + 1, max_n); break; }
      n = std::min(n + 1, max_n);
    }
    int nw = 0;
    for (const auto& m : s->wheel) {
      if (m.t <= t0 || m.t > c.t + 1e-9) continue;
      if (nw < max_n) wheel_out[nw++] = m;
    }
    // pad wheel to n with last sample (aligned arrays for the estimator)
    if (nw > 0) {
      for (; nw < n && nw < max_n; ++nw) wheel_out[nw] = wheel_out[nw - 1];
    } else {
      for (; nw < n && nw < max_n; ++nw) {
        wheel_out[nw].t = imu_out[nw].t;
        wheel_out[nw].vel[0] = wheel_out[nw].vel[1] = wheel_out[nw].vel[2] = 0;
      }
    }
    // drop consumed imu/wheel (keep one overlap sample for the next group)
    while (!s->imu.empty() && s->imu.front().t < c.t - 1e-9) s->imu.pop_front();
    while (!s->wheel.empty() && s->wheel.front().t < c.t - 1e-9)
      s->wheel.pop_front();
    s->last_camera_t = c.t;
    *t_out = c.t;
    *color_id = c.id;
    *depth_id = dep;
    *n_imu = n;
    return 1;
  }
  return 0;
}

// ------------------------------------------------- point preprocessing
// Grid subsample + time sort (reference subSampleFrame + std::sort by
// timestamp): keeps the first point per voxel cell, emits indices sorted by
// per-point time. Returns number of selected points.
int gf2_grid_subsample(const float* xyz, const float* times, int n,
                       float voxel, int32_t* out_idx, int max_out) {
  std::unordered_map<uint64_t, int32_t> cells;
  cells.reserve(static_cast<size_t>(n) * 2);
  std::vector<int32_t> sel;
  sel.reserve(std::min(n, max_out));
  const float inv = 1.0f / voxel;
  for (int i = 0; i < n; ++i) {
    int64_t ix = static_cast<int64_t>(std::floor(xyz[3 * i + 0] * inv));
    int64_t iy = static_cast<int64_t>(std::floor(xyz[3 * i + 1] * inv));
    int64_t iz = static_cast<int64_t>(std::floor(xyz[3 * i + 2] * inv));
    uint64_t key = (static_cast<uint64_t>(ix & 0x1FFFFF)) |
                   (static_cast<uint64_t>(iy & 0x1FFFFF) << 21) |
                   (static_cast<uint64_t>(iz & 0x1FFFFF) << 42);
    auto it = cells.find(key);
    if (it == cells.end()) {
      cells.emplace(key, i);
      sel.push_back(i);
      if (static_cast<int>(sel.size()) >= max_out) break;
    }
  }
  std::sort(sel.begin(), sel.end(), [times](int32_t a, int32_t b) {
    return times[a] < times[b];
  });
  const int m = static_cast<int>(sel.size());
  std::memcpy(out_idx, sel.data(), sizeof(int32_t) * m);
  return m;
}

// --------------------------------------------------------- TLV data log
// Record: [u32 type][u32 size][f64 t][payload bytes]. Sequential reader.
struct LogWriter { FILE* f; };
struct LogReader { FILE* f; };

void* gf2_log_open_write(const char* path) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  auto* w = new LogWriter{f};
  return w;
}

void gf2_log_write(void* h, uint32_t type, double t, const void* data,
                   uint32_t size) {
  auto* w = static_cast<LogWriter*>(h);
  std::fwrite(&type, 4, 1, w->f);
  std::fwrite(&size, 4, 1, w->f);
  std::fwrite(&t, 8, 1, w->f);
  if (size) std::fwrite(data, 1, size, w->f);
}

void gf2_log_close_write(void* h) {
  auto* w = static_cast<LogWriter*>(h);
  std::fclose(w->f);
  delete w;
}

void* gf2_log_open_read(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  return new LogReader{f};
}

// Returns payload size, or -1 at EOF. Payload copied into buf (≤ max).
int64_t gf2_log_read(void* h, uint32_t* type, double* t, void* buf,
                     uint32_t max) {
  auto* r = static_cast<LogReader*>(h);
  uint32_t ty, size;
  if (std::fread(&ty, 4, 1, r->f) != 1) return -1;
  if (std::fread(&size, 4, 1, r->f) != 1) return -1;
  if (std::fread(t, 8, 1, r->f) != 1) return -1;
  *type = ty;
  uint32_t to_read = size < max ? size : max;
  if (to_read && std::fread(buf, 1, to_read, r->f) != to_read) return -1;
  if (size > to_read) std::fseek(r->f, size - to_read, SEEK_CUR);
  return size;
}

void gf2_log_close_read(void* h) {
  auto* r = static_cast<LogReader*>(h);
  std::fclose(r->f);
  delete r;
}

}  // extern "C"

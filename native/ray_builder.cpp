// Native data-path core: ray-record building, weighted reservoir sampling,
// z-buffered depth maps.
//
// The reference framework's per-sample CPU hot path reads 42 image + 42
// sparse-GT files and assembles up to ~1M 16-float ray records before
// weighted subsampling (`mmdet3d/datasets/nuscenes_dataset_occ.py:197-270`,
// `ray.py:59-119`). Python/numpy spends most of that in per-camera small-op
// overhead; this library does the assembly in tight multithreaded loops and
// is exposed through ctypes (see preworld_tpu/data/native.py) with a pure
// numpy fallback when the .so is absent.
//
// Build: make -C native   (g++ -O3 -shared; no external deps)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <random>
#include <thread>
#include <vector>

extern "C" {

// Pack per-pixel labels into 16-float ray records (parity: `ray.py:34-56`).
//   coor:(n,2) f32 pixel xy; depth:(n,) f32; seg:(n,) f32; rgb:(n,3) f32
//   c2w:(4,4) f32 row-major; K:(3,3) f32
//   out:(n,16): [u, v, depth, seg, rays_o(3), rays_d(3), viewdirs(3), rgb(3)]
void build_ray_records(const float* coor, const float* depth, const float* seg,
                       const float* rgb, const float* c2w, const float* K,
                       int64_t n, float* out) {
  const float fx = K[0], cx = K[2], fy = K[4], cy = K[5];
  const float r00 = c2w[0], r01 = c2w[1], r02 = c2w[2], tx = c2w[3];
  const float r10 = c2w[4], r11 = c2w[5], r12 = c2w[6], ty = c2w[7];
  const float r20 = c2w[8], r21 = c2w[9], r22 = c2w[10], tz = c2w[11];

  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const float u = coor[2 * i], v = coor[2 * i + 1];
      const float dx = (u + 0.5f - cx) / fx;
      const float dy = (v + 0.5f - cy) / fy;
      // rays_d = R @ [dx, dy, 1]
      const float rdx = r00 * dx + r01 * dy + r02;
      const float rdy = r10 * dx + r11 * dy + r12;
      const float rdz = r20 * dx + r21 * dy + r22;
      const float inv = 1.0f / std::sqrt(rdx * rdx + rdy * rdy + rdz * rdz);
      float* o = out + 16 * i;
      o[0] = u; o[1] = v; o[2] = depth[i]; o[3] = seg[i];
      o[4] = tx; o[5] = ty; o[6] = tz;
      o[7] = rdx; o[8] = rdy; o[9] = rdz;
      o[10] = rdx * inv; o[11] = rdy * inv; o[12] = rdz * inv;
      o[13] = rgb[3 * i]; o[14] = rgb[3 * i + 1]; o[15] = rgb[3 * i + 2];
    }
  };
  const int nt = std::max(1u, std::thread::hardware_concurrency() / 2);
  if (n < 8192 || nt == 1) { work(0, n); return; }
  std::vector<std::thread> ts;
  const int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(work, lo, hi);
  }
  for (auto& t : ts) t.join();
}

// Weighted sampling WITHOUT replacement via the exponential-sort trick
// (parity: torch WeightedRandomSampler(replacement=False), `ray.py:116-118`).
// Writes k selected indices (unordered) into out_idx.
void wrs_topk(const float* weights, int64_t n, int64_t k, uint64_t seed,
              int64_t* out_idx) {
  std::mt19937_64 rng(seed);
  std::exponential_distribution<float> expo(1.0f);
  std::vector<std::pair<float, int64_t>> keys(n);
  for (int64_t i = 0; i < n; ++i) {
    const float w = std::max(weights[i], 1e-12f);
    keys[i] = {expo(rng) / w, i};
  }
  if (k < n) {
    std::nth_element(keys.begin(), keys.begin() + k, keys.end());
  }
  const int64_t m = std::min(k, n);
  for (int64_t i = 0; i < m; ++i) out_idx[i] = keys[i].second;
}

// Z-buffered sparse depth map (parity: `loading.py:768-787`): nearest depth
// per pixel cell, depth range filtered.
void zbuffer_depth_map(const float* pts_uvz, int64_t n, int64_t height,
                       int64_t width, float d_lo, float d_hi, float* out) {
  std::memset(out, 0, sizeof(float) * height * width);
  std::vector<float> best(height * width, 1e30f);
  for (int64_t i = 0; i < n; ++i) {
    const float u = std::round(pts_uvz[3 * i]);
    const float v = std::round(pts_uvz[3 * i + 1]);
    const float d = pts_uvz[3 * i + 2];
    if (u < 0 || u >= width || v < 0 || v >= height || d < d_lo || d >= d_hi)
      continue;
    const int64_t idx = int64_t(v) * width + int64_t(u);
    if (d < best[idx]) { best[idx] = d; out[idx] = d; }
  }
}

}  // extern "C"

// phc_native: host-side native kernels for the TPU-PHC framework.
//
// Native-code census parity with the reference (SURVEY.md §2 native census):
//   * phc_gae            — reverse-scan GAE, the role of the reference's
//                          Cython kernel (`puffer_phc/c_gae.pyx:11-32`),
//                          vectorized over env columns and threaded. Used as
//                          the host oracle for the lax.scan implementation
//                          and for host-side pipelines.
//   * phc_fk             — batched skeleton forward kinematics over frames,
//                          the hot loop of motion preprocessing (the
//                          reference runs this in torch across worker
//                          processes, `motion_lib.py:336-368`).
//   * phc_motion_derivatives — linear/angular/dof velocities with Gaussian
//                          smoothing (reference poselib:1231-1251,
//                          motion_lib.py:119-140).
//
// Plain C ABI (ctypes-friendly), no external dependencies. Build:
//   g++ -O3 -march=native -shared -fPIC -o libphc_native.so phc_native.cpp -lpthread

#include <cmath>
#include <cstring>
#include <functional>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

struct Quat { float x, y, z, w; };

inline Quat qmul(const Quat& a, const Quat& b) {
  return Quat{
      a.w * b.x + a.x * b.w + a.y * b.z - a.z * b.y,
      a.w * b.y - a.x * b.z + a.y * b.w + a.z * b.x,
      a.w * b.z + a.x * b.y - a.y * b.x + a.z * b.w,
      a.w * b.w - a.x * b.x - a.y * b.y - a.z * b.z,
  };
}

inline Quat qconj(const Quat& q) { return Quat{-q.x, -q.y, -q.z, q.w}; }

inline Quat qnormalize(Quat q) {
  if (q.w < 0) { q.x = -q.x; q.y = -q.y; q.z = -q.z; q.w = -q.w; }
  float n = std::sqrt(q.x * q.x + q.y * q.y + q.z * q.z + q.w * q.w);
  if (n < 1e-9f) n = 1e-9f;
  q.x /= n; q.y /= n; q.z /= n; q.w /= n;
  return q;
}

inline void qrotate(const Quat& q, const float v[3], float out[3]) {
  // v' = v(2w^2-1) + 2w (qv x v) + 2 qv (qv . v)
  const float w2 = 2.0f * q.w * q.w - 1.0f;
  const float cx = q.y * v[2] - q.z * v[1];
  const float cy = q.z * v[0] - q.x * v[2];
  const float cz = q.x * v[1] - q.y * v[0];
  const float d = q.x * v[0] + q.y * v[1] + q.z * v[2];
  out[0] = v[0] * w2 + 2.0f * q.w * cx + 2.0f * q.x * d;
  out[1] = v[1] * w2 + 2.0f * q.w * cy + 2.0f * q.y * d;
  out[2] = v[2] * w2 + 2.0f * q.w * cz + 2.0f * q.z * d;
}

void parallel_for(int n, const std::function<void(int, int)>& fn) {
  const int hw = std::max(1u, std::thread::hardware_concurrency());
  const int workers = std::min(hw, std::max(1, n / 64));
  if (workers <= 1) { fn(0, n); return; }
  std::vector<std::thread> ts;
  const int chunk = (n + workers - 1) / workers;
  for (int i = 0; i < workers; ++i) {
    const int lo = i * chunk;
    const int hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(fn, lo, hi);
  }
  for (auto& t : ts) t.join();
}

// 1D Gaussian filter along the frame axis, mode="nearest", truncate=4
// (matches scipy.ndimage.gaussian_filter1d used by reference poselib).
void gaussian_filter_frames(float* data, int F, int C, float sigma) {
  const int radius = static_cast<int>(4.0f * sigma + 0.5f);
  std::vector<float> w(2 * radius + 1);
  float sum = 0.0f;
  for (int i = -radius; i <= radius; ++i) {
    w[i + radius] = std::exp(-0.5f * (i * i) / (sigma * sigma));
    sum += w[i + radius];
  }
  for (auto& v : w) v /= sum;

  std::vector<float> tmp(static_cast<size_t>(F) * C);
  parallel_for(C, [&](int lo, int hi) {
    for (int c = lo; c < hi; ++c) {
      for (int f = 0; f < F; ++f) {
        float acc = 0.0f;
        for (int k = -radius; k <= radius; ++k) {
          int src = std::min(std::max(f + k, 0), F - 1);  // nearest
          acc += w[k + radius] * data[static_cast<size_t>(src) * C + c];
        }
        tmp[static_cast<size_t>(f) * C + c] = acc;
      }
    }
  });
  std::memcpy(data, tmp.data(), tmp.size() * sizeof(float));
}

}  // namespace

extern "C" {

// Reverse-scan GAE over time-major (T, B) arrays, reference formula
// (c_gae.pyx:24-31): delta[t] = r[t+1] + gamma V[t+1] (1-d[t+1]) - V[t],
// adv[T-1] = 0. Threaded over env columns.
void phc_gae(const float* dones, const float* values, const float* rewards,
             int T, int B, float gamma, float lam, float* adv) {
  parallel_for(B, [&](int lo, int hi) {
    for (int b = lo; b < hi; ++b) {
      float lastgaelam = 0.0f;
      adv[static_cast<size_t>(T - 1) * B + b] = 0.0f;
      for (int t = T - 2; t >= 0; --t) {
        const size_t i = static_cast<size_t>(t) * B + b;
        const size_t in = static_cast<size_t>(t + 1) * B + b;
        const float nonterminal = 1.0f - dones[in];
        const float delta = rewards[in] + gamma * values[in] * nonterminal - values[i];
        lastgaelam = delta + gamma * lam * nonterminal * lastgaelam;
        adv[i] = lastgaelam;
      }
    }
  });
}

// Skeleton FK over F independent frames. local_rot: (F, J, 4) xyzw;
// trans: (F, 3); parents: (J,) with parents[0] == -1 and parents[i] < i
// (topologically sorted); local_t: (J, 3). Outputs grs (F, J, 4),
// gts (F, J, 3). Threaded over frames.
void phc_fk(const float* local_rot, const float* trans, const int* parents,
            const float* local_t, int F, int J, float* grs, float* gts) {
  parallel_for(F, [&](int lo, int hi) {
    for (int f = lo; f < hi; ++f) {
      const float* lr = local_rot + static_cast<size_t>(f) * J * 4;
      float* gr = grs + static_cast<size_t>(f) * J * 4;
      float* gt = gts + static_cast<size_t>(f) * J * 3;
      for (int j = 0; j < J; ++j) {
        Quat lq{lr[j * 4 + 0], lr[j * 4 + 1], lr[j * 4 + 2], lr[j * 4 + 3]};
        const int p = parents[j];
        if (p < 0) {
          Quat q = qnormalize(lq);
          gr[0] = q.x; gr[1] = q.y; gr[2] = q.z; gr[3] = q.w;
          gt[0] = trans[f * 3]; gt[1] = trans[f * 3 + 1]; gt[2] = trans[f * 3 + 2];
        } else {
          Quat pq{gr[p * 4 + 0], gr[p * 4 + 1], gr[p * 4 + 2], gr[p * 4 + 3]};
          Quat q = qnormalize(qmul(pq, lq));
          gr[j * 4 + 0] = q.x; gr[j * 4 + 1] = q.y; gr[j * 4 + 2] = q.z; gr[j * 4 + 3] = q.w;
          float off[3];
          qrotate(pq, local_t + j * 3, off);
          gt[j * 3 + 0] = gt[p * 3 + 0] + off[0];
          gt[j * 3 + 1] = gt[p * 3 + 1] + off[1];
          gt[j * 3 + 2] = gt[p * 3 + 2] + off[2];
        }
      }
    }
  });
}

// Motion derivatives for ONE clip of F frames:
//   gvs  (F, J, 3): np.gradient of gts along frames / dt, Gaussian sigma=2
//   gavs (F, J, 3): angle-axis of grs[t+1] * conj(grs[t]) / dt (angle in
//                   [0, pi]), last frame zero, Gaussian sigma=2
//   dvs  (F, J-1, 3): wrapped angle-axis of conj(lrs[t]) * lrs[t+1] * fps,
//                   last frame duplicated (NOT smoothed — reference
//                   motion_lib.py:119-140)
void phc_motion_derivatives(const float* gts, const float* grs, const float* lrs,
                            int F, int J, float fps, float* gvs, float* gavs,
                            float* dvs) {
  const float dt = 1.0f / fps;
  // --- linear velocity: central differences ---
  parallel_for(F, [&](int lo, int hi) {
    for (int f = lo; f < hi; ++f) {
      for (int c = 0; c < J * 3; ++c) {
        float v;
        const size_t idx = static_cast<size_t>(f) * J * 3 + c;
        if (F == 1) v = 0.0f;
        else if (f == 0) v = (gts[idx + J * 3] - gts[idx]) / dt;
        else if (f == F - 1) v = (gts[idx] - gts[idx - J * 3]) / dt;
        else v = (gts[idx + J * 3] - gts[idx - J * 3]) / (2.0f * dt);
        gvs[idx] = v;
      }
    }
  });
  gaussian_filter_frames(gvs, F, J * 3, 2.0f);

  // --- angular velocity: normalized frame-diff quats, [0, pi] angle ---
  parallel_for(F, [&](int lo, int hi) {
    for (int f = lo; f < hi; ++f) {
      for (int j = 0; j < J; ++j) {
        float* out = gavs + (static_cast<size_t>(f) * J + j) * 3;
        if (f == F - 1) { out[0] = out[1] = out[2] = 0.0f; continue; }
        const float* q0 = grs + (static_cast<size_t>(f) * J + j) * 4;
        const float* q1 = grs + (static_cast<size_t>(f + 1) * J + j) * 4;
        Quat a{q1[0], q1[1], q1[2], q1[3]};
        Quat b{-q0[0], -q0[1], -q0[2], q0[3]};
        Quat d = qnormalize(qmul(a, b));
        const float s = 2.0f * d.w * d.w - 1.0f;
        const float angle = std::acos(std::min(1.0f, std::max(-1.0f, s)));
        float n = std::sqrt(d.x * d.x + d.y * d.y + d.z * d.z);
        if (n < 1e-9f) n = 1e-9f;
        out[0] = d.x / n * angle / dt;
        out[1] = d.y / n * angle / dt;
        out[2] = d.z / n * angle / dt;
      }
    }
  });
  gaussian_filter_frames(gavs, F, J * 3, 2.0f);

  // --- dof velocities: local-rotation diffs, wrapped angle, z fallback ---
  parallel_for(std::max(F - 1, 1), [&](int lo, int hi) {
    for (int f = lo; f < hi && f < F - 1; ++f) {
      for (int j = 1; j < J; ++j) {
        const float* q0 = lrs + (static_cast<size_t>(f) * J + j) * 4;
        const float* q1 = lrs + (static_cast<size_t>(f + 1) * J + j) * 4;
        Quat c0{-q0[0], -q0[1], -q0[2], q0[3]};
        Quat d = qmul(c0, Quat{q1[0], q1[1], q1[2], q1[3]});
        float qw = std::min(1.0f, std::max(-1.0f, d.w));
        const float sin_t = std::sqrt(std::max(0.0f, 1.0f - qw * qw));
        float angle = 2.0f * std::acos(qw);
        angle = std::atan2(std::sin(angle), std::cos(angle));  // wrap
        float ax = 0.0f, ay = 0.0f, az = 1.0f;
        if (sin_t > 1e-5f) {
          ax = d.x / sin_t; ay = d.y / sin_t; az = d.z / sin_t;
        } else {
          angle = 0.0f;
        }
        float* out = dvs + (static_cast<size_t>(f) * (J - 1) + (j - 1)) * 3;
        out[0] = ax * angle * fps;
        out[1] = ay * angle * fps;
        out[2] = az * angle * fps;
      }
    }
  });
  if (F > 1) {  // duplicate last frame
    std::memcpy(dvs + static_cast<size_t>(F - 1) * (J - 1) * 3,
                dvs + static_cast<size_t>(F - 2) * (J - 1) * 3,
                static_cast<size_t>(J - 1) * 3 * sizeof(float));
  } else {
    std::memset(dvs, 0, static_cast<size_t>(J - 1) * 3 * sizeof(float));
  }
}

}  // extern "C"

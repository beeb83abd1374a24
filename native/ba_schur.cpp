// Native CPU bundle adjustment: Levenberg-Marquardt with dense Schur
// elimination — a faithful stand-in for the reference's Ceres
// DENSE_SCHUR configuration (BundleAdjuster.cpp:131-142), used as the
// honest CPU baseline that the TPU solver's s/iter is compared against
// (Ceres itself is not installed in this image).
//
// Faithful in the ways that matter for timing comparability:
//  - same residual as BundleAdjuster.h:26-58 (angle-axis rotation,
//    additive shared radial distortion, 2 residuals/observation),
//  - forward-mode autodiff via a minimal Jet<15> (exactly Ceres's
//    AutoDiffCostFunction mechanism; 12 camera + 3 point partials),
//  - Schur complement on the reduced camera system with per-landmark
//    3x3 inversions and dense (12C)^2 Cholesky (DENSE_SCHUR's regime:
//    cameras in the dozens, points in the tens of thousands),
//  - classic additive-lambda LM with accept/reject,
//  - OpenMP over observations/landmarks with 4 threads by default
//    (MAX_NUM_THREADS parity, SequentialReconstructor.h:17).
//
// Parameter layout per camera (12): [aa(3), t(3), fx, fy, cx, cy, k1, k2]
// — identical to reconstructor_tpu/ba/lm.py. Freezing is expressed by a
// (C,12) 0/1 mask like the JAX solver (zeroed Jacobian columns + unit
// diagonal).
//
// Build: native/build.sh (adds -fopenmp); entry points are extern "C"
// and ctypes-bound in reconstructor_tpu/eval/ba_native.py.

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int kCam = 12;

// ---------------------------------------------------------------------
// Minimal forward-mode dual number with N partials (Ceres Jet).
template <int N>
struct Jet {
  double a;
  double v[N];
  Jet() : a(0) { std::memset(v, 0, sizeof(v)); }
  explicit Jet(double x) : a(x) { std::memset(v, 0, sizeof(v)); }
  static Jet Var(double x, int i) {
    Jet j(x);
    j.v[i] = 1.0;
    return j;
  }
};

template <int N>
inline Jet<N> operator+(const Jet<N>& x, const Jet<N>& y) {
  Jet<N> r;
  r.a = x.a + y.a;
  for (int i = 0; i < N; ++i) r.v[i] = x.v[i] + y.v[i];
  return r;
}
template <int N>
inline Jet<N> operator-(const Jet<N>& x, const Jet<N>& y) {
  Jet<N> r;
  r.a = x.a - y.a;
  for (int i = 0; i < N; ++i) r.v[i] = x.v[i] - y.v[i];
  return r;
}
template <int N>
inline Jet<N> operator*(const Jet<N>& x, const Jet<N>& y) {
  Jet<N> r;
  r.a = x.a * y.a;
  for (int i = 0; i < N; ++i) r.v[i] = x.a * y.v[i] + x.v[i] * y.a;
  return r;
}
template <int N>
inline Jet<N> operator/(const Jet<N>& x, const Jet<N>& y) {
  Jet<N> r;
  const double inv = 1.0 / y.a;
  r.a = x.a * inv;
  for (int i = 0; i < N; ++i) r.v[i] = (x.v[i] - r.a * y.v[i]) * inv;
  return r;
}
template <int N>
inline Jet<N> operator*(double s, const Jet<N>& x) {
  Jet<N> r;
  r.a = s * x.a;
  for (int i = 0; i < N; ++i) r.v[i] = s * x.v[i];
  return r;
}
template <int N>
inline Jet<N> operator+(const Jet<N>& x, double s) {
  Jet<N> r = x;
  r.a += s;
  return r;
}
template <int N>
inline Jet<N> operator-(double s, const Jet<N>& x) {
  Jet<N> r;
  r.a = s - x.a;
  for (int i = 0; i < N; ++i) r.v[i] = -x.v[i];
  return r;
}
template <int N>
inline Jet<N> sqrt(const Jet<N>& x) {
  Jet<N> r;
  r.a = std::sqrt(x.a);
  const double d = 0.5 / (r.a + 1e-300);
  for (int i = 0; i < N; ++i) r.v[i] = d * x.v[i];
  return r;
}
template <int N>
inline Jet<N> cos(const Jet<N>& x) {
  Jet<N> r;
  r.a = std::cos(x.a);
  const double d = -std::sin(x.a);
  for (int i = 0; i < N; ++i) r.v[i] = d * x.v[i];
  return r;
}
template <int N>
inline Jet<N> sin(const Jet<N>& x) {
  Jet<N> r;
  r.a = std::sin(x.a);
  const double d = std::cos(x.a);
  for (int i = 0; i < N; ++i) r.v[i] = d * x.v[i];
  return r;
}

using J = Jet<15>;  // 12 camera + 3 point partials

// Reference residual (BundleAdjuster.h:26-58): angle-axis rotate,
// project, additive shared radial distortion.
inline void Residual(const double* cam, const double* pt, const double* uv,
                     J* res) {
  J c[kCam], p[3];
  for (int i = 0; i < kCam; ++i) c[i] = J::Var(cam[i], i);
  for (int i = 0; i < 3; ++i) p[i] = J::Var(pt[i], 12 + i);

  // AngleAxisRotatePoint
  J t2 = c[0] * c[0] + c[1] * c[1] + c[2] * c[2];
  J pr[3];
  if (t2.a > 1e-24) {
    J theta = sqrt(t2);
    J ct = cos(theta), st = sin(theta);
    J w0 = c[0] / theta, w1 = c[1] / theta, w2 = c[2] / theta;
    J wxp0 = w1 * p[2] - w2 * p[1];
    J wxp1 = w2 * p[0] - w0 * p[2];
    J wxp2 = w0 * p[1] - w1 * p[0];
    J wdp = w0 * p[0] + w1 * p[1] + w2 * p[2];
    J omc = 1.0 - ct;  // needs operator-(double, Jet)
    pr[0] = p[0] * ct + wxp0 * st + w0 * (wdp * omc);
    pr[1] = p[1] * ct + wxp1 * st + w1 * (wdp * omc);
    pr[2] = p[2] * ct + wxp2 * st + w2 * (wdp * omc);
  } else {
    pr[0] = p[0] + (c[1] * p[2] - c[2] * p[1]);
    pr[1] = p[1] + (c[2] * p[0] - c[0] * p[2]);
    pr[2] = p[2] + (c[0] * p[1] - c[1] * p[0]);
  }
  pr[0] = pr[0] + c[3];
  pr[1] = pr[1] + c[4];
  pr[2] = pr[2] + c[5];

  J xn = pr[0] / pr[2];
  J yn = pr[1] / pr[2];
  J r2 = xn * xn + yn * yn;
  J d = c[10] * r2 + c[11] * (r2 * r2);
  J u = c[6] * (xn + d) + c[8];
  J v = c[7] * (yn + d) + c[9];
  res[0] = u + (-uv[0]);
  res[1] = v + (-uv[1]);
}

inline double PlainCost(const double* cams, const double* pts,
                        const int32_t* obs_cam, const int32_t* obs_pt,
                        const double* obs_uv, int64_t O) {
  double cost = 0.0;
#pragma omp parallel for reduction(+ : cost) schedule(static)
  for (int64_t o = 0; o < O; ++o) {
    const double* cam = cams + obs_cam[o] * kCam;
    const double* pt = pts + obs_pt[o] * 3;
    // scalar re-evaluation of the residual
    double aa0 = cam[0], aa1 = cam[1], aa2 = cam[2];
    double t2 = aa0 * aa0 + aa1 * aa1 + aa2 * aa2;
    double pr[3];
    if (t2 > 1e-24) {
      double th = std::sqrt(t2), ct = std::cos(th), st = std::sin(th);
      double w0 = aa0 / th, w1 = aa1 / th, w2 = aa2 / th;
      double wxp0 = w1 * pt[2] - w2 * pt[1];
      double wxp1 = w2 * pt[0] - w0 * pt[2];
      double wxp2 = w0 * pt[1] - w1 * pt[0];
      double wdp = w0 * pt[0] + w1 * pt[1] + w2 * pt[2];
      double omc = 1.0 - ct;
      pr[0] = pt[0] * ct + wxp0 * st + w0 * wdp * omc;
      pr[1] = pt[1] * ct + wxp1 * st + w1 * wdp * omc;
      pr[2] = pt[2] * ct + wxp2 * st + w2 * wdp * omc;
    } else {
      pr[0] = pt[0] + (aa1 * pt[2] - aa2 * pt[1]);
      pr[1] = pt[1] + (aa2 * pt[0] - aa0 * pt[2]);
      pr[2] = pt[2] + (aa0 * pt[1] - aa1 * pt[0]);
    }
    pr[0] += cam[3];
    pr[1] += cam[4];
    pr[2] += cam[5];
    double xn = pr[0] / pr[2], yn = pr[1] / pr[2];
    double r2 = xn * xn + yn * yn;
    double d = cam[10] * r2 + cam[11] * r2 * r2;
    double du = cam[6] * (xn + d) + cam[8] - obs_uv[2 * o];
    double dv = cam[7] * (yn + d) + cam[9] - obs_uv[2 * o + 1];
    cost += 0.5 * (du * du + dv * dv);
  }
  return cost;
}

// Dense Cholesky solve (n x n, row-major), in place on A; b -> x.
bool CholeskySolve(std::vector<double>& A, std::vector<double>& b, int n) {
  for (int j = 0; j < n; ++j) {
    double d = A[j * n + j];
    for (int k = 0; k < j; ++k) d -= A[j * n + k] * A[j * n + k];
    if (d <= 0) return false;
    d = std::sqrt(d);
    A[j * n + j] = d;
    for (int i = j + 1; i < n; ++i) {
      double s = A[i * n + j];
      for (int k = 0; k < j; ++k) s -= A[i * n + k] * A[j * n + k];
      A[i * n + j] = s / d;
    }
  }
  for (int i = 0; i < n; ++i) {  // L y = b
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= A[i * n + k] * b[k];
    b[i] = s / A[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {  // L^T x = y
    double s = b[i];
    for (int k = i + 1; k < n; ++k) s -= A[k * n + i] * b[k];
    b[i] = s / A[i * n + i];
  }
  return true;
}

}  // namespace

extern "C" {

// Runs LM; returns iterations taken. cams (C,12) and pts (L,3) are
// updated in place. Observations must be sorted by point id (landmark-
// major), with point_offsets (L+1) delimiting each landmark's run.
int ba_schur_solve(double* cams, double* pts, int C, int64_t L,
                   const int32_t* obs_cam, const int32_t* obs_pt,
                   const double* obs_uv, int64_t O,
                   const int64_t* point_offsets, const double* cam_free,
                   int max_iters, double lambda_init, double lambda_up,
                   double lambda_down, double ftol, int num_threads,
                   double* final_cost,
                   // optional (nullable) per-iteration traces, each
                   // max_iters long: accepted cost + elapsed seconds —
                   // feeds the time-to-equal-cost benchmark metric.
                   double* trace_cost, double* trace_time) {
#ifdef _OPENMP
  omp_set_num_threads(num_threads);
#endif
  const auto t_start = std::chrono::steady_clock::now();
  const int n = C * kCam;
  std::vector<double> Hcc(n * n), g_c(n);
  std::vector<double> Hpp(L * 9), g_p(L * 3);
  // per-landmark camera coupling: W blocks stored per observation (12x3)
  std::vector<double> Wblk(O * 36);
  std::vector<double> Jc(O * 2 * kCam), Jp(O * 6), res(O * 2);

  double lambda = lambda_init;
  double cost = PlainCost(cams, pts, obs_cam, obs_pt, obs_uv, O);
  int it = 0;
  for (; it < max_iters; ++it) {
    // ---- linearize ---------------------------------------------------
#pragma omp parallel for schedule(static)
    for (int64_t o = 0; o < O; ++o) {
      J r[2];
      Residual(cams + obs_cam[o] * kCam, pts + obs_pt[o] * 3,
               obs_uv + 2 * o, r);
      const double* free = cam_free + obs_cam[o] * kCam;
      for (int k = 0; k < 2; ++k) {
        res[2 * o + k] = r[k].a;
        for (int i = 0; i < kCam; ++i)
          Jc[(2 * o + k) * kCam + i] = r[k].v[i] * free[i];
        for (int i = 0; i < 3; ++i) Jp[(2 * o + k) * 3 + i] = r[k].v[12 + i];
      }
    }

    // ---- accumulate Hcc, g_c (camera-major) --------------------------
    std::fill(Hcc.begin(), Hcc.end(), 0.0);
    std::fill(g_c.begin(), g_c.end(), 0.0);
    for (int64_t o = 0; o < O; ++o) {  // serial: C is tiny, races costly
      const int c0 = obs_cam[o] * kCam;
      const double* jc = Jc.data() + 2 * o * kCam;
      for (int k = 0; k < 2; ++k) {
        const double* row = jc + k * kCam;
        const double rk = res[2 * o + k];
        for (int i = 0; i < kCam; ++i) {
          g_c[c0 + i] += row[i] * rk;
          double* h = Hcc.data() + (c0 + i) * n + c0;
          for (int j2 = 0; j2 < kCam; ++j2) h[j2] += row[i] * row[j2];
        }
      }
    }

    // ---- per-landmark Hpp, g_p, W ------------------------------------
#pragma omp parallel for schedule(static)
    for (int64_t p = 0; p < L; ++p) {
      double* hp = Hpp.data() + p * 9;
      double* gp = g_p.data() + p * 3;
      std::fill(hp, hp + 9, 0.0);
      std::fill(gp, gp + 3, 0.0);
      for (int64_t o = point_offsets[p]; o < point_offsets[p + 1]; ++o) {
        const double* jp = Jp.data() + 2 * o * 3;
        const double* jc = Jc.data() + 2 * o * kCam;
        double* w = Wblk.data() + o * 36;
        std::fill(w, w + 36, 0.0);
        for (int k = 0; k < 2; ++k) {
          const double* rowp = jp + k * 3;
          const double* rowc = jc + k * kCam;
          const double rk = res[2 * o + k];
          for (int i = 0; i < 3; ++i) {
            gp[i] += rowp[i] * rk;
            for (int j2 = 0; j2 < 3; ++j2) hp[i * 3 + j2] += rowp[i] * rowp[j2];
          }
          for (int i = 0; i < kCam; ++i)
            for (int j2 = 0; j2 < 3; ++j2) w[i * 3 + j2] += rowc[i] * rowp[j2];
        }
      }
    }

    // ---- damped Schur + retries --------------------------------------
    bool accepted = false;
    double new_cost = cost;
    std::vector<double> cams_new(C * kCam), pts_new(L * 3);
    for (int retry = 0; retry < 5 && !accepted; ++retry) {
      // S = Hcc + lam I (+ unit diag on frozen) - sum_p W Hpp^-1 W^T
      std::vector<double> S(Hcc);
      std::vector<double> rhs(n);
      for (int i = 0; i < n; ++i) rhs[i] = -g_c[i];
      for (int c = 0; c < C; ++c)
        for (int i = 0; i < kCam; ++i) {
          const int d = c * kCam + i;
          S[d * n + d] += lambda + (cam_free[c * kCam + i] == 0.0 ? 1.0 : 0.0);
        }

      std::vector<double> Hpinv(L * 9);
#pragma omp parallel for schedule(static)
      for (int64_t p = 0; p < L; ++p) {
        double m[9];
        for (int i = 0; i < 9; ++i) m[i] = Hpp[p * 9 + i];
        m[0] += lambda + 1e-8;
        m[4] += lambda + 1e-8;
        m[8] += lambda + 1e-8;
        const double det = m[0] * (m[4] * m[8] - m[5] * m[7]) -
                           m[1] * (m[3] * m[8] - m[5] * m[6]) +
                           m[2] * (m[3] * m[7] - m[4] * m[6]);
        const double inv = 1.0 / det;
        double* q = Hpinv.data() + p * 9;
        q[0] = (m[4] * m[8] - m[5] * m[7]) * inv;
        q[1] = (m[2] * m[7] - m[1] * m[8]) * inv;
        q[2] = (m[1] * m[5] - m[2] * m[4]) * inv;
        q[3] = (m[5] * m[6] - m[3] * m[8]) * inv;
        q[4] = (m[0] * m[8] - m[2] * m[6]) * inv;
        q[5] = (m[2] * m[3] - m[0] * m[5]) * inv;
        q[6] = (m[3] * m[7] - m[4] * m[6]) * inv;
        q[7] = (m[1] * m[6] - m[0] * m[7]) * inv;
        q[8] = (m[0] * m[4] - m[1] * m[3]) * inv;
      }

      // Schur reduction, parallel over landmarks with thread-local
      // reduced systems (S is (12C)^2 = 720 KB at C=25 — cheap to
      // privatize; Sum |O_p|^2 * 432 FLOPs is the dominant cost and
      // must scale with threads like Ceres's reduction does).
#pragma omp parallel
      {
        std::vector<double> S_loc(n * n, 0.0), rhs_loc(n, 0.0), Bp(36);
#pragma omp for schedule(dynamic, 256) nowait
        for (int64_t p = 0; p < L; ++p) {
          const double* hpinv = Hpinv.data() + p * 9;
          const double* gp = g_p.data() + p * 3;
          double hg[3] = {
              hpinv[0] * gp[0] + hpinv[1] * gp[1] + hpinv[2] * gp[2],
              hpinv[3] * gp[0] + hpinv[4] * gp[1] + hpinv[5] * gp[2],
              hpinv[6] * gp[0] + hpinv[7] * gp[1] + hpinv[8] * gp[2]};
          for (int64_t o = point_offsets[p]; o < point_offsets[p + 1]; ++o) {
            const double* wo = Wblk.data() + o * 36;
            const int ci = obs_cam[o] * kCam;
            // rhs += W_o Hpp^-1 g_p
            for (int i = 0; i < kCam; ++i)
              rhs_loc[ci + i] += wo[i * 3] * hg[0] + wo[i * 3 + 1] * hg[1] +
                                 wo[i * 3 + 2] * hg[2];
            // Bp = W_o Hpp^-1
            for (int i = 0; i < kCam; ++i)
              for (int j2 = 0; j2 < 3; ++j2)
                Bp[i * 3 + j2] = wo[i * 3] * hpinv[j2] +
                                 wo[i * 3 + 1] * hpinv[3 + j2] +
                                 wo[i * 3 + 2] * hpinv[6 + j2];
            for (int64_t o2 = point_offsets[p]; o2 < point_offsets[p + 1];
                 ++o2) {
              const double* wo2 = Wblk.data() + o2 * 36;
              const int cj = obs_cam[o2] * kCam;
              for (int i = 0; i < kCam; ++i) {
                double* srow = S_loc.data() + (ci + i) * n + cj;
                const double b0 = Bp[i * 3], b1 = Bp[i * 3 + 1],
                             b2 = Bp[i * 3 + 2];
                for (int j2 = 0; j2 < kCam; ++j2)
                  srow[j2] -= b0 * wo2[j2 * 3] + b1 * wo2[j2 * 3 + 1] +
                              b2 * wo2[j2 * 3 + 2];
              }
            }
          }
        }
#pragma omp critical
        {
          for (int i = 0; i < n * n; ++i) S[i] += S_loc[i];
          for (int i = 0; i < n; ++i) rhs[i] += rhs_loc[i];
        }
      }

      std::vector<double> dc(rhs);
      if (!CholeskySolve(S, dc, n)) {
        lambda *= lambda_up;
        continue;
      }

      // point back-substitution: dp = -Hpp^-1 (g_p + W^T dc)
      std::copy(cams, cams + C * kCam, cams_new.begin());
      for (int i = 0; i < n; ++i)
        cams_new[i] += dc[i] * cam_free[i];
#pragma omp parallel for schedule(static)
      for (int64_t p = 0; p < L; ++p) {
        double acc[3] = {g_p[p * 3], g_p[p * 3 + 1], g_p[p * 3 + 2]};
        for (int64_t o = point_offsets[p]; o < point_offsets[p + 1]; ++o) {
          const double* wo = Wblk.data() + o * 36;
          const double* d = dc.data() + obs_cam[o] * kCam;
          for (int j2 = 0; j2 < 3; ++j2) {
            double s = 0;
            for (int i = 0; i < kCam; ++i) s += wo[i * 3 + j2] * d[i];
            acc[j2] += s;
          }
        }
        const double* hpinv = Hpinv.data() + p * 9;
        for (int i = 0; i < 3; ++i)
          pts_new[p * 3 + i] =
              pts[p * 3 + i] - (hpinv[i * 3] * acc[0] +
                                hpinv[i * 3 + 1] * acc[1] +
                                hpinv[i * 3 + 2] * acc[2]);
      }

      new_cost = PlainCost(cams_new.data(), pts_new.data(), obs_cam, obs_pt,
                           obs_uv, O);
      if (std::isfinite(new_cost) && new_cost < cost) {
        accepted = true;
        std::copy(cams_new.begin(), cams_new.end(), cams);
        std::copy(pts_new.begin(), pts_new.end(), pts);
        lambda /= lambda_down;
      } else {
        lambda *= lambda_up;
      }
    }
    double drop = 1.0;
    if (accepted) {
      drop = (cost - new_cost) / (cost > 1e-12 ? cost : 1e-12);
      cost = new_cost;
    }
    if (trace_cost) trace_cost[it] = cost;
    if (trace_time)
      trace_time[it] = std::chrono::duration<double>(
                           std::chrono::steady_clock::now() - t_start)
                           .count();
    if (accepted && drop < ftol) {
      ++it;
      break;
    }
    if (!accepted && lambda > 1e10) break;
  }
  if (trace_cost || trace_time) {
    const double t_now = std::chrono::duration<double>(
                             std::chrono::steady_clock::now() - t_start)
                             .count();
    for (int k = it; k < max_iters; ++k) {
      if (trace_cost) trace_cost[k] = cost;
      if (trace_time) trace_time[k] = t_now;
    }
  }
  *final_cost = cost;
  return it;
}

}  // extern "C"

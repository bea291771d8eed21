// Native (C++) reference engine: cell-list neighbor search + the Mofidi
// contact pipeline + DEM LVC force, single-threaded double precision.
//
// Role in this framework (mirroring the reference's native tier, where
// PySPH generates C loops from Equation objects): an independent
// implementation of the same physics used as
//   1. a cross-validation oracle for the JAX/XLA ops (tests compare the
//      device pipeline against this engine bit-for-tolerance), and
//   2. a host-side fallback evaluator for tiny scenes.
//
// Physics parity targets (reference files under /root/reference/code):
//   rigid_body_common.py:631-723  contact normals (Eq. 22)
//   rigid_body_common.py:726-836  distance + closest point (Eq. 21)
//   rigid_body_common.py:839-1032 contact force (Eq. 24)
// Exported with a plain C ABI for ctypes.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <unordered_map>

namespace {

struct CellKey {
  int64_t v;
  bool operator==(const CellKey& o) const { return v == o.v; }
};
struct CellHash {
  size_t operator()(const CellKey& k) const {
    return std::hash<int64_t>()(k.v);
  }
};

inline int64_t cell_id(double x, double y, double z, double inv) {
  int64_t ix = (int64_t)std::floor(x * inv);
  int64_t iy = (int64_t)std::floor(y * inv);
  int64_t iz = (int64_t)std::floor(z * inv);
  // pack 21 bits per axis
  return ((ix & 0x1FFFFF) << 42) | ((iy & 0x1FFFFF) << 21) | (iz & 0x1FFFFF);
}

// quintic spline kernel, 2D/3D (PySPH QuinticSpline)
inline double quintic_sigma(double h, int dim) {
  if (dim == 2) return 7.0 / (478.0 * M_PI * h * h);
  return 1.0 / (120.0 * M_PI * h * h * h);
}
inline double quintic_w(double r, double h, int dim) {
  double q = r / h;
  if (q >= 3.0) return 0.0;
  double t3 = 3.0 - q;
  double v = t3 * t3 * t3 * t3 * t3;
  if (q < 2.0) {
    double t2 = 2.0 - q;
    v -= 6.0 * t2 * t2 * t2 * t2 * t2;
  }
  if (q < 1.0) {
    double t1 = 1.0 - q;
    v += 15.0 * t1 * t1 * t1 * t1 * t1;
  }
  return quintic_sigma(h, dim) * v;
}

struct Grid {
  std::unordered_map<CellKey, std::vector<int>, CellHash> cells;
  double inv;
  void build(const double* x, const double* y, const double* z, int n,
             double cutoff) {
    inv = 1.0 / cutoff;
    cells.clear();
    for (int i = 0; i < n; ++i)
      cells[{cell_id(x[i], y[i], z[i], inv)}].push_back(i);
  }
  template <class F>
  void for_neighbors(const double* x, const double* y, const double* z,
                     int i, double cutoff, F&& f) const {
    double c2 = cutoff * cutoff;
    int64_t ix = (int64_t)std::floor(x[i] * inv);
    int64_t iy = (int64_t)std::floor(y[i] * inv);
    int64_t iz = (int64_t)std::floor(z[i] * inv);
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          int64_t key = (((ix + dx) & 0x1FFFFF) << 42) |
                        (((iy + dy) & 0x1FFFFF) << 21) |
                        ((iz + dz) & 0x1FFFFF);
          auto it = cells.find({key});
          if (it == cells.end()) continue;
          for (int j : it->second) {
            double ddx = x[i] - x[j], ddy = y[i] - y[j], ddz = z[i] - z[j];
            double r2 = ddx * ddx + ddy * ddy + ddz * ddz;
            if (r2 <= c2) f(j, std::sqrt(r2), ddx, ddy, ddz);
          }
        }
  }
};

}  // namespace

extern "C" {

// Count neighbors within cutoff (self included) — grid correctness oracle.
void rb_neighbor_counts(const double* x, const double* y, const double* z,
                        int n, double cutoff, int32_t* counts) {
  Grid g;
  g.build(x, y, z, n, cutoff);
  for (int i = 0; i < n; ++i) {
    int c = 0;
    g.for_neighbors(x, y, z, i, cutoff,
                    [&](int, double, double, double, double) { ++c; });
    counts[i] = c;
  }
}

// Mofidi contact pipeline (one evaluation, no time stepping):
// computes per-(particle, slot) normals, distances, closest-point data
// and the resulting per-particle contact force, given the current state.
// Inputs follow the framework's Scene layout; slot arrays are [n, S].
void rb_contact_eval(
    const double* x, const double* y, const double* z,
    const double* u, const double* v, const double* w,
    const double* m, const double* rho, const double* h,
    const int32_t* dem_id, const int32_t* body_id,
    const uint8_t* is_rigid, const double* cf_is_boundary,
    int n, int S, int dim, double spacing0,
    const double* eta,  // [B, S]
    double kr, double kf, double fric_coeff, double dt,
    // persistent state in/out: [n, S]
    double* delta_lt_x, double* delta_lt_y, double* delta_lt_z,
    double* fn_x, double* fn_y, double* fn_z,
    // outputs
    double* cfn_x, double* cfn_y, double* cfn_z,  // [n, S]
    double* dist,                                 // [n, S]
    double* fx, double* fy, double* fz)           // [n]
{
  double cutoff = 0.0;
  for (int i = 0; i < n; ++i) cutoff = std::max(cutoff, 3.0 * h[i]);
  Grid g;
  g.build(x, y, z, n, cutoff);

  std::vector<double> wsum(n * S), tx(n * S), ty(n * S), tz(n * S);
  std::vector<double> closest(n * S), sx(n * S), sy(n * S), sz(n * S),
      svx(n * S), svy(n * S), svz(n * S);

  // ---- stage 1: normals (Eq. 22) ----
  for (int i = 0; i < n; ++i) {
    if (!is_rigid[i]) continue;
    g.for_neighbors(x, y, z, i, cutoff,
                    [&](int j, double r, double ddx, double ddy, double ddz) {
      if (cf_is_boundary[j] != 1.0 || dem_id[j] == dem_id[i] || r <= 0.0)
        return;
      double hij = 0.5 * (h[i] + h[j]);
      double wij = quintic_w(r, hij, dim);
      double tmp = m[i] / (rho[i] * r) * wij;
      int s = dem_id[j];
      tx[i * S + s] += ddx * tmp;
      ty[i * S + s] += ddy * tmp;
      tz[i * S + s] += ddz * tmp;
      wsum[i * S + s] += tmp * r;
    });
    for (int s = 0; s < S; ++s) {
      int k = i * S + s;
      if (wsum[k] > 1e-12) {
        double nx = tx[k] / wsum[k], ny = ty[k] / wsum[k],
               nz = tz[k] / wsum[k];
        double mag = std::sqrt(nx * nx + ny * ny + nz * nz);
        cfn_x[k] = nx / mag;
        cfn_y[k] = ny / mag;
        cfn_z[k] = nz / mag;
      } else {
        cfn_x[k] = cfn_y[k] = cfn_z[k] = 0.0;
      }
    }
  }

  // ---- stage 2: distance + closest point (Eq. 21) ----
  std::fill(wsum.begin(), wsum.end(), 0.0);
  std::memset(dist, 0, sizeof(double) * (size_t)n * S);
  for (int i = 0; i < n * S; ++i) closest[i] = 4.0 * spacing0;
  std::vector<int> arg(n * S, -1);
  for (int i = 0; i < n; ++i) {
    if (!is_rigid[i]) continue;
    g.for_neighbors(x, y, z, i, cutoff,
                    [&](int j, double r, double ddx, double ddy, double ddz) {
      if (cf_is_boundary[j] != 1.0 || dem_id[j] == dem_id[i]) return;
      double hij = 0.5 * (h[i] + h[j]);
      double wij = quintic_w(r, hij, dim);
      int k = i * S + dem_id[j];
      double tmp = m[i] / rho[i] * wij;
      double proj = cfn_x[k] * ddx + cfn_y[k] * ddy + cfn_z[k] * ddz;
      dist[k] += proj * tmp;  // accumulate numerator in-place
      wsum[k] += tmp;
      if (r < closest[k] ||
          (r == closest[k] && (arg[k] < 0 || j < arg[k]))) {
        closest[k] = r;
        arg[k] = j;
      }
    });
  }
  for (int k = 0; k < n * S; ++k) {
    dist[k] = (wsum[k] > 1e-12) ? dist[k] / wsum[k] : 0.0;
    if (arg[k] >= 0) {
      sx[k] = x[arg[k]]; sy[k] = y[arg[k]]; sz[k] = z[arg[k]];
      svx[k] = u[arg[k]]; svy[k] = v[arg[k]]; svz[k] = w[arg[k]];
    }
  }

  // ---- stage 3: force (Eq. 24) ----
  for (int i = 0; i < n; ++i) { fx[i] = fy[i] = fz[i] = 0.0; }
  for (int i = 0; i < n; ++i) {
    if (!is_rigid[i]) continue;
    for (int s = 0; s < S; ++s) {
      int k = i * S + s;
      double overlap = spacing0 - dist[k];
      double ftx = 0.0, fty = 0.0, ftz = 0.0;
      if (overlap > 0.0 && dist[k] != 0.0) {
        double vij_x = u[i] - svx[k], vij_y = v[i] - svy[k],
               vij_z = w[i] - svz[k];
        double nx = cfn_x[k], ny = cfn_y[k], nz = cfn_z[k];
        double vdotn = vij_x * nx + vij_y * ny + vij_z * nz;
        double e = eta[body_id[i] * S + s] * std::sqrt(m[i] / 2.0 * kr);
        double fnm = kr * overlap - e * vdotn;
        double fnx = fnm * nx, fny = fnm * ny, fnz = fnm * nz;
        double vmag = std::sqrt(vij_x * vij_x + vij_y * vij_y +
                                vij_z * vij_z);
        if (vmag < 1e-12) {
          delta_lt_x[k] = delta_lt_y[k] = delta_lt_z[k] = 0.0;
          // fn stays stale (reference :931-1012)
        } else {
          double txp = vij_x - nx * vdotn, typ = vij_y - ny * vdotn,
                 tzp = vij_z - nz * vdotn;
          double tmag = std::sqrt(txp * txp + typ * typ + tzp * tzp);
          double tix = 0, tiy = 0, tiz = 0;
          if (tmag > 1e-12) { tix = txp / tmag; tiy = typ / tmag;
                              tiz = tzp / tmag; }
          double dlx = delta_lt_x[k] + vij_x * dt;
          double dly = delta_lt_y[k] + vij_y * dt;
          double dlz = delta_lt_z[k] + vij_z * dt;
          double ddot = dlx * tix + dly * tiy + dlz * tiz;
          double ftm = kf * std::fabs(ddot);
          double fnmag = std::sqrt(fnx * fnx + fny * fny + fnz * fnz);
          double ftstar = std::min(fric_coeff * fnmag, ftm);
          ftx = -ftstar * tix; fty = -ftstar * tiy; ftz = -ftstar * tiz;
          if (ftstar > 0.0) {
            delta_lt_x[k] = tix; delta_lt_y[k] = tiy; delta_lt_z[k] = tiz;
          } else {
            delta_lt_x[k] = delta_lt_y[k] = delta_lt_z[k] = 0.0;
          }
          fn_x[k] = fnx; fn_y[k] = fny; fn_z[k] = fnz;
        }
      } else {
        delta_lt_x[k] = delta_lt_y[k] = delta_lt_z[k] = 0.0;
        fn_x[k] = fn_y[k] = fn_z[k] = 0.0;
      }
      fx[i] += fn_x[k] + ftx;
      fy[i] += fn_y[k] + fty;
      fz[i] += fn_z[k] + ftz;
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Full GTVF rigid-body trajectory stepper (multi-step oracle).
//
// Independent C++ implementation of the complete scheme the JAX engines
// run (reference stage trace: rigid_body_3d.py:40-225 via
// pysph.sph.wc.gtvf.GTVFIntegrator; 2D scalar-izz variant
// rigid_body_2d.py:40-205), including the per-step contact-state
// handoff (delta_lt/fn persistence) where drift bugs hide.  Used by
// tests/test_native_oracle.py to cross-validate 100+-step f64
// trajectories against the device step.
// ---------------------------------------------------------------------------

namespace {

inline void gram_schmidt_columns(double* R) {
  // columns of row-major R[9]; same order as the reference
  // normalize_R_orientation (rigid_body_common.py:178-203)
  double c[3][3];
  for (int j = 0; j < 3; ++j)
    for (int i = 0; i < 3; ++i) c[j][i] = R[i * 3 + j];
  auto norm = [](double* a) {
    double s = std::sqrt(a[0] * a[0] + a[1] * a[1] + a[2] * a[2]);
    a[0] /= s; a[1] /= s; a[2] /= s;
  };
  auto dot = [](const double* a, const double* b) {
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
  };
  norm(c[0]);
  double d01 = dot(c[0], c[1]);
  for (int i = 0; i < 3; ++i) c[1][i] -= d01 * c[0][i];
  norm(c[1]);
  double d02 = dot(c[0], c[2]), d12 = dot(c[1], c[2]);
  for (int i = 0; i < 3; ++i) c[2][i] -= d02 * c[0][i] + d12 * c[1][i];
  norm(c[2]);
  for (int j = 0; j < 3; ++j)
    for (int i = 0; i < 3; ++i) R[i * 3 + j] = c[j][i];
}

struct BodyArgs {
  int B, two_d;
  double* total_mass; double* xcm; double* vcm; double* R;
  double* ang_mom; double* omega; const double* izz;
  const double* I_inv_body; double* I_inv_glob;
  double* force; double* torque;
};

inline void body_half_kick(const BodyArgs& b, double dt) {
  for (int k = 0; k < b.B; ++k) {
    double M = b.total_mass[k];
    if (b.two_d) {
      b.vcm[k * 3 + 0] += 0.5 * dt * b.force[k * 3 + 0] / M;
      b.vcm[k * 3 + 1] += 0.5 * dt * b.force[k * 3 + 1] / M;
      double izz = b.izz[k] > 0 ? b.izz[k] : 1.0;
      b.omega[k * 3 + 2] += 0.5 * dt * b.torque[k * 3 + 2] / izz;
    } else {
      for (int a = 0; a < 3; ++a) {
        b.vcm[k * 3 + a] += 0.5 * dt * b.force[k * 3 + a] / M;
        b.ang_mom[k * 3 + a] += 0.5 * dt * b.torque[k * 3 + a];
      }
      for (int a = 0; a < 3; ++a) {
        double s = 0;
        for (int c = 0; c < 3; ++c)
          s += b.I_inv_glob[k * 9 + a * 3 + c] * b.ang_mom[k * 3 + c];
        b.omega[k * 3 + a] = s;
      }
    }
  }
}

inline void particles_from_body_velocity(
    const BodyArgs& b, const uint8_t* is_rigid, const int32_t* body_id,
    const double* dx0, const double* dy0, const double* dz0, int n,
    double* u, double* v, double* w) {
  for (int i = 0; i < n; ++i) {
    if (!is_rigid[i]) continue;
    int k = body_id[i];
    const double* R = b.R + k * 9;
    double dx = R[0] * dx0[i] + R[1] * dy0[i] + R[2] * dz0[i];
    double dy = R[3] * dx0[i] + R[4] * dy0[i] + R[5] * dz0[i];
    double dz = R[6] * dx0[i] + R[7] * dy0[i] + R[8] * dz0[i];
    const double* om = b.omega + k * 3;
    u[i] = b.vcm[k * 3 + 0] + om[1] * dz - om[2] * dy;
    v[i] = b.vcm[k * 3 + 1] + om[2] * dx - om[0] * dz;
    w[i] = b.vcm[k * 3 + 2] + om[0] * dy - om[1] * dx;
  }
}

}  // namespace

extern "C" void rb_gtvf_step_n(
    double* x, double* y, double* z, double* u, double* v, double* w,
    const double* m, const double* rho, const double* h,
    const int32_t* dem_id, const int32_t* body_id, const uint8_t* is_rigid,
    const double* cf_is_boundary,
    const double* dx0, const double* dy0, const double* dz0,
    int n, int S, int dim, int two_d, double spacing0, int B,
    double* total_mass, double* xcm, double* vcm, double* R,
    double* ang_mom, double* omega, const double* izz,
    const double* I_inv_body, double* I_inv_glob,
    double* force, double* torque,
    const double* eta,
    double kr, double kf, double fric_coeff,
    double gx, double gy, double gz,
    double dt, int n_steps,
    double* delta_lt_x, double* delta_lt_y, double* delta_lt_z,
    double* fn_x, double* fn_y, double* fn_z,
    double* cfn_x, double* cfn_y, double* cfn_z, double* dist,
    double* fx, double* fy, double* fz) {
  BodyArgs b{B, two_d, total_mass, xcm, vcm, R, ang_mom, omega, izz,
             I_inv_body, I_inv_glob, force, torque};
  for (int step = 0; step < n_steps; ++step) {
    // stage 1: half-kick with the stored (previous-eval) force
    body_half_kick(b, dt);
    particles_from_body_velocity(b, is_rigid, body_id, dx0, dy0, dz0, n,
                                 u, v, w);

    // stage-2 equations: contact pipeline + gravity + per-body sums
    rb_contact_eval(x, y, z, u, v, w, m, rho, h, dem_id, body_id,
                    is_rigid, cf_is_boundary, n, S, dim, spacing0, eta,
                    kr, kf, fric_coeff, dt,
                    delta_lt_x, delta_lt_y, delta_lt_z,
                    fn_x, fn_y, fn_z, cfn_x, cfn_y, cfn_z, dist,
                    fx, fy, fz);
    for (int i = 0; i < n; ++i) {
      if (!is_rigid[i]) { fx[i] = fy[i] = fz[i] = 0.0; continue; }
      fx[i] += m[i] * gx;
      fy[i] += m[i] * gy;
      fz[i] += m[i] * gz;
    }
    std::memset(force, 0, sizeof(double) * (size_t)B * 3);
    std::memset(torque, 0, sizeof(double) * (size_t)B * 3);
    for (int i = 0; i < n; ++i) {
      if (!is_rigid[i]) continue;
      int k = body_id[i];
      force[k * 3 + 0] += fx[i];
      force[k * 3 + 1] += fy[i];
      force[k * 3 + 2] += fz[i];
      double rx = x[i] - xcm[k * 3 + 0];
      double ry = y[i] - xcm[k * 3 + 1];
      double rz = z[i] - xcm[k * 3 + 2];
      torque[k * 3 + 0] += ry * fz[i] - rz * fy[i];
      torque[k * 3 + 1] += rz * fx[i] - rx * fz[i];
      torque[k * 3 + 2] += rx * fy[i] - ry * fx[i];
    }

    // stage 2 drift: COM + orientation + (3D) global inertia
    for (int k = 0; k < B; ++k) {
      xcm[k * 3 + 0] += dt * vcm[k * 3 + 0];
      xcm[k * 3 + 1] += dt * vcm[k * 3 + 1];
      if (!two_d) xcm[k * 3 + 2] += dt * vcm[k * 3 + 2];
      const double* om = omega + k * 3;
      double Om[9] = {0, -om[2], om[1], om[2], 0, -om[0], -om[1], om[0], 0};
      double* Rk = R + k * 9;
      double dR[9];
      for (int a = 0; a < 3; ++a)
        for (int c = 0; c < 3; ++c) {
          double s = 0;
          for (int e = 0; e < 3; ++e) s += Om[a * 3 + e] * Rk[e * 3 + c];
          dR[a * 3 + c] = s;
        }
      for (int e = 0; e < 9; ++e) Rk[e] += dt * dR[e];
      gram_schmidt_columns(Rk);
      if (!two_d) {
        // I_inv_glob = R I_inv_body R^T
        const double* Ib = I_inv_body + k * 9;
        double tmp[9];
        for (int a = 0; a < 3; ++a)
          for (int c = 0; c < 3; ++c) {
            double s = 0;
            for (int e = 0; e < 3; ++e) s += Rk[a * 3 + e] * Ib[e * 3 + c];
            tmp[a * 3 + c] = s;
          }
        for (int a = 0; a < 3; ++a)
          for (int c = 0; c < 3; ++c) {
            double s = 0;
            for (int e = 0; e < 3; ++e) s += tmp[a * 3 + e] * Rk[c * 3 + e];
            I_inv_glob[k * 9 + a * 3 + c] = s;
          }
      }
    }
    // particle positions from body frame
    for (int i = 0; i < n; ++i) {
      if (!is_rigid[i]) continue;
      int k = body_id[i];
      const double* Rk = R + k * 9;
      x[i] = xcm[k * 3 + 0] + Rk[0] * dx0[i] + Rk[1] * dy0[i]
             + Rk[2] * dz0[i];
      y[i] = xcm[k * 3 + 1] + Rk[3] * dx0[i] + Rk[4] * dy0[i]
             + Rk[5] * dz0[i];
      z[i] = xcm[k * 3 + 2] + Rk[6] * dx0[i] + Rk[7] * dy0[i]
             + Rk[8] * dz0[i];
    }

    // stage 3: second half-kick with the fresh force
    body_half_kick(b, dt);
    particles_from_body_velocity(b, is_rigid, body_id, dx0, dy0, dz0, n,
                                 u, v, w);
  }
}

// ---------------------------------------------------------------------------
// DEM oracle: Luding linear-viscoelastic contact with tangential-
// displacement springs + velocity-Verlet stepping, n_steps at a time.
// Independent implementation of the reference physics
// (code/dem.py:35-205 LVCDisplacement, :208-293 prune, :595-625 DEMStep)
// in f64 — the cross-validation oracle for the JAX/XLA/Pallas DEM
// engines (tests/test_native_oracle.py).  Same documented deviations as
// ops/dem.py: torque accumulators are reset each force evaluation, and
// a pair's contact-point velocity uses a_i = rad - overlap/2 arms.
//
// The contact table is [n, L] slots of (source index, source dem id,
// spring xyz); slot ORDER is allocation-order dependent and never
// enters the physics (tests compare tables as (idx, dem) -> spring
// maps).
extern "C" void rb_dem_lvc_step_n(
    double* x, double* y, double* z, double* u, double* v, double* w,
    double* wx, double* wy, double* wz,
    const double* m, const double* moi, const double* rad_s,
    const int32_t* dem_id, const uint8_t* mobile,
    const double* dem_kn, const double* dem_kt, const double* dem_alpha,
    const double* dem_mu,
    int n, double gx, double gy, double gz, double dt, int n_steps,
    int L,
    int32_t* tng_idx, int32_t* tng_dem,
    double* tng_x, double* tng_y, double* tng_z,
    double* fx, double* fy, double* fz,
    double* torx, double* tory, double* torz) {
  double rmax = 0.0;
  for (int i = 0; i < n; ++i) rmax = std::max(rmax, rad_s[i]);
  const double cutoff = 2.0 * rmax;
  Grid g;
  std::vector<double> nfx(n), nfy(n), nfz(n), ntx(n), nty(n), ntz(n);

  for (int step = 0; step < n_steps; ++step) {
    // stage 1: half-kick with the stored force (dem.py:596-607)
    for (int i = 0; i < n; ++i) {
      if (!mobile[i]) continue;
      double mi = 0.5 * dt / m[i], Ii = 0.5 * dt / moi[i];
      u[i] += fx[i] * mi;
      v[i] += fy[i] * mi;
      w[i] += fz[i] * mi;
      wx[i] += torx[i] * Ii;
      wy[i] += tory[i] * Ii;
      wz[i] += torz[i] * Ii;
    }

    // prune: free slots whose pair separated or changed entity
    // (initialize_pair, dem.py:209-293)
    for (int i = 0; i < n; ++i) {
      for (int l = 0; l < L; ++l) {
        int32_t j = tng_idx[i * L + l];
        if (j < 0) continue;
        double ddx = x[i] - x[j], ddy = y[i] - y[j], ddz = z[i] - z[j];
        double r = std::sqrt(ddx * ddx + ddy * ddy + ddz * ddz);
        double overlap = rad_s[i] + rad_s[j] - r;
        if (!(overlap > 0.0) || tng_dem[i * L + l] != dem_id[j]) {
          tng_idx[i * L + l] = -1;
          tng_dem[i * L + l] = -1;
          tng_x[i * L + l] = tng_y[i * L + l] = tng_z[i * L + l] = 0.0;
        }
      }
    }

    // LVC force pass (dem.py:44-205)
    g.build(x, y, z, n, cutoff);
    for (int i = 0; i < n; ++i) {
      nfx[i] = nfy[i] = nfz[i] = ntx[i] = nty[i] = ntz[i] = 0.0;
      g.for_neighbors(
          x, y, z, i, cutoff,
          [&](int j, double r, double ddx, double ddy, double ddz) {
            if (j == i || r <= 0.0) return;
            double overlap = rad_s[i] + rad_s[j] - r;
            if (!(overlap > 0.0)) return;
            int e = dem_id[j];
            double kn = dem_kn[e], kt = dem_kt[e];
            double alpha = dem_alpha[e], mu = dem_mu[e];

            double rinv = 1.0 / r;
            double nx = ddx * rinv, ny = ddy * rinv, nz = ddz * rinv;
            double a_i = rad_s[i] - overlap / 2.0;
            double a_j = rad_s[j] - overlap / 2.0;
            double vix = u[i] + (wy[i] * nz - wz[i] * ny) * a_i;
            double viy = v[i] + (wz[i] * nx - wx[i] * nz) * a_i;
            double viz = w[i] + (wx[i] * ny - wy[i] * nx) * a_i;
            double vjx = u[j] + (-wy[j] * nz + wz[j] * ny) * a_j;
            double vjy = v[j] + (-wz[j] * nx + wx[j] * nz) * a_j;
            double vjz = w[j] + (-wx[j] * ny + wy[j] * nx) * a_j;
            double vx_ = vix - vjx, vy_ = viy - vjy, vz_ = viz - vjz;
            double vdotn = vx_ * nx + vy_ * ny + vz_ * nz;
            double vtx = vx_ - vdotn * nx;
            double vty = vy_ - vdotn * ny;
            double vtz = vz_ - vdotn * nz;
            double m_eff = m[i] * m[j] / (m[i] + m[j]);
            double eta_n = alpha * std::sqrt(m_eff);
            double fn = kn * overlap - eta_n * vdotn;
            nfx[i] += fn * nx;
            nfy[i] += fn * ny;
            nfz[i] += fn * nz;

            // tangential history: find the (j, dem) slot, else allocate
            int slot = -1, freeslot = -1;
            for (int l = 0; l < L; ++l) {
              int32_t tj = tng_idx[i * L + l];
              if (tj == j && tng_dem[i * L + l] == e) { slot = l; break; }
              if (tj < 0 && freeslot < 0) freeslot = l;
            }
            if (slot < 0) {
              // new contact: register (zero spring), no tangential
              // force this step (dem.py:140-148); table full -> drop
              if (freeslot >= 0) {
                tng_idx[i * L + freeslot] = j;
                tng_dem[i * L + freeslot] = e;
                tng_x[i * L + freeslot] = 0.0;
                tng_y[i * L + freeslot] = 0.0;
                tng_z[i * L + freeslot] = 0.0;
              }
              return;
            }
            // project the spring onto the current tangent plane
            double sx = tng_x[i * L + slot];
            double sy = tng_y[i * L + slot];
            double sz = tng_z[i * L + slot];
            double sdotn = sx * nx + sy * ny + sz * nz;
            sx -= sdotn * nx;
            sy -= sdotn * ny;
            sz -= sdotn * nz;
            double ftx = -kt * sx - eta_n * vtx;
            double fty = -kt * sy - eta_n * vty;
            double ftz = -kt * sz - eta_n * vtz;
            double ftm = std::sqrt(ftx * ftx + fty * fty + ftz * ftz);
            double fn_mu = mu * fn;
            if (ftm > fn_mu) {  // Coulomb cap + spring rescale
              double tx = 0.0, ty = 0.0, tz = 0.0;
              if (ftm > 1e-12) {
                tx = ftx / ftm;
                ty = fty / ftm;
                tz = ftz / ftm;
              }
              ftx = fn_mu * tx;
              fty = fn_mu * ty;
              ftz = fn_mu * tz;
              double kti = 1.0 / (kt > 0.0 ? kt : 1.0);
              sx = -kti * (fn_mu * tx + eta_n * vtx);
              sy = -kti * (fn_mu * ty + eta_n * vty);
              sz = -kti * (fn_mu * tz + eta_n * vtz);
            } else {
              sx += vtx * dt;
              sy += vty * dt;
              sz += vtz * dt;
            }
            tng_x[i * L + slot] = sx;
            tng_y[i * L + slot] = sy;
            tng_z[i * L + slot] = sz;
            nfx[i] += ftx;
            nfy[i] += fty;
            nfz[i] += ftz;
            ntx[i] += (ny * ftz - nz * fty) * a_i;
            nty[i] += (nz * ftx - nx * ftz) * a_i;
            ntz[i] += (nx * fty - ny * ftx) * a_i;
          });
    }
    for (int i = 0; i < n; ++i) {
      if (mobile[i]) {
        fx[i] = m[i] * gx + nfx[i];
        fy[i] = m[i] * gy + nfy[i];
        fz[i] = m[i] * gz + nfz[i];
        torx[i] = ntx[i];
        tory[i] = nty[i];
        torz[i] = ntz[i];
      } else {
        fx[i] = fy[i] = fz[i] = 0.0;
        torx[i] = tory[i] = torz[i] = 0.0;
      }
    }

    // stage 2 drift + stage 3 second half-kick (dem.py:609-625)
    for (int i = 0; i < n; ++i) {
      if (!mobile[i]) continue;
      x[i] += dt * u[i];
      y[i] += dt * v[i];
      z[i] += dt * w[i];
      double mi = 0.5 * dt / m[i], Ii = 0.5 * dt / moi[i];
      u[i] += fx[i] * mi;
      v[i] += fy[i] * mi;
      w[i] += fz[i] * mi;
      wx[i] += torx[i] * Ii;
      wy[i] += tory[i] * Ii;
      wz[i] += torz[i] * Ii;
    }
  }
}

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

// Native mesh-geometry toolchain: STL parsing, rigid-body mass properties,
// and capsule fitting.
//
// This is the TPU build's replacement for the native mesh processing the
// reference gets from the MuJoCo C engine at model-compile time (mesh
// inertia from geometry, capsule fitting when a mesh geom is declared as a
// capsule — flygym fly.py:584-589). It runs in the asset pipeline
// (scripts/dev/derive_assets.py) and at runtime for user-supplied meshes.
//
// C API (ctypes-friendly, no C++ types across the boundary):
//   meshtools_load_stl(path, &n_tris) -> triangle buffer (9 floats per tri)
//   meshtools_free(buf)
//   meshtools_mass_properties(tris, n, scale3, out[13])
//       out = [volume, com xyz, inertia (row-major 3x3 about com)]
//   meshtools_fit_capsule(tris, n, scale3, out[9])
//       out = [pos xyz, quat wxyz, radius, halflength]
//
// Build: flygym_tpu/native/build.sh (g++ -O3 -shared). Python bindings with
// a pure-numpy fallback live in flygym_tpu/native/meshtools.py.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// STL loading
// ---------------------------------------------------------------------------

// Returns a malloc'd array of n_tris * 9 doubles (v0 v1 v2 per triangle),
// or nullptr on failure. Handles binary STL; ASCII STL falls back to a
// simple parser.
double* meshtools_load_stl(const char* path, int64_t* n_tris) {
  *n_tris = 0;
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;

  // Read header; binary STL: 80-byte header + uint32 count.
  unsigned char header[80];
  if (fread(header, 1, 80, f) != 80) {
    fclose(f);
    return nullptr;
  }
  uint32_t count = 0;
  if (fread(&count, 4, 1, f) != 1) {
    fclose(f);
    return nullptr;
  }

  // Validate binary layout by file size.
  long data_start = ftell(f);
  fseek(f, 0, SEEK_END);
  long file_size = ftell(f);
  bool is_binary =
      (file_size == data_start + (long)count * 50) && count > 0;

  double* tris = nullptr;
  if (is_binary) {
    fseek(f, data_start, SEEK_SET);
    tris = (double*)malloc(sizeof(double) * 9 * count);
    if (!tris) {
      fclose(f);
      return nullptr;
    }
    for (uint32_t t = 0; t < count; ++t) {
      float rec[12];  // normal + 3 vertices
      uint16_t attr;
      if (fread(rec, 4, 12, f) != 12 || fread(&attr, 2, 1, f) != 1) {
        free(tris);
        fclose(f);
        return nullptr;
      }
      for (int v = 0; v < 3; ++v)
        for (int k = 0; k < 3; ++k)
          tris[t * 9 + v * 3 + k] = (double)rec[3 + v * 3 + k];
    }
    *n_tris = count;
    fclose(f);
    return tris;
  }

  // ASCII fallback: scan for "vertex x y z" triples.
  fseek(f, 0, SEEK_SET);
  int64_t cap = 1024, n = 0;
  tris = (double*)malloc(sizeof(double) * 9 * cap);
  double vert[9];
  int vcount = 0;
  char line[512];
  while (fgets(line, sizeof line, f)) {
    double x, y, z;
    if (sscanf(line, " vertex %lf %lf %lf", &x, &y, &z) == 3) {
      vert[vcount * 3 + 0] = x;
      vert[vcount * 3 + 1] = y;
      vert[vcount * 3 + 2] = z;
      if (++vcount == 3) {
        if (n == cap) {
          cap *= 2;
          tris = (double*)realloc(tris, sizeof(double) * 9 * cap);
        }
        memcpy(tris + n * 9, vert, sizeof vert);
        ++n;
        vcount = 0;
      }
    }
  }
  fclose(f);
  if (n == 0) {
    free(tris);
    return nullptr;
  }
  *n_tris = n;
  return tris;
}

void meshtools_free(double* buf) { free(buf); }

// ---------------------------------------------------------------------------
// Mass properties (divergence theorem over signed origin-tetrahedra)
// ---------------------------------------------------------------------------

int meshtools_mass_properties(const double* tris, int64_t n_tris,
                              const double* scale, double* out13) {
  double vol = 0.0;
  double com[3] = {0, 0, 0};
  // Second moments accumulated about the origin.
  double xx = 0, yy = 0, zz = 0, xy = 0, xz = 0, yz = 0;

  for (int64_t t = 0; t < n_tris; ++t) {
    double a[3], b[3], c[3];
    for (int k = 0; k < 3; ++k) {
      a[k] = tris[t * 9 + 0 + k] * scale[k];
      b[k] = tris[t * 9 + 3 + k] * scale[k];
      c[k] = tris[t * 9 + 6 + k] * scale[k];
    }
    // Signed volume of tetra (origin, a, b, c).
    double v =
        (a[0] * (b[1] * c[2] - b[2] * c[1]) -
         a[1] * (b[0] * c[2] - b[2] * c[0]) +
         a[2] * (b[0] * c[1] - b[1] * c[0])) /
        6.0;
    vol += v;
    for (int k = 0; k < 3; ++k) com[k] += v * (a[k] + b[k] + c[k]) / 4.0;

    // Covariance integrals over the tetra (standard formulas):
    // integral of x_i x_j over tetra = (v/20) * (sum_i sum_j + diag terms).
    auto P = [&](int i, int j) {
      return (v / 20.0) *
             (2.0 * (a[i] * a[j] + b[i] * b[j] + c[i] * c[j]) + a[i] * b[j] +
              a[j] * b[i] + a[i] * c[j] + a[j] * c[i] + b[i] * c[j] +
              b[j] * c[i]);
    };
    xx += P(0, 0);
    yy += P(1, 1);
    zz += P(2, 2);
    xy += P(0, 1);
    xz += P(0, 2);
    yz += P(1, 2);
  }

  // Mirroring (negative scale components) flips orientation: use |volume|
  // and the consistent sign for the moments.
  double sgn = vol < 0 ? -1.0 : 1.0;
  vol *= sgn;
  if (vol <= 0) return -1;
  for (int k = 0; k < 3; ++k) com[k] = sgn * com[k] / vol;
  xx *= sgn;
  yy *= sgn;
  zz *= sgn;
  xy *= sgn;
  xz *= sgn;
  yz *= sgn;

  // Inertia (unit density) about origin, then shift to com.
  double Ixx = yy + zz, Iyy = xx + zz, Izz = xx + yy;
  double Ixy = -xy, Ixz = -xz, Iyz = -yz;
  Ixx -= vol * (com[1] * com[1] + com[2] * com[2]);
  Iyy -= vol * (com[0] * com[0] + com[2] * com[2]);
  Izz -= vol * (com[0] * com[0] + com[1] * com[1]);
  Ixy += vol * com[0] * com[1];
  Ixz += vol * com[0] * com[2];
  Iyz += vol * com[1] * com[2];

  out13[0] = vol;
  out13[1] = com[0];
  out13[2] = com[1];
  out13[3] = com[2];
  double I[9] = {Ixx, Ixy, Ixz, Ixy, Iyy, Iyz, Ixz, Iyz, Izz};
  memcpy(out13 + 4, I, sizeof I);
  return 0;
}

// ---------------------------------------------------------------------------
// Capsule fitting (PCA axis + enclosing radius / length, MuJoCo-style)
// ---------------------------------------------------------------------------

static void jacobi_eigen3(double A[3][3], double V[3][3], double w[3]) {
  // Classic Jacobi rotations for a symmetric 3x3.
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) V[i][j] = (i == j) ? 1.0 : 0.0;
  for (int sweep = 0; sweep < 50; ++sweep) {
    double off = fabs(A[0][1]) + fabs(A[0][2]) + fabs(A[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p)
      for (int q = p + 1; q < 3; ++q) {
        if (fabs(A[p][q]) < 1e-18) continue;
        double theta = (A[q][q] - A[p][p]) / (2.0 * A[p][q]);
        double sgn_t = theta >= 0 ? 1.0 : -1.0;
        double t = sgn_t / (fabs(theta) + sqrt(theta * theta + 1.0));
        double cth = 1.0 / sqrt(t * t + 1.0), s = t * cth;
        for (int k = 0; k < 3; ++k) {
          double akp = A[k][p], akq = A[k][q];
          A[k][p] = cth * akp - s * akq;
          A[k][q] = s * akp + cth * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = A[p][k], aqk = A[q][k];
          A[p][k] = cth * apk - s * aqk;
          A[q][k] = s * apk + cth * aqk;
        }
        for (int k = 0; k < 3; ++k) {
          double vkp = V[k][p], vkq = V[k][q];
          V[k][p] = cth * vkp - s * vkq;
          V[k][q] = s * vkp + cth * vkq;
        }
      }
  }
  for (int k = 0; k < 3; ++k) w[k] = A[k][k];
}

int meshtools_fit_capsule(const double* tris, int64_t n_tris,
                          const double* scale, double* out9) {
  int64_t n_pts = n_tris * 3;
  if (n_pts == 0) return -1;

  // Mean.
  double mean[3] = {0, 0, 0};
  for (int64_t i = 0; i < n_pts; ++i)
    for (int k = 0; k < 3; ++k) mean[k] += tris[i * 3 + k] * scale[k];
  for (int k = 0; k < 3; ++k) mean[k] /= (double)n_pts;

  // Covariance.
  double C[3][3] = {{0}};
  for (int64_t i = 0; i < n_pts; ++i) {
    double d[3];
    for (int k = 0; k < 3; ++k) d[k] = tris[i * 3 + k] * scale[k] - mean[k];
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) C[r][c] += d[r] * d[c];
  }
  double V[3][3], w[3];
  jacobi_eigen3(C, V, w);
  int major = 0;
  for (int k = 1; k < 3; ++k)
    if (w[k] > w[major]) major = k;
  double axis[3] = {V[0][major], V[1][major], V[2][major]};
  double norm = sqrt(axis[0] * axis[0] + axis[1] * axis[1] + axis[2] * axis[2]);
  for (int k = 0; k < 3; ++k) axis[k] /= norm;

  // Extent along the axis and max radial distance.
  double tmin = 1e300, tmax = -1e300, rmax = 0.0;
  for (int64_t i = 0; i < n_pts; ++i) {
    double d[3];
    for (int k = 0; k < 3; ++k) d[k] = tris[i * 3 + k] * scale[k] - mean[k];
    double t = d[0] * axis[0] + d[1] * axis[1] + d[2] * axis[2];
    if (t < tmin) tmin = t;
    if (t > tmax) tmax = t;
    double rx = d[0] - t * axis[0], ry = d[1] - t * axis[1],
           rz = d[2] - t * axis[2];
    double r = sqrt(rx * rx + ry * ry + rz * rz);
    if (r > rmax) rmax = r;
  }
  double radius = rmax;
  double half = (tmax - tmin) / 2.0 - radius;
  if (half < 1e-9) half = 1e-9;
  double center_t = (tmax + tmin) / 2.0;

  // Quaternion rotating +z onto the axis.
  double z[3] = {0, 0, 1};
  double dotp = z[0] * axis[0] + z[1] * axis[1] + z[2] * axis[2];
  double quat[4];
  if (dotp > 1.0 - 1e-12) {
    quat[0] = 1;
    quat[1] = quat[2] = quat[3] = 0;
  } else if (dotp < -1.0 + 1e-12) {
    quat[0] = 0;
    quat[1] = 1;
    quat[2] = quat[3] = 0;
  } else {
    double cr[3] = {z[1] * axis[2] - z[2] * axis[1],
                    z[2] * axis[0] - z[0] * axis[2],
                    z[0] * axis[1] - z[1] * axis[0]};
    double crn = sqrt(cr[0] * cr[0] + cr[1] * cr[1] + cr[2] * cr[2]);
    double ang = atan2(crn, dotp);
    double s = sin(ang / 2.0);
    quat[0] = cos(ang / 2.0);
    for (int k = 0; k < 3; ++k) quat[1 + k] = s * cr[k] / crn;
  }

  out9[0] = mean[0] + center_t * axis[0];
  out9[1] = mean[1] + center_t * axis[1];
  out9[2] = mean[2] + center_t * axis[2];
  out9[3] = quat[0];
  out9[4] = quat[1];
  out9[5] = quat[2];
  out9[6] = quat[3];
  out9[7] = radius;
  out9[8] = half;
  return 0;
}

}  // extern "C"

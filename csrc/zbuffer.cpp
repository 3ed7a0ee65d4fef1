// Native z-buffer mesh depth renderer for BOP eval (vsd).
//
// The reference defers vsd's model-depth renders to bop_toolkit's C++
// renderer (reference: bop_toolkit_lib/renderer_cpp.py:17,
// bop_toolkit_lib/pose_error.py:17-95 calls depth renders twice per
// hypothesis).  pegasus_tpu/eval.py ships a NumPy z-buffer with the exact
// same semantics for portability; this file is the native hot path — the
// same algorithm in C (double precision, identical bbox / inclusive-edge
// / perspective-correct-1/z rules), ~100x the Python-loop rate on real
// BOP meshes, called via ctypes with the GIL released.
//
// Build: make -C csrc   (g++ -O3 -shared -fPIC zbuffer.cpp)

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Render a posed triangle mesh's depth (z) image.
//   vertices: [n_verts, 3] doubles, model space
//   faces:    [n_faces, 3] int32 vertex indices
//   R:        [9] row-major 3x3, t: [3]  (x_cam = R x + t)
//   K:        [9] row-major 3x3 intrinsics
//   depth:    [height*width] doubles, written in full (0 = background)
// Returns 0 on success.
int zbuffer_render_depth(const double* vertices, int n_verts,
                         const int32_t* faces, int n_faces,
                         const double* R, const double* t, const double* K,
                         int width, int height, double* depth) {
  if (n_verts <= 0 || width <= 0 || height <= 0) return 1;
  const size_t n_px = static_cast<size_t>(width) * height;
  std::vector<double> zbuf(n_px, INFINITY);
  for (size_t i = 0; i < n_px; ++i) depth[i] = 0.0;

  // camera-space z and projected pixel coordinates per vertex
  std::vector<double> zs(n_verts), us(n_verts), vs(n_verts);
  for (int i = 0; i < n_verts; ++i) {
    const double x = vertices[3 * i], y = vertices[3 * i + 1],
                 z = vertices[3 * i + 2];
    const double cx = R[0] * x + R[1] * y + R[2] * z + t[0];
    const double cy = R[3] * x + R[4] * y + R[5] * z + t[1];
    const double cz = R[6] * x + R[7] * y + R[8] * z + t[2];
    zs[i] = cz;
    const double px = K[0] * cx + K[1] * cy + K[2] * cz;
    const double py = K[3] * cx + K[4] * cy + K[5] * cz;
    double pw = K[6] * cx + K[7] * cy + K[8] * cz;
    if (pw < 1e-12) pw = 1e-12;
    us[i] = px / pw;
    vs[i] = py / pw;
  }

  for (int f = 0; f < n_faces; ++f) {
    const int i0 = faces[3 * f], i1 = faces[3 * f + 1], i2 = faces[3 * f + 2];
    if (i0 < 0 || i0 >= n_verts || i1 < 0 || i1 >= n_verts || i2 < 0 ||
        i2 >= n_verts)
      continue;
    const double z0 = zs[i0], z1 = zs[i1], z2 = zs[i2];
    if (z0 <= 1e-6 || z1 <= 1e-6 || z2 <= 1e-6) continue;
    const double p0x = us[i0], p0y = vs[i0];
    const double p1x = us[i1], p1y = vs[i1];
    const double p2x = us[i2], p2y = vs[i2];

    int x_min = static_cast<int>(
        std::floor(std::fmin(p0x, std::fmin(p1x, p2x))));
    int x_max = static_cast<int>(
        std::ceil(std::fmax(p0x, std::fmax(p1x, p2x)))) + 1;
    int y_min = static_cast<int>(
        std::floor(std::fmin(p0y, std::fmin(p1y, p2y))));
    int y_max = static_cast<int>(
        std::ceil(std::fmax(p0y, std::fmax(p1y, p2y)))) + 1;
    if (x_min < 0) x_min = 0;
    if (y_min < 0) y_min = 0;
    if (x_max > width) x_max = width;
    if (y_max > height) y_max = height;
    if (x_min >= x_max || y_min >= y_max) continue;

    const double d =
        (p1x - p0x) * (p2y - p0y) - (p2x - p0x) * (p1y - p0y);
    if (std::fabs(d) < 1e-12) continue;

    // arithmetic kept in the NumPy reference's exact form (x / d, w / z)
    // so native and Python outputs agree to the ulp away from edges
    for (int yi = y_min; yi < y_max; ++yi) {
      const double py = yi + 0.5;
      double* row_z = zbuf.data() + static_cast<size_t>(yi) * width;
      double* row_d = depth + static_cast<size_t>(yi) * width;
      for (int xi = x_min; xi < x_max; ++xi) {
        const double px = xi + 0.5;
        const double w1 =
            ((px - p0x) * (p2y - p0y) - (p2x - p0x) * (py - p0y)) / d;
        const double w2 =
            ((p1x - p0x) * (py - p0y) - (px - p0x) * (p1y - p0y)) / d;
        const double w0 = 1.0 - w1 - w2;
        if (w0 < 0.0 || w1 < 0.0 || w2 < 0.0) continue;
        const double zi = 1.0 / (w0 / z0 + w1 / z1 + w2 / z2);
        if (zi < row_z[xi]) {
          row_z[xi] = zi;
          row_d[xi] = zi;
        }
      }
    }
  }
  return 0;
}

}  // extern "C"

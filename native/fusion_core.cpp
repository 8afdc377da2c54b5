// Native fusion core: the reproject-and-vote hot loop of depth-map fusion.
//
// The reference's fusion stage (reference: fusion.py:71-133) does, per
// (ref view, src view) pair: back-project every ref pixel with its
// estimated depth, project into the source view, bilinearly sample the
// source depth map, project back, and test reprojection distance /
// relative depth difference at 9 graduated thresholds.  In Python this is
// a chain of large temporary matrices; here it is a single fused
// OpenMP-parallel pass per row with no temporaries, called via ctypes
// (aa_rmvsnet_tpu/pipeline/native.py).  Semantics match
// aa_rmvsnet_tpu.pipeline.fuse.graduated_consistency (bilinear sampling
// with zero outside, thresholds dist < i/dist_base and
// rel_diff < i/rel_base for i in [2, 2+num_levels)).
//
// Build: cc -O3 -fopenmp -shared -fPIC fusion_core.cpp -o libfusion_core.so
// (see native/Makefile; the Python wrapper builds it on demand).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>

namespace {

// Row-major 3x3 matrix utilities (double precision like the numpy path).
struct Mat3 {
  double m[9];
  inline void mul_vec(const double v[3], double out[3]) const {
    out[0] = m[0] * v[0] + m[1] * v[1] + m[2] * v[2];
    out[1] = m[3] * v[0] + m[4] * v[1] + m[5] * v[2];
    out[2] = m[6] * v[0] + m[7] * v[1] + m[8] * v[2];
  }
};

struct Mat34 {
  double m[12];  // rows of [R | t]
  inline void transform(const double v[3], double out[3]) const {
    out[0] = m[0] * v[0] + m[1] * v[1] + m[2] * v[2] + m[3];
    out[1] = m[4] * v[0] + m[5] * v[1] + m[6] * v[2] + m[7];
    out[2] = m[8] * v[0] + m[9] * v[1] + m[10] * v[2] + m[11];
  }
};

inline float bilinear_zero(const float* img, int h, int w, float x, float y) {
  // cv2.remap INTER_LINEAR with zero border (matches the numpy path's
  // cv2.remap default BORDER_CONSTANT 0).
  int x0 = static_cast<int>(std::floor(x));
  int y0 = static_cast<int>(std::floor(y));
  float fx = x - x0, fy = y - y0;
  float acc = 0.0f;
  for (int dy = 0; dy < 2; ++dy) {
    int yy = y0 + dy;
    if (yy < 0 || yy >= h) continue;
    float wy = dy ? fy : 1.0f - fy;
    for (int dx = 0; dx < 2; ++dx) {
      int xx = x0 + dx;
      if (xx < 0 || xx >= w) continue;
      float wx = dx ? fx : 1.0f - fx;
      acc += wy * wx * img[yy * w + xx];
    }
  }
  return acc;
}

}  // namespace

extern "C" {

// Fused reproject + graduated-consistency vote for one (ref, src) pair.
//
// Inputs (all row-major):
//   depth_ref, depth_src: (h, w) float32
//   kinv_ref, k_src, k_ref: 3x3 double (inverse ref K, src K, ref K)
//   rt_ref2src, rt_src2ref: 3x4 double ([R|t] camera-to-camera transforms)
//   kinv_src: 3x3 double
//   dist_base, rel_base: threshold bases (4.0, 1300.0)
//   num_levels: graduated levels (9 -> i in [2, 11))
// Outputs:
//   level_counts: (num_levels, h, w) int32 — incremented where level passes
//   loose_mask:   (h, w) int32 — incremented where the loosest level passes
//   reproj_accum: (h, w) float32 — += reprojected depth where loosest passes
void fuse_pair(const float* depth_ref, const float* depth_src, int h, int w,
               const double* kinv_ref, const double* k_src,
               const double* kinv_src, const double* k_ref,
               const double* rt_ref2src, const double* rt_src2ref,
               double dist_base, double rel_base, int num_levels,
               int32_t* level_counts, int32_t* loose_mask,
               float* reproj_accum) {
  Mat3 KinvR, Ksrc, KinvS, Kref;
  Mat34 R2S, S2R;
  std::memcpy(KinvR.m, kinv_ref, sizeof(KinvR.m));
  std::memcpy(Ksrc.m, k_src, sizeof(Ksrc.m));
  std::memcpy(KinvS.m, kinv_src, sizeof(KinvS.m));
  std::memcpy(Kref.m, k_ref, sizeof(Kref.m));
  std::memcpy(R2S.m, rt_ref2src, sizeof(R2S.m));
  std::memcpy(S2R.m, rt_src2ref, sizeof(S2R.m));

#pragma omp parallel for schedule(static)
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int p = y * w + x;
      const double d = depth_ref[p];

      // ref pixel -> ref camera -> src camera -> src pixel
      const double pix[3] = {static_cast<double>(x) * d,
                             static_cast<double>(y) * d, d};
      double cam_ref[3], cam_src[3], k_xyz[3];
      KinvR.mul_vec(pix, cam_ref);
      R2S.transform(cam_ref, cam_src);
      Ksrc.mul_vec(cam_src, k_xyz);
      const double xs = k_xyz[0] / k_xyz[2];
      const double ys = k_xyz[1] / k_xyz[2];

      // sample src depth, project back into the ref view
      const double ds = bilinear_zero(depth_src, h, w, static_cast<float>(xs),
                                      static_cast<float>(ys));
      const double pix_s[3] = {xs * ds, ys * ds, ds};
      double cam_src2[3], cam_ref2[3], k_xyz2[3];
      KinvS.mul_vec(pix_s, cam_src2);
      S2R.transform(cam_src2, cam_ref2);
      const double depth_reproj = cam_ref2[2];
      Kref.mul_vec(cam_ref2, k_xyz2);
      const double xr = k_xyz2[0] / k_xyz2[2];
      const double yr = k_xyz2[1] / k_xyz2[2];

      const double dist = std::sqrt((xr - x) * (xr - x) + (yr - y) * (yr - y));
      const double rel =
          (d != 0.0) ? std::fabs(depth_reproj - d) / d
                     : std::numeric_limits<double>::infinity();

      bool loosest = false;
      for (int li = 0; li < num_levels; ++li) {
        const int i = li + 2;
        if (dist < i / dist_base && rel < i / rel_base) {
          level_counts[li * h * w + p] += 1;
          if (li == num_levels - 1) loosest = true;
        }
      }
      if (loosest) {
        loose_mask[p] += 1;
        reproj_accum[p] += static_cast<float>(depth_reproj);
      }
    }
  }
}

}  // extern "C"

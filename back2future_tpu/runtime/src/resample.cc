// Host-side raster resampling kernels for the data pipeline.
//
// The reference's data loader leans on torch's C image library for its
// per-sample rescales (image.scale in donkey.lua / makeData); this is the
// equivalent native layer for the rebuilt pipeline: float32 HWC bilinear
// (align-corners, ScaleBHWD convention: src = dst*(in-1)/(out-1)) and
// nearest (src = floor(dst*in/out)) resizes, OpenMP-parallel over rows.
// Semantics must match data/resample.py's NumPy implementation exactly —
// the Python side A/B-tests them (tests/test_data_native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>

extern "C" {

// img: (h, w, c) float32 contiguous; out: (oh, ow, c) float32
void resize_bilinear_f32(const float* img, float* out,
                         int64_t h, int64_t w, int64_t c,
                         int64_t oh, int64_t ow) {
  const double sy = (oh > 1) ? double(h - 1) / double(oh - 1) : 0.0;
  const double sx = (ow > 1) ? double(w - 1) / double(ow - 1) : 0.0;
#pragma omp parallel for schedule(static)
  for (int64_t y = 0; y < oh; ++y) {
    const double fy = y * sy;
    const int64_t y0 = std::min<int64_t>((int64_t)fy, h - 1);
    const int64_t y1 = std::min<int64_t>(y0 + 1, h - 1);
    const float wy = (float)(fy - (double)y0);
    const float* r0 = img + y0 * w * c;
    const float* r1 = img + y1 * w * c;
    float* dst = out + y * ow * c;
    for (int64_t x = 0; x < ow; ++x) {
      const double fx = x * sx;
      const int64_t x0 = std::min<int64_t>((int64_t)fx, w - 1);
      const int64_t x1 = std::min<int64_t>(x0 + 1, w - 1);
      const float wx = (float)(fx - (double)x0);
      const float* p00 = r0 + x0 * c;
      const float* p01 = r0 + x1 * c;
      const float* p10 = r1 + x0 * c;
      const float* p11 = r1 + x1 * c;
      for (int64_t k = 0; k < c; ++k) {
        const float top = p00[k] * (1.0f - wx) + p01[k] * wx;
        const float bot = p10[k] * (1.0f - wx) + p11[k] * wx;
        dst[x * c + k] = top * (1.0f - wy) + bot * wy;
      }
    }
  }
}

void resize_nearest_f32(const float* img, float* out,
                        int64_t h, int64_t w, int64_t c,
                        int64_t oh, int64_t ow) {
  const double sy = double(h) / double(oh);
  const double sx = double(w) / double(ow);
#pragma omp parallel for schedule(static)
  for (int64_t y = 0; y < oh; ++y) {
    const int64_t ys = std::min<int64_t>((int64_t)(y * sy), h - 1);
    const float* src_row = img + ys * w * c;
    float* dst = out + y * ow * c;
    for (int64_t x = 0; x < ow; ++x) {
      const int64_t xs = std::min<int64_t>((int64_t)(x * sx), w - 1);
      for (int64_t k = 0; k < c; ++k) dst[x * c + k] = src_row[xs * c + k];
    }
  }
}

}  // extern "C"

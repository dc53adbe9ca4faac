// dfdata: native data-path kernels for the DualForce-TPU input pipeline.
//
// Role: the TPU-native counterpart of the reference's torchcodec/FFmpeg C++
// decode path (SURVEY.md §2.3) for the environments this framework targets —
// preprocessed clip shards. Host-side hot loops (frame resize/crop/normalize,
// PCM conversion/resampling, uint8<->float packing) run here with OpenMP
// threads so Python prefetch workers never touch per-pixel loops.
//
// Build: make -C native (g++ -O3 -fopenmp -shared). Loaded via ctypes
// (dualforce_tpu/data/native.py) with a pure-numpy fallback when the .so is
// absent.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Bilinear resize (aspect-preserving scale to cover) + center crop +
// normalize to [-1, 1]. src: [T, H, W, 3] uint8; dst: [T, out_h, out_w, 3] f32.
void df_resize_crop_normalize(const uint8_t* src, int64_t T, int64_t H,
                              int64_t W, int64_t out_h, int64_t out_w,
                              float* dst) {
  const double scale = std::max(double(out_w) / W, double(out_h) / H);
  const double in_w_used = out_w / scale;
  const double in_h_used = out_h / scale;
  const double x0 = (W - in_w_used) / 2.0;
  const double y0 = (H - in_h_used) / 2.0;

#pragma omp parallel for schedule(static)
  for (int64_t t = 0; t < T; ++t) {
    const uint8_t* frame = src + t * H * W * 3;
    float* out = dst + t * out_h * out_w * 3;
    for (int64_t oy = 0; oy < out_h; ++oy) {
      const double sy = y0 + (oy + 0.5) / scale - 0.5;
      const int64_t iy0 = std::clamp<int64_t>((int64_t)std::floor(sy), 0, H - 1);
      const int64_t iy1 = std::min<int64_t>(iy0 + 1, H - 1);
      const float fy = (float)(sy - iy0);
      for (int64_t ox = 0; ox < out_w; ++ox) {
        const double sx = x0 + (ox + 0.5) / scale - 0.5;
        const int64_t ix0 = std::clamp<int64_t>((int64_t)std::floor(sx), 0, W - 1);
        const int64_t ix1 = std::min<int64_t>(ix0 + 1, W - 1);
        const float fx = (float)(sx - ix0);
        for (int c = 0; c < 3; ++c) {
          const float p00 = frame[(iy0 * W + ix0) * 3 + c];
          const float p01 = frame[(iy0 * W + ix1) * 3 + c];
          const float p10 = frame[(iy1 * W + ix0) * 3 + c];
          const float p11 = frame[(iy1 * W + ix1) * 3 + c];
          const float top = p00 + (p01 - p00) * fx;
          const float bot = p10 + (p11 - p10) * fx;
          const float v = top + (bot - top) * fy;
          out[(oy * out_w + ox) * 3 + c] = v / 127.5f - 1.0f;
        }
      }
    }
  }
}

// int16 PCM -> float32 [-1, 1] with linear resampling sr_in -> sr_out.
// Returns the number of output samples written (<= out_capacity).
int64_t df_pcm_resample(const int16_t* src, int64_t n, int64_t sr_in,
                        int64_t sr_out, float* dst, int64_t out_capacity) {
  if (n <= 0 || sr_in <= 0 || sr_out <= 0) return 0;
  if (sr_in == sr_out) {
    const int64_t m = std::min(n, out_capacity);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < m; ++i) dst[i] = src[i] / 32768.0f;
    return m;
  }
  const int64_t out_n =
      std::min((int64_t)((double)n * sr_out / sr_in), out_capacity);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < out_n; ++i) {
    const double pos = (double)i * sr_in / sr_out;
    const int64_t i0 = std::min((int64_t)pos, n - 1);
    const int64_t i1 = std::min(i0 + 1, n - 1);
    const double f = pos - i0;
    dst[i] = (float)((src[i0] * (1.0 - f) + src[i1] * f) / 32768.0);
  }
  return out_n;
}

// Multi-channel int16 PCM -> mono float32.
void df_pcm_to_mono(const int16_t* src, int64_t frames, int64_t channels,
                    float* dst) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int64_t c = 0; c < channels; ++c) acc += src[i * channels + c];
    dst[i] = (float)(acc / (channels * 32768.0));
  }
}

// float [-1,1] video -> uint8 frames (for AV mux output path).
void df_float_to_uint8(const float* src, int64_t n, uint8_t* dst) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    float v = (src[i] + 1.0f) * 127.5f;
    dst[i] = (uint8_t)std::clamp(v + 0.5f, 0.0f, 255.0f);
  }
}

}  // extern "C"

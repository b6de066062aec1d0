// Native image preprocessing for the input pipeline: aspect-preserving
// bilinear resize, crop, horizontal flip and uint8 -> float32 CHW
// normalization, batched across a thread pool.
//
// The reference does all of this in Python via torchvision/PIL per sample
// (/root/reference/datasets/transforms.py); on a TPU VM host the input
// pipeline must keep up with >500 imgs/sec/chip, so the hot loop lives here.
// Built as a plain shared library, loaded from Python via ctypes
// (attention_models_tpu/native/__init__.py). No external dependencies.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Sample-based bilinear resize (half-pixel centers, like cv2 INTER_LINEAR).
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, uint8_t* dst,
                        int dh, int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(fy >= 0 ? fy : fy - 1);
    float wy = fy - y0;
    int y0c = std::clamp(y0, 0, sh - 1);
    int y1c = std::clamp(y0 + 1, 0, sh - 1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(fx >= 0 ? fx : fx - 1);
      float wx = fx - x0;
      int x0c = std::clamp(x0, 0, sw - 1);
      int x1c = std::clamp(x0 + 1, 0, sw - 1);
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(y0c * sw + x0c) * 3 + c];
        float v01 = src[(y0c * sw + x1c) * 3 + c];
        float v10 = src[(y1c * sw + x0c) * 3 + c];
        float v11 = src[(y1c * sw + x1c) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(y * dw + x) * 3 + c] =
            static_cast<uint8_t>(std::clamp(v + 0.5f, 0.0f, 255.0f));
      }
    }
  }
}

void process_one(const uint8_t* src, int sh, int sw, int resize_to,
                 int crop_size, int crop_top, int crop_left, bool flip,
                 float* out /* (3, crop, crop) */) {
  // aspect-preserving resize: shorter side -> resize_to
  int rh, rw;
  if (sw <= sh) {
    rw = resize_to;
    rh = std::max(1, static_cast<int>(
        static_cast<float>(sh) * resize_to / sw + 0.5f));
  } else {
    rh = resize_to;
    rw = std::max(1, static_cast<int>(
        static_cast<float>(sw) * resize_to / sh + 0.5f));
  }
  std::vector<uint8_t> resized(static_cast<size_t>(rh) * rw * 3);
  resize_bilinear_u8(src, sh, sw, resized.data(), rh, rw);

  int top = std::clamp(crop_top, 0, std::max(rh - crop_size, 0));
  int left = std::clamp(crop_left, 0, std::max(rw - crop_size, 0));
  const float inv = 1.0f / 255.0f;
  const size_t plane = static_cast<size_t>(crop_size) * crop_size;
  for (int y = 0; y < crop_size; ++y) {
    int syi = std::min(top + y, rh - 1);
    for (int x = 0; x < crop_size; ++x) {
      int sxi = std::min(left + (flip ? crop_size - 1 - x : x), rw - 1);
      const uint8_t* px = &resized[(static_cast<size_t>(syi) * rw + sxi) * 3];
      size_t o = static_cast<size_t>(y) * crop_size + x;
      out[0 * plane + o] = px[0] * inv;
      out[1 * plane + o] = px[1] * inv;
      out[2 * plane + o] = px[2] * inv;
    }
  }
}

}  // namespace

extern "C" {

// srcs[i]: HWC uint8 RGB buffer of shape (hs[i], ws[i], 3).
// out: (n, 3, crop_size, crop_size) float32.
void preprocess_batch(const uint8_t** srcs, const int* hs, const int* ws,
                      int n, int resize_to, int crop_size,
                      const int* crop_tops, const int* crop_lefts,
                      const uint8_t* flips, float* out, int num_threads) {
  const size_t out_stride = 3ul * crop_size * crop_size;
  num_threads = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> pool;
  std::vector<int> next(1, 0);
  auto worker = [&](int tid) {
    for (int i = tid; i < n; i += num_threads) {
      process_one(srcs[i], hs[i], ws[i], resize_to, crop_size, crop_tops[i],
                  crop_lefts[i], flips[i] != 0, out + i * out_stride);
    }
  };
  for (int t = 1; t < num_threads; ++t) pool.emplace_back(worker, t);
  worker(0);
  for (auto& th : pool) th.join();
}

int native_abi_version() { return 1; }

}  // extern "C"

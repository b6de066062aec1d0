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
  // exact-square resize (reference semantics: T.Resize((n, n)) distorts
  // aspect; crops below then operate within the square)
  int rh = resize_to, rw = resize_to;
  (void)sh; (void)sw;
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

int native_abi_version() { return 3; }

}  // extern "C"

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg), fused with the preprocess above so raw file bytes go
// straight to normalized (3, crop, crop) float tensors — no PIL on the host
// hot path. Compiled in only when libjpeg is available (-DHAVE_LIBJPEG).
// ---------------------------------------------------------------------------
#ifdef HAVE_LIBJPEG
#include <csetjmp>
#include <cstdio>
#include <jpeglib.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  std::longjmp(err->jump, 1);
}

// Decode one JPEG into an RGB u8 HWC buffer. Returns false on corrupt input.
bool decode_jpeg_rgb(const uint8_t* data, size_t len,
                     std::vector<uint8_t>* out, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  out->resize(static_cast<size_t>(*h) * *w * 3);
  const size_t row_stride = static_cast<size_t>(*w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data() + cinfo.output_scanline * row_stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

}  // namespace
#endif  // HAVE_LIBJPEG

extern "C" {

int native_has_jpeg() {
#ifdef HAVE_LIBJPEG
  return 1;
#else
  return 0;
#endif
}

// jpegs[i]: raw JPEG file bytes of length lens[i].
// crop fracs in [0,1] pick the crop origin uniformly over the valid range;
// a NEGATIVE frac means center crop ((avail)/2 — the torchvision formula).
// out: (n, 3, crop, crop) float32; ok[i]=0 marks undecodable inputs (their
// out slice is zeroed; the caller re-decodes those via its fallback).
void decode_preprocess_batch(const uint8_t** jpegs, const uint64_t* lens,
                             int n, int resize_to, int crop_size,
                             const float* top_fracs, const float* left_fracs,
                             const uint8_t* flips, float* out, uint8_t* ok,
                             int num_threads) {
  const size_t out_stride = 3ul * crop_size * crop_size;
#ifdef HAVE_LIBJPEG
  num_threads = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> pool;
  auto worker = [&](int tid) {
    std::vector<uint8_t> rgb;
    for (int i = tid; i < n; i += num_threads) {
      int h = 0, w = 0;
      if (!decode_jpeg_rgb(jpegs[i], lens[i], &rgb, &h, &w)) {
        std::memset(out + i * out_stride, 0, out_stride * sizeof(float));
        ok[i] = 0;
        continue;
      }
      // crop offsets from fractions, on the RESIZED (exact-square) dims,
      // matching NativeBatchTransform's Python-side math
      int rh = resize_to, rw = resize_to;
      int avail_t = std::max(rh - crop_size, 0);
      int avail_l = std::max(rw - crop_size, 0);
      int top = top_fracs[i] < 0
          ? avail_t / 2
          : std::min(static_cast<int>(top_fracs[i] * (avail_t + 1)), avail_t);
      int left = left_fracs[i] < 0
          ? avail_l / 2
          : std::min(static_cast<int>(left_fracs[i] * (avail_l + 1)), avail_l);
      process_one(rgb.data(), h, w, resize_to, crop_size, top, left,
                  flips[i] != 0, out + i * out_stride);
      ok[i] = 1;
    }
  };
  for (int t = 1; t < num_threads; ++t) pool.emplace_back(worker, t);
  worker(0);
  for (auto& th : pool) th.join();
#else
  (void)jpegs; (void)lens; (void)resize_to; (void)crop_size;
  (void)top_fracs; (void)left_fracs; (void)flips; (void)num_threads;
  for (int i = 0; i < n; ++i) {
    std::memset(out + i * out_stride, 0, out_stride * sizeof(float));
    ok[i] = 0;
  }
#endif
}

}  // extern "C"

// lpr_native — native host data path for the TPU pipeline.
//
// The reference leans on OpenCV/PIL/torchvision native code for its host
// work (image decode, resize/letterbox, NMS).  The TPU build moves NMS and
// geometry on-device; what remains host-side — JPEG/PNG decode and batch
// letterbox into pinned staging buffers — is the feeder for a ~500 fps/chip
// pipeline and must be parallel native code, not Python.
//
// C ABI (ctypes-friendly):
//   lpr_decode_image(bytes, len, &w, &h) -> malloc'd RGB8 buffer (caller
//     frees via lpr_free)
//   lpr_load_letterbox_batch(paths[], n, out, oh, ow, fill, n_threads)
//     -> decode + aspect-preserving bilinear resize + center pad, parallel
//        across images; out is (n, oh, ow, 3) uint8.
//
// Build: make -C native   (links libjpeg + libpng16, both in the base image)

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <csetjmp>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

uint8_t* decode_jpeg(const uint8_t* data, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  // volatile: `out` is written between setjmp and longjmp; without the
  // qualifier its value after longjmp is indeterminate (C 7.13.2.1) and the
  // error path's free() would be UB on a corrupt/truncated JPEG.
  uint8_t* volatile out = nullptr;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    free(out);
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  size_t stride = static_cast<size_t>(*w) * 3;
  out = static_cast<uint8_t*>(malloc(stride * *h));
  if (out == nullptr) {
    jpeg_destroy_decompress(&cinfo);
    return nullptr;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return out;
}

uint8_t* decode_png(const uint8_t* data, size_t len, int* w, int* h) {
  png_image image;
  memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, data, len)) return nullptr;
  image.format = PNG_FORMAT_RGB;
  size_t stride = PNG_IMAGE_ROW_STRIDE(image);
  auto* out = static_cast<uint8_t*>(malloc(PNG_IMAGE_SIZE(image)));
  if (out == nullptr) {
    png_image_free(&image);
    return nullptr;
  }
  if (!png_image_finish_read(&image, nullptr, out, stride, nullptr)) {
    free(out);
    png_image_free(&image);
    return nullptr;
  }
  *w = image.width;
  *h = image.height;
  return out;
}

// Aspect-preserving bilinear resize + center pad into (oh, ow, 3).
void letterbox_into(const uint8_t* src, int sw, int sh, uint8_t* dst, int oh,
                    int ow, uint8_t fill) {
  memset(dst, fill, static_cast<size_t>(oh) * ow * 3);
  double r = std::min(static_cast<double>(oh) / sh,
                      static_cast<double>(ow) / sw);
  int nh = std::max(1, static_cast<int>(sh * r + 0.5));
  int nw = std::max(1, static_cast<int>(sw * r + 0.5));
  int top = (oh - nh) / 2, left = (ow - nw) / 2;
  if (nh == sh && nw == sw) {  // pad-only: row memcpy, no resample
    for (int y = 0; y < nh; ++y)
      memcpy(dst + (static_cast<size_t>(top + y) * ow + left) * 3,
             src + static_cast<size_t>(y) * sw * 3,
             static_cast<size_t>(sw) * 3);
    return;
  }
  double sy_step = static_cast<double>(sh) / nh;
  double sx_step = static_cast<double>(sw) / nw;
  // precomputed per-column taps/weights (the row loop reuses them)
  std::vector<int> xs0(nw), xs1(nw);
  std::vector<float> wxs(nw);
  for (int x = 0; x < nw; ++x) {
    double fx = (x + 0.5) * sx_step - 0.5;
    int x0 = fx < 0 ? 0 : static_cast<int>(fx);
    xs0[x] = x0;
    xs1[x] = x0 + 1 < sw ? x0 + 1 : sw - 1;
    double wx = fx - x0;
    wxs[x] = wx < 0 ? 0.0f : static_cast<float>(wx);
  }
  for (int y = 0; y < nh; ++y) {
    double fy = (y + 0.5) * sy_step - 0.5;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = fy < y0 ? 0.0f : static_cast<float>(fy - y0);
    uint8_t* drow = dst + (static_cast<size_t>(top + y) * ow + left) * 3;
    const uint8_t* s0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* s1 = src + static_cast<size_t>(y1) * sw * 3;
    for (int x = 0; x < nw; ++x) {
      int x0 = xs0[x] * 3, x1 = xs1[x] * 3;
      float wx = wxs[x];
      for (int c = 0; c < 3; ++c) {
        float top_v = s0[x0 + c] * (1 - wx) + s0[x1 + c] * wx;
        float bot_v = s1[x0 + c] * (1 - wx) + s1[x1 + c] * wx;
        drow[x * 3 + c] =
            static_cast<uint8_t>(top_v * (1 - wy) + bot_v * wy + 0.5f);
      }
    }
  }
}

// Quarter-grid pack of one letterboxed (oh, ow, 3) RGB frame into the
// fused front kernel's input layout: 4 parity planes x 16 channels (12
// S2D channels + 4 zero pads) over the (oh/4, ow/4) quarter grid, rows
// padded 4 + to rp, cols padded 4 + to cp (lpr_tpu/ops/pallas/yolo_front.py
// pack_front_frames_host is the numpy reference; ~13 ms/frame there vs
// ~1 ms here — the host feeder for the packed-input serving path).
//
// Mapping: lb[rr*4 + b1*2 + b2, cc*4 + d1*2 + d2, ch] ->
//   out[(b1*2 + d1)*16 + ch*4 + b2*2 + d2, (rr+4)*cp + cc+4]
void pack_front_into(const uint8_t* lb, int oh, int ow, uint8_t* out, int rp,
                     int cp) {
  int c3rows = oh / 4, cols = ow / 4;
  size_t plane = static_cast<size_t>(rp) * cp;
  memset(out, 0, 64 * plane);
  for (int rr = 0; rr < c3rows; ++rr) {
    for (int sub = 0; sub < 4; ++sub) {  // input row rr*4 + b1*2 + b2
      int b1 = sub >> 1, b2 = sub & 1;
      const uint8_t* src = lb + (static_cast<size_t>(rr) * 4 + sub) * ow * 3;
      // 12 destination rows for this input row: (d1, d2, ch)
      uint8_t* dst[2][2][3];
      for (int d1 = 0; d1 < 2; ++d1)
        for (int d2 = 0; d2 < 2; ++d2)
          for (int ch = 0; ch < 3; ++ch)
            dst[d1][d2][ch] =
                out + ((b1 * 2 + d1) * 16 + ch * 4 + b2 * 2 + d2) * plane +
                static_cast<size_t>(rr + 4) * cp + 4;
      for (int cc = 0; cc < cols; ++cc) {
        const uint8_t* px = src + static_cast<size_t>(cc) * 12;  // 4 px RGB
        for (int d1 = 0; d1 < 2; ++d1)
          for (int d2 = 0; d2 < 2; ++d2) {
            const uint8_t* p = px + (d1 * 2 + d2) * 3;
            dst[d1][d2][0][cc] = p[0];
            dst[d1][d2][1][cc] = p[1];
            dst[d1][d2][2][cc] = p[2];
          }
      }
    }
  }
}

uint8_t* decode_any(const uint8_t* data, size_t len, int* w, int* h) {
  if (len > 3 && data[0] == 0xFF && data[1] == 0xD8)
    return decode_jpeg(data, len, w, h);
  if (len > 8 && data[0] == 0x89 && data[1] == 'P')
    return decode_png(data, len, w, h);
  return nullptr;
}

uint8_t* read_file(const char* path, size_t* len) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  if (sz < 0) {
    fclose(f);
    return nullptr;
  }
  fseek(f, 0, SEEK_SET);
  auto* buf = static_cast<uint8_t*>(malloc(sz > 0 ? sz : 1));
  if (buf == nullptr) {
    fclose(f);
    return nullptr;
  }
  size_t got = fread(buf, 1, sz, f);
  fclose(f);
  if (static_cast<long>(got) != sz) {
    free(buf);
    return nullptr;
  }
  *len = sz;
  return buf;
}

}  // namespace

extern "C" {

void lpr_free(void* p) { free(p); }

uint8_t* lpr_decode_image(const uint8_t* data, size_t len, int* w, int* h) {
  return decode_any(data, len, w, h);
}

// Parallel decode + letterbox of n files into out (n, oh, ow, 3) uint8.
// Returns the number of successfully loaded images (failed slots stay fill).
int lpr_load_letterbox_batch(const char** paths, int n, uint8_t* out, int oh,
                             int ow, uint8_t fill, int n_threads) {
  std::atomic<int> next{0};
  std::atomic<int> ok{0};
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads > n) n_threads = n;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* slot = out + static_cast<size_t>(i) * oh * ow * 3;
      size_t len = 0;
      uint8_t* file = read_file(paths[i], &len);
      if (!file) {
        memset(slot, fill, static_cast<size_t>(oh) * ow * 3);
        continue;
      }
      int w = 0, h = 0;
      uint8_t* img = decode_any(file, len, &w, &h);
      free(file);
      if (!img) {
        memset(slot, fill, static_cast<size_t>(oh) * ow * 3);
        continue;
      }
      letterbox_into(img, w, h, slot, oh, ow, fill);
      free(img);
      ok.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

// Parallel quarter-grid pack of pre-letterboxed frames (n, oh, ow, 3)
// uint8 -> (n, 64, rp*cp) uint8 (fused-front kernel input layout).
void lpr_pack_front_batch(const uint8_t* lb, int n, int oh, int ow,
                          uint8_t* out, int rp, int cp, int n_threads) {
  std::atomic<int> next{0};
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads > n) n_threads = n;
  size_t in_sz = static_cast<size_t>(oh) * ow * 3;
  size_t out_sz = 64 * static_cast<size_t>(rp) * cp;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      pack_front_into(lb + i * in_sz, oh, ow, out + i * out_sz, rp, cp);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// Raw frames (n, h, w, 3) uint8: letterbox to (oh, ow) with `fill` +
// quarter-grid pack -> (n, 64, rp*cp).  The full host side of the
// packed-input serving path in one parallel call.
void lpr_letterbox_pack_batch(const uint8_t* frames, int n, int h, int w,
                              uint8_t* out, int oh, int ow, int rp, int cp,
                              uint8_t fill, int n_threads) {
  std::atomic<int> next{0};
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads > n) n_threads = n;
  size_t in_sz = static_cast<size_t>(h) * w * 3;
  size_t lb_sz = static_cast<size_t>(oh) * ow * 3;
  size_t out_sz = 64 * static_cast<size_t>(rp) * cp;
  auto worker = [&]() {
    std::vector<uint8_t> lb(lb_sz);
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      const uint8_t* src = frames + i * in_sz;
      if (h == oh && w == ow) {
        pack_front_into(src, oh, ow, out + i * out_sz, rp, cp);
      } else {
        letterbox_into(src, w, h, lb.data(), oh, ow, fill);
        pack_front_into(lb.data(), oh, ow, out + i * out_sz, rp, cp);
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"

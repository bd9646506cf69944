// Native host input pipeline: JPEG decode (libjpeg, with DCT-domain
// downscale) and fused crop + horizontal-flip + normalize-to-[-1,1].
//
// The reference leans on torch DataLoader workers + PIL for its input
// pipeline (reference data/imagenet_base.py); here the hot host loop is
// C++ (OpenMP across images) exposed via ctypes — the TPU-side analog of a
// "native data loader" runtime component. Python falls back to PIL/numpy
// when this library is unavailable (see native/__init__.py).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC host_pipeline.cpp
//        -ljpeg -o libdqvq_host.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>

#include <jpeglib.h>

extern "C" {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG from memory into an RGB uint8 buffer.
// scale_denom in {1,2,4,8} applies libjpeg's DCT-domain downscale (nearly
// free) — callers pick the largest denom that keeps min(h,w) >= target.
// Returns 0 on success; fills *out_h/*out_w. out must hold
// ceil(h/denom)*ceil(w/denom)*3 bytes.
int dqvq_decode_jpeg(const uint8_t* buf, long len, int scale_denom,
                     uint8_t* out, long out_cap, int* out_h, int* out_w) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = 1;
  cinfo.scale_denom = scale_denom;
  cinfo.dct_method = JDCT_ISLOW;
  jpeg_start_decompress(&cinfo);

  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const long row_bytes = static_cast<long>(w) * 3;
  if (row_bytes * h > out_cap) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<long>(cinfo.output_scanline) * row_bytes;
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_h = h;
  *out_w = w;
  return 0;
}

// Read just the dimensions (for choosing scale_denom / crop geometry).
int dqvq_jpeg_dims(const uint8_t* buf, long len, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Bilinear resize uint8 HWC RGB.
void dqvq_resize_bilinear(const uint8_t* src, int sh, int sw,
                          uint8_t* dst, int dh, int dw) {
  const float ys = dh > 1 ? static_cast<float>(sh - 1) / (dh - 1) : 0.f;
  const float xs = dw > 1 ? static_cast<float>(sw - 1) / (dw - 1) : 0.f;
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    const float fy = y * ys;
    const int y0 = static_cast<int>(fy);
    const int y1 = y0 + 1 < sh ? y0 + 1 : y0;
    const float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      const float fx = x * xs;
      const int x0 = static_cast<int>(fx);
      const int x1 = x0 + 1 < sw ? x0 + 1 : x0;
      const float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        const float a = src[(y0 * sw + x0) * 3 + c];
        const float b = src[(y0 * sw + x1) * 3 + c];
        const float d = src[(y1 * sw + x0) * 3 + c];
        const float e = src[(y1 * sw + x1) * 3 + c];
        const float top = a + (b - a) * wx;
        const float bot = d + (e - d) * wx;
        dst[(y * dw + x) * 3 + c] =
            static_cast<uint8_t>(top + (bot - top) * wy + 0.5f);
      }
    }
  }
}

// Fused crop + optional horizontal flip + uint8 -> float32 in [-1, 1].
void dqvq_crop_flip_normalize(const uint8_t* src, int sh, int sw,
                              int top, int left, int size, int flip,
                              float* dst) {
  constexpr float kScale = 2.0f / 255.0f;
#pragma omp parallel for schedule(static)
  for (int y = 0; y < size; ++y) {
    const uint8_t* srow = src + (static_cast<long>(top + y) * sw + left) * 3;
    float* drow = dst + static_cast<long>(y) * size * 3;
    if (flip) {
      for (int x = 0; x < size; ++x) {
        const uint8_t* p = srow + (size - 1 - x) * 3;
        drow[x * 3 + 0] = p[0] * kScale - 1.0f;
        drow[x * 3 + 1] = p[1] * kScale - 1.0f;
        drow[x * 3 + 2] = p[2] * kScale - 1.0f;
      }
    } else {
      for (int x = 0; x < size; ++x) {
        const uint8_t* p = srow + x * 3;
        drow[x * 3 + 0] = p[0] * kScale - 1.0f;
        drow[x * 3 + 1] = p[1] * kScale - 1.0f;
        drow[x * 3 + 2] = p[2] * kScale - 1.0f;
      }
    }
  }
}

}  // extern "C"

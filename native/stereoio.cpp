// stereoio — native host-side IO for the stereo data pipeline.
//
// The TPU-native analog of the reference's vendored native data path
// (models/lib/utils/data/dataloader.py + CUDA-side preprocessing): decode
// PFM/PNG and normalize on the host at memory bandwidth, keeping the feed
// ahead of the device. Exposed to Python via ctypes
// (dcanet_tpu/data/native.py); built with `make -C native`.
//
// API (C, two-phase):
//   sio_image_info(path, &h, &w, &channels, &bitdepth) -> 0 ok
//   sio_read_image_f32(path, out, h*w*c)               -> decode to float32
//       PNG 8-bit  -> values in [0, 255]
//       PNG 16-bit -> raw uint16 values (KITTI disparity: divide by 256 on
//                     the Python side)
//       PFM        -> float values, top row first
//   sio_normalize_imagenet(img255, out, npix)          -> (x/255 - mean)/std

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

#include <png.h>

extern "C" {

// ---------------------------------------------------------------- PFM ----

static int pfm_header(FILE* f, int* h, int* w, int* channels, float* scale) {
  char tag[3] = {0};
  if (fscanf(f, "%2s", tag) != 1) return -1;
  if (tag[0] != 'P' || (tag[1] != 'F' && tag[1] != 'f')) return -1;
  *channels = (tag[1] == 'F') ? 3 : 1;
  if (fscanf(f, "%d %d %f", w, h, scale) != 3) return -1;
  fgetc(f);  // single whitespace after the scale line
  return 0;
}

static int read_pfm_f32(const char* path, float* out, int64_t cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int h, w, c;
  float scale;
  if (pfm_header(f, &h, &w, &c, &scale) != 0) { fclose(f); return -2; }
  int64_t n = (int64_t)h * w * c;
  if (out == nullptr) { fclose(f); return -3; }
  if (n > cap) { fclose(f); return -4; }
  float* raw = (float*)malloc(n * sizeof(float));
  if (fread(raw, sizeof(float), n, f) != (size_t)n) {
    free(raw); fclose(f); return -5;
  }
  fclose(f);
  const bool little = scale < 0.0f;
  const bool host_little = [] { uint16_t x = 1; return *(uint8_t*)&x == 1; }();
  if (little != host_little) {
    uint32_t* p = (uint32_t*)raw;
    for (int64_t i = 0; i < n; ++i) p[i] = __builtin_bswap32(p[i]);
  }
  // PFM stores bottom row first; flip vertically.
  int64_t row = (int64_t)w * c;
  for (int y = 0; y < h; ++y)
    memcpy(out + (int64_t)(h - 1 - y) * row, raw + (int64_t)y * row,
           row * sizeof(float));
  free(raw);
  return 0;
}

static int pfm_info(const char* path, int* h, int* w, int* channels,
                    int* bitdepth) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  float scale;
  int rc = pfm_header(f, h, w, channels, &scale);
  fclose(f);
  *bitdepth = 32;
  return rc;
}

// ---------------------------------------------------------------- PNG ----

static int png_file_info(const char* path, int* h, int* w, int* channels,
                    int* bitdepth) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -2;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  *channels = png_get_channels(png, info);
  *bitdepth = png_get_bit_depth(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return 0;
}

static int read_png_f32(const char* path, float* out, int64_t cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  png_bytep* rows = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    if (rows) free(rows);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -2;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  int depth = png_get_bit_depth(png, info);
  // normalize palette/gray-alpha forms to plain RGB/gray
  png_set_palette_to_rgb(png);
  if (depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  int c = png_get_channels(png, info);
  depth = png_get_bit_depth(png, info);
  int64_t n = (int64_t)h * w * c;
  if (n > cap) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -4;
  }
  size_t rowbytes = png_get_rowbytes(png, info);
  png_bytep data = (png_bytep)malloc(rowbytes * h);
  rows = (png_bytep*)malloc(sizeof(png_bytep) * h);
  for (int y = 0; y < h; ++y) rows[y] = data + rowbytes * y;
  png_read_image(png, rows);
  if (depth == 16) {
    // PNG is big-endian uint16
    for (int64_t i = 0; i < n; ++i) {
      uint16_t v = (uint16_t)((data[2 * i] << 8) | data[2 * i + 1]);
      out[i] = (float)v;
    }
  } else {
    for (int64_t i = 0; i < n; ++i) out[i] = (float)data[i];
  }
  free(data);
  free(rows);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------- API ----

static bool is_pfm(const char* path) {
  size_t len = strlen(path);
  return len >= 4 && strcmp(path + len - 4, ".pfm") == 0;
}

int sio_image_info(const char* path, int* h, int* w, int* channels,
                   int* bitdepth) {
  if (is_pfm(path)) return pfm_info(path, h, w, channels, bitdepth);
  return png_file_info(path, h, w, channels, bitdepth);
}

int sio_read_image_f32(const char* path, float* out, int64_t cap) {
  if (is_pfm(path)) return read_pfm_f32(path, out, cap);
  return read_png_f32(path, out, cap);
}

void sio_normalize_imagenet(const float* img255, float* out, int64_t npix) {
  static const float mean[3] = {0.485f, 0.456f, 0.406f};
  static const float inv_std[3] = {1.0f / 0.229f, 1.0f / 0.224f, 1.0f / 0.225f};
  for (int64_t i = 0; i < npix; ++i) {
    const float* p = img255 + 3 * i;
    float* q = out + 3 * i;
    q[0] = (p[0] * (1.0f / 255.0f) - mean[0]) * inv_std[0];
    q[1] = (p[1] * (1.0f / 255.0f) - mean[1]) * inv_std[1];
    q[2] = (p[2] * (1.0f / 255.0f) - mean[2]) * inv_std[2];
  }
}

}  // extern "C"

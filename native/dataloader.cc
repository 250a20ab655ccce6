// Native data loader for photoverse_tpu.
//
// Replaces the reference's Python-side hot input path (PIL decode +
// torchvision Resize/CenterCrop/Normalize + CLIPImageProcessor,
// /root/reference/datasets/custom.py:77-93 and datasets/utils.py:139-157)
// with a multithreaded C++ pipeline: libjpeg/libpng decode, PIL-equivalent
// convolution resampling (cubic a=-0.5 with support scaled for
// downsampling, i.e. antialiased), center crop, and fused normalization
// into both output branches:
//   pixel_values      (size,size,3)      in [-1, 1]
//   pixel_values_clip (clip_size^2 * 3)  CLIP mean/std normalized
//
// Exposed as a C ABI for ctypes (photoverse_tpu/data/native_loader.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct ImageU8 {
  int w = 0, h = 0;
  std::vector<uint8_t> data;  // HWC, RGB
};

// ---------------------------------------------------------------------------
// decode
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const uint8_t* buf, size_t len, ImageU8* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadCtx {
  const uint8_t* buf;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp p, png_bytep out, png_size_t n) {
  auto* c = static_cast<PngReadCtx*>(png_get_io_ptr(p));
  if (c->pos + n > c->len) png_error(p, "eof");
  memcpy(out, c->buf + c->pos, n);
  c->pos += n;
}

bool decode_png(const uint8_t* buf, size_t len, ImageU8* out) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return false;
  png_structp p = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!p) return false;
  png_infop info = png_create_info_struct(p);
  if (!info) {
    png_destroy_read_struct(&p, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(p))) {
    png_destroy_read_struct(&p, &info, nullptr);
    return false;
  }
  PngReadCtx ctx{buf, len, 0};
  png_set_read_fn(p, &ctx, png_read_fn);
  png_read_info(p, info);
  png_set_strip_16(p);
  png_set_palette_to_rgb(p);
  png_set_expand_gray_1_2_4_to_8(p);
  png_set_gray_to_rgb(p);
  png_set_strip_alpha(p);
  png_read_update_info(p, info);
  out->w = png_get_image_width(p, info);
  out->h = png_get_image_height(p, info);
  out->data.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * 3;
  png_read_image(p, rows.data());
  png_destroy_read_struct(&p, &info, nullptr);
  return true;
}

bool decode_file(const char* path, ImageU8* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n <= 0) {  // ftell error (-1) or empty file: vector(size_t(n)) would
    fclose(f);   // request ~SIZE_MAX bytes and throw
    return false;
  }
  std::vector<uint8_t> buf(n);
  if (fread(buf.data(), 1, n, f) != size_t(n)) {
    fclose(f);
    return false;
  }
  fclose(f);
  if (n > 3 && buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg(buf.data(), n, out);
  return decode_png(buf.data(), n, out);
}

// ---------------------------------------------------------------------------
// PIL-equivalent convolution resampling (bicubic, a = -0.5, antialiased)
// ---------------------------------------------------------------------------

double cubic(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct FilterRow {
  int first;
  std::vector<float> w;
};

std::vector<FilterRow> build_filter(int in_size, int out_size) {
  const double scale = double(in_size) / out_size;
  const double support = 2.0 * std::max(scale, 1.0);
  std::vector<FilterRow> rows(out_size);
  for (int i = 0; i < out_size; ++i) {
    double center = (i + 0.5) * scale;
    int lo = std::max(int(center - support + 0.5), 0);
    int hi = std::min(int(center + support + 0.5), in_size);
    FilterRow r;
    r.first = lo;
    r.w.resize(hi - lo);
    double sum = 0.0;
    double inv = 1.0 / std::max(scale, 1.0);
    std::vector<double> tmp(hi - lo);
    for (int j = lo; j < hi; ++j) {
      double v = cubic((j - center + 0.5) * inv);
      tmp[j - lo] = v;
      sum += v;
    }
    for (int j = 0; j < hi - lo; ++j)
      r.w[j] = float(sum != 0.0 ? tmp[j] / sum : 0.0);
    rows[i] = std::move(r);
  }
  return rows;
}

inline float clamp01(float v) { return v < 0.f ? 0.f : (v > 1.f ? 1.f : v); }

// resize HWC float image; clamps between passes like PIL's uint8 pipeline
void resize_f32(const std::vector<float>& in, int ih, int iw,
                std::vector<float>& out, int oh, int ow) {
  auto fx = build_filter(iw, ow);
  auto fy = build_filter(ih, oh);
  std::vector<float> tmp(size_t(ih) * ow * 3);
  for (int y = 0; y < ih; ++y) {
    const float* row = &in[size_t(y) * iw * 3];
    float* orow = &tmp[size_t(y) * ow * 3];
    for (int x = 0; x < ow; ++x) {
      const auto& r = fx[x];
      float a0 = 0, a1 = 0, a2 = 0;
      const float* px = row + size_t(r.first) * 3;
      for (size_t k = 0; k < r.w.size(); ++k, px += 3) {
        const float wk = r.w[k];
        a0 += wk * px[0];
        a1 += wk * px[1];
        a2 += wk * px[2];
      }
      orow[x * 3 + 0] = clamp01(a0);
      orow[x * 3 + 1] = clamp01(a1);
      orow[x * 3 + 2] = clamp01(a2);
    }
  }
  out.assign(size_t(oh) * ow * 3, 0.f);
  const size_t row_stride = size_t(ow) * 3;
  for (int y = 0; y < oh; ++y) {
    const auto& r = fy[y];
    float* orow = &out[size_t(y) * row_stride];
    for (size_t k = 0; k < r.w.size(); ++k) {
      const float wk = r.w[k];
      const float* irow = &tmp[(size_t(r.first) + k) * row_stride];
      // contiguous row-wise accumulation: vectorizes cleanly
      for (size_t x = 0; x < row_stride; ++x) orow[x] += wk * irow[x];
    }
    for (size_t x = 0; x < row_stride; ++x) orow[x] = clamp01(orow[x]);
  }
}

// shortest-edge resize + center crop to (size,size), output float [0,1].
// The long edge TRUNCATES (like torchvision Resize / transformers
// get_resize_output_image_size, and data/preprocessing.py) — rounding
// would shift the center crop by 1px on many aspect ratios.
void resize_crop(const ImageU8& img, int size, std::vector<float>& out) {
  int nw, nh;
  if (img.w < img.h) {
    nw = size;
    nh = std::max(int(double(img.h) * size / img.w), size);
  } else {
    nh = size;
    nw = std::max(int(double(img.w) * size / img.h), size);
  }
  std::vector<float> fin(img.data.size());
  for (size_t i = 0; i < img.data.size(); ++i) fin[i] = img.data[i] / 255.0f;
  std::vector<float> resized;
  resize_f32(fin, img.h, img.w, resized, nh, nw);
  int top = (nh - size) / 2, left = (nw - size) / 2;
  out.resize(size_t(size) * size * 3);
  for (int y = 0; y < size; ++y)
    memcpy(&out[size_t(y) * size * 3],
           &resized[((size_t(y) + top) * nw + left) * 3],
           size_t(size) * 3 * sizeof(float));
}

constexpr float kClipMean[3] = {0.48145466f, 0.4578275f, 0.40821073f};
constexpr float kClipStd[3] = {0.26862954f, 0.26130258f, 0.27577711f};

}  // namespace

extern "C" {

// Decode + preprocess a batch of image files.
//   paths: n null-terminated strings
//   out_pixel_values:      n * size * size * 3 floats, [-1, 1]
//   out_pixel_values_clip: n * clip_size * clip_size * 3 floats, CLIP-normed
// Returns the number of successfully loaded images (failures leave zeros).
int pv_load_batch(const char** paths, int n, int size, int clip_size,
                  int num_threads, float* out_pixel_values,
                  float* out_pixel_values_clip) {
  std::atomic<int> ok{0};
  std::atomic<int> next{0};
  auto process_one = [&](int i, float* pv, float* pc) -> bool {
    ImageU8 img;
    if (!decode_file(paths[i], &img)) return false;
    std::vector<float> a, b;
    resize_crop(img, size, a);
    for (size_t j = 0; j < a.size(); ++j)
      pv[j] = std::min(std::max(a[j] * 2.f - 1.f, -1.f), 1.f);
    resize_crop(img, clip_size, b);
    for (size_t j = 0; j < b.size(); ++j) {
      int c = j % 3;
      pc[j] = (std::min(std::max(b[j], 0.f), 1.f) - kClipMean[c]) / kClipStd[c];
    }
    return true;
  };
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      float* pv = out_pixel_values + size_t(i) * size * size * 3;
      float* pc = out_pixel_values_clip + size_t(i) * clip_size * clip_size * 3;
      bool good;
      try {
        good = process_one(i, pv, pc);
      } catch (...) {
        // bad_alloc on a corrupt header declaring absurd dimensions etc. —
        // an exception escaping a std::thread would std::terminate the
        // whole process; count it as a per-file failure instead
        good = false;
      }
      if (good) {
        ok.fetch_add(1);
      } else {
        memset(pv, 0, size_t(size) * size * 3 * sizeof(float));
        memset(pc, 0, size_t(clip_size) * clip_size * 3 * sizeof(float));
      }
    }
  };
  int t = std::max(num_threads, 1);
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return ok.load();
}

// Decode + preprocess a batch of (image, face-mask) pairs — the
// CustomDatasetWithMasks pipeline (reference datasets/custom.py:118-173):
//   pixel_values      <- plain resize/crop/normalize of the image
//   pixel_values_clip <- image resized to the mask's size, background
//                        zeroed where mask == 0, cropped to the mask bbox
//                        expanded by 15% each side and squared, then
//                        CLIP-preprocessed
// Returns the number of successfully loaded pairs (failures leave zeros).
int pv_load_batch_masked(const char** img_paths, const char** mask_paths,
                         int n, int size, int clip_size, int num_threads,
                         float* out_pixel_values,
                         float* out_pixel_values_clip) {
  std::atomic<int> ok{0};
  std::atomic<int> next{0};
  auto process_one = [&](int i, float* pv, float* pc) -> bool {
      ImageU8 img, mask;
      if (!decode_file(img_paths[i], &img) ||
          !decode_file(mask_paths[i], &mask)) {
        return false;
      }
      // VAE branch: same as the unmasked path
      std::vector<float> a;
      resize_crop(img, size, a);
      for (size_t j = 0; j < a.size(); ++j)
        pv[j] = std::min(std::max(a[j] * 2.f - 1.f, -1.f), 1.f);

      // CLIP branch: resize the image to the mask's dimensions (PIL
      // bicubic, the raw_image.resize(raw_mask.size) step)
      const int mh = mask.h, mw = mask.w;
      std::vector<float> fin(size_t(img.h) * img.w * 3);
      for (size_t j = 0; j < fin.size(); ++j) fin[j] = img.data[j] / 255.f;
      std::vector<float> reshaped;
      resize_f32(fin, img.h, img.w, reshaped, mh, mw);

      // zero the background and find the mask bbox (mask uses channel 0 of
      // the RGB-expanded decode — masks are single-channel PNGs)
      int ymin = mh, ymax = -1, xmin = mw, xmax = -1;
      ImageU8 crop_src;
      std::vector<uint8_t> masked(size_t(mh) * mw * 3, 0);
      for (int y = 0; y < mh; ++y) {
        for (int x = 0; x < mw; ++x) {
          uint8_t mv = mask.data[(size_t(y) * mw + x) * 3];
          if (mv != 0) {
            if (y < ymin) ymin = y;
            if (y > ymax) ymax = y;
            if (x < xmin) xmin = x;
            if (x > xmax) xmax = x;
            for (int c = 0; c < 3; ++c) {
              float v = reshaped[(size_t(y) * mw + x) * 3 + c];
              v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
              masked[(size_t(y) * mw + x) * 3 + c] =
                  uint8_t(v * 255.f + 0.5f);
            }
          }
        }
      }
      if (ymax < 0) {
        // empty mask: the sample has no face region to crop — reject it
        // loudly (the Python path raises for the same input,
        // data/preprocessing.py crop_to_mask_and_scale) instead of
        // training on an all-zero conditioning image
        return false;
      }
      // bbox expansion + squaring, matching crop_to_mask_and_scale's
      // integer arithmetic exactly (scale 0.15 each side, then square by
      // extending the shorter axis)
      const double scale = 0.15;
      int height = ymax - ymin;
      int width = xmax - xmin;
      ymin = std::max(0, int(ymin - height * scale));
      ymax = std::min(mh, int(ymax + height * scale));
      xmin = std::max(0, int(xmin - width * scale));
      xmax = std::min(mw, int(xmax + width * scale));
      int crop_w = xmax - xmin;
      int crop_h = ymax - ymin;
      if (crop_w > crop_h) {
        crop_h = crop_w;
        ymax = std::min(mh, ymax + crop_h / 2);
        ymin = std::max(0, ymin - crop_h / 2);
      } else if (crop_h > crop_w) {
        crop_w = crop_h;
        xmax = std::min(mw, xmax + crop_w / 2);
        xmin = std::max(0, xmin - crop_w / 2);
      }
      crop_src.h = ymax - ymin;
      crop_src.w = xmax - xmin;
      crop_src.data.resize(size_t(crop_src.h) * crop_src.w * 3);
      for (int y = 0; y < crop_src.h; ++y)
        memcpy(&crop_src.data[size_t(y) * crop_src.w * 3],
               &masked[((size_t(y) + ymin) * mw + xmin) * 3],
               size_t(crop_src.w) * 3);
      std::vector<float> b;
      resize_crop(crop_src, clip_size, b);
      for (size_t j = 0; j < b.size(); ++j) {
        int c = j % 3;
        pc[j] = (std::min(std::max(b[j], 0.f), 1.f) - kClipMean[c]) / kClipStd[c];
      }
      return true;
  };
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      float* pv = out_pixel_values + size_t(i) * size * size * 3;
      float* pc = out_pixel_values_clip + size_t(i) * clip_size * clip_size * 3;
      bool good;
      try {
        good = process_one(i, pv, pc);
      } catch (...) {  // see pv_load_batch: never let a worker terminate()
        good = false;
      }
      if (good) {
        ok.fetch_add(1);
      } else {
        memset(pv, 0, size_t(size) * size * 3 * sizeof(float));
        memset(pc, 0, size_t(clip_size) * clip_size * 3 * sizeof(float));
      }
    }
  };
  int t = std::max(num_threads, 1);
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return ok.load();
}

// Preprocess a single already-decoded RGB uint8 image (for the masked path,
// where Python computes the mask crop first).
void pv_preprocess_rgb(const uint8_t* rgb, int h, int w, int size,
                       int normalize_mode, float* out) {
  ImageU8 img;
  img.w = w;
  img.h = h;
  img.data.assign(rgb, rgb + size_t(h) * w * 3);
  std::vector<float> a;
  resize_crop(img, size, a);
  if (normalize_mode == 0) {  // [-1, 1]
    for (size_t j = 0; j < a.size(); ++j)
      out[j] = std::min(std::max(a[j] * 2.f - 1.f, -1.f), 1.f);
  } else {  // CLIP
    for (size_t j = 0; j < a.size(); ++j) {
      int c = j % 3;
      out[j] = (std::min(std::max(a[j], 0.f), 1.f) - kClipMean[c]) / kClipStd[c];
    }
  }
}

}  // extern "C"

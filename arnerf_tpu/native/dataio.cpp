// Native batch image loader for the data layer.
//
// The reference loads datasets with a Python per-image loop
// (imageio/cv2 decode + resize, e.g. datasets/nerf.py:51-87) — for a
// 100x800x800 scene that's tens of seconds of single-threaded Python. This
// library decodes PNG/JPEG/EXR in a C++ thread pool, applies the
// reference's alpha conventions (blend-to-white or premultiply,
// color_utils.py:22-41), bilinearly resizes, and writes the flattened
// (n, H*W*C) float32 buffer NumPy consumes zero-copy via ctypes.
//
// Build: arnerf_tpu/native/build.sh  ->  libdataio.so

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

#include <png.h>
#include <jpeglib.h>
#include <csetjmp>

#include <ImfRgbaFile.h>
#include <ImfOutputFile.h>
#include <ImfArray.h>
#include <ImfChannelList.h>

namespace {

struct Image {
  std::vector<float> px;  // H*W*4 RGBA in [0,1] (A=1 when absent)
  int w = 0, h = 0;
  bool has_alpha = false;
  bool ok = false;
};

bool ends_with(const char* s, const char* suf) {
  size_t ls = strlen(s), lf = strlen(suf);
  if (lf > ls) return false;
  for (size_t i = 0; i < lf; i++) {
    char a = s[ls - lf + i], b = suf[i];
    if (a >= 'A' && a <= 'Z') a += 32;
    if (b >= 'A' && b <= 'Z') b += 32;
    if (a != b) return false;
  }
  return true;
}

Image load_png(const char* path) {
  Image im;
  png_image png;
  memset(&png, 0, sizeof(png));
  png.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&png, path)) return im;
  png.format = PNG_FORMAT_RGBA;
  std::vector<uint8_t> buf(PNG_IMAGE_SIZE(png));
  if (!png_image_finish_read(&png, nullptr, buf.data(), 0, nullptr)) {
    png_image_free(&png);
    return im;
  }
  im.w = png.width;
  im.h = png.height;
  im.px.resize((size_t)im.w * im.h * 4);
  for (size_t i = 0; i < im.px.size(); i++) im.px[i] = buf[i] / 255.0f;
  // detect a real alpha channel
  im.has_alpha = false;
  for (size_t i = 3; i < im.px.size(); i += 4)
    if (im.px[i] < 1.0f) { im.has_alpha = true; break; }
  im.ok = true;
  return im;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

Image load_jpeg(const char* path) {
  Image im;
  FILE* f = fopen(path, "rb");
  if (!f) return im;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return im;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  im.w = cinfo.output_width;
  im.h = cinfo.output_height;
  im.px.assign((size_t)im.w * im.h * 4, 1.0f);
  std::vector<uint8_t> row((size_t)im.w * 3);
  for (int y = 0; y < im.h; y++) {
    uint8_t* rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* out = &im.px[(size_t)y * im.w * 4];
    for (int x = 0; x < im.w; x++) {
      out[x * 4 + 0] = row[x * 3 + 0] / 255.0f;
      out[x * 4 + 1] = row[x * 3 + 1] / 255.0f;
      out[x * 4 + 2] = row[x * 3 + 2] / 255.0f;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  im.ok = true;
  return im;
}

Image load_exr(const char* path) {
  Image im;
  try {
    Imf::RgbaInputFile file(path);
    Imath::Box2i dw = file.dataWindow();
    im.w = dw.max.x - dw.min.x + 1;
    im.h = dw.max.y - dw.min.y + 1;
    Imf::Array2D<Imf::Rgba> pixels(im.h, im.w);
    file.setFrameBuffer(&pixels[0][0] - dw.min.x - dw.min.y * im.w, 1,
                        im.w);
    file.readPixels(dw.min.y, dw.max.y);
    im.px.resize((size_t)im.w * im.h * 4);
    im.has_alpha = file.header().channels().findChannel("A") != nullptr;
    for (int y = 0; y < im.h; y++)
      for (int x = 0; x < im.w; x++) {
        const Imf::Rgba& p = pixels[y][x];
        float* o = &im.px[((size_t)y * im.w + x) * 4];
        o[0] = p.r;
        o[1] = p.g;
        o[2] = p.b;
        o[3] = im.has_alpha ? (float)p.a : 1.0f;
      }
    im.ok = true;
  } catch (...) {
  }
  return im;
}

// bilinear resize RGBA -> (out_h, out_w), cv2-compatible half-pixel centers
void resize_rgba(const Image& im, int out_w, int out_h,
                 std::vector<float>& out) {
  out.resize((size_t)out_w * out_h * 4);
  const float sx = (float)im.w / out_w, sy = (float)im.h / out_h;
  for (int y = 0; y < out_h; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)floorf(fy);
    float wy = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= im.h ? im.h - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= im.h ? im.h - 1 : y0 + 1);
    for (int x = 0; x < out_w; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)floorf(fx);
      float wx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= im.w ? im.w - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= im.w ? im.w - 1 : x0 + 1);
      const float* p00 = &im.px[((size_t)y0c * im.w + x0c) * 4];
      const float* p01 = &im.px[((size_t)y0c * im.w + x1c) * 4];
      const float* p10 = &im.px[((size_t)y1c * im.w + x0c) * 4];
      const float* p11 = &im.px[((size_t)y1c * im.w + x1c) * 4];
      float* o = &out[((size_t)y * out_w + x) * 4];
      for (int c = 0; c < 4; c++)
        o[c] = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
               wy * ((1 - wx) * p10[c] + wx * p11[c]);
    }
  }
}

}  // namespace

extern "C" {

// Decode n images into out (n, out_h*out_w*3) float32.
// blend_mode: 0 = premultiply (rgb*a), 1 = blend to white (rgb*a + 1-a)
// returns number of failed images (their slots are zero-filled).
int dataio_load_images(const char** paths, int n, int out_w, int out_h,
                       int blend_mode, float* out, int n_threads) {
  std::atomic<int> next(0), failed(0);
  const size_t stride = (size_t)out_w * out_h * 3;
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  auto worker = [&]() {
    std::vector<float> resized;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      Image im;
      const char* p = paths[i];
      if (ends_with(p, ".png")) im = load_png(p);
      else if (ends_with(p, ".jpg") || ends_with(p, ".jpeg"))
        im = load_jpeg(p);
      else if (ends_with(p, ".exr")) im = load_exr(p);
      float* dst = out + stride * i;
      if (!im.ok) {
        memset(dst, 0, stride * sizeof(float));
        failed.fetch_add(1);
        continue;
      }
      // blend alpha BEFORE resizing (reference order: color_utils.py:32-38)
      if (im.has_alpha) {
        for (size_t j = 0; j < (size_t)im.w * im.h; j++) {
          float* s = &im.px[j * 4];
          float a = s[3];
          float add = blend_mode == 1 ? (1.0f - a) : 0.0f;
          s[0] = s[0] * a + add;
          s[1] = s[1] * a + add;
          s[2] = s[2] * a + add;
          s[3] = 1.0f;
        }
      }
      resize_rgba(im, out_w, out_h, resized);
      for (size_t j = 0; j < (size_t)out_w * out_h; j++) {
        const float* s = &resized[j * 4];
        dst[j * 3 + 0] = s[0];
        dst[j * 3 + 1] = s[1];
        dst[j * 3 + 2] = s[2];
      }
    }
  };
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads; t++) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
  return failed.load();
}

// Write an RGB float image as a half-float EXR (cv2 in this image lacks
// EXR write support; the insert pipeline needs it for HDR results).
int dataio_write_exr(const char* path, int w, int h, const float* rgb) {
  try {
    Imf::Array2D<Imf::Rgba> px(h, w);
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++) {
        const float* s = rgb + ((size_t)y * w + x) * 3;
        px[y][x] = Imf::Rgba(s[0], s[1], s[2], 1.0f);
      }
    Imf::RgbaOutputFile file(path, w, h, Imf::WRITE_RGB);
    file.setFrameBuffer(&px[0][0], 1, w);
    file.writePixels(h);
    return 0;
  } catch (...) {
    return 1;
  }
}

}  // extern "C"

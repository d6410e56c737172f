// Native image batch loader — the host-side IO tier feeding the TPU.
//
// Decodes JPEG (libjpeg) / PNG (libpng simplified API), bilinear-resizes to
// SxS RGB and writes [-1, 1]-normalized float32 NHWC into a caller-provided
// contiguous batch buffer, fanning files out over a thread pool. Replaces
// the reference's single-threaded PIL + torchvision transform path
// (datasets/data_utils.py) for throughput-critical precompute runs.
//
// C ABI (ctypes):
//   int asyrp_decode_resize_batch(const char** paths, int n, int size,
//                                 float* out, int n_threads,
//                                 uint8_t* status);
//     status[i] (optional, may be null) is set to 1 when paths[i] FAILED
//     to decode (that row of `out` is untouched) and 0 on success;
//     returns the number of failed files (0 == all decoded).
//
// Build: g++ -O3 -march=native -shared -fPIC imgloader.cpp -ljpeg -lpng
//        -o libasyrpimg.so

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
  std::vector<uint8_t> rgb;  // HWC, 3 channels
  int w = 0, h = 0;
};

// ---------------------------------------------------------------- JPEG ----
struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(FILE* f, Image* img) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img->w = cinfo.output_width;
  img->h = cinfo.output_height;
  img->rgb.resize(size_t(img->w) * img->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img->rgb.data() + size_t(cinfo.output_scanline) * img->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------- PNG ----
bool decode_png(const char* path, Image* img) {
  png_image pimg;
  std::memset(&pimg, 0, sizeof(pimg));
  pimg.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&pimg, path)) return false;
  // Read RGBA and DROP alpha — matching PIL's convert("RGB") semantics
  // (requesting PNG_FORMAT_RGB would composite alpha onto the background,
  // diverging from the PIL fallback path on transparent images).
  pimg.format = PNG_FORMAT_RGBA;
  img->w = pimg.width;
  img->h = pimg.height;
  std::vector<uint8_t> rgba(PNG_IMAGE_SIZE(pimg));
  if (!png_image_finish_read(&pimg, nullptr, rgba.data(), 0, nullptr)) {
    png_image_free(&pimg);
    return false;
  }
  img->rgb.resize(size_t(img->w) * img->h * 3);
  const size_t n = size_t(img->w) * img->h;
  for (size_t i = 0; i < n; ++i) {
    img->rgb[i * 3 + 0] = rgba[i * 4 + 0];
    img->rgb[i * 3 + 1] = rgba[i * 4 + 1];
    img->rgb[i * 3 + 2] = rgba[i * 4 + 2];
  }
  return true;
}

bool decode_any(const char* path, Image* img) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = std::fread(magic, 1, 8, f);
  std::rewind(f);
  bool ok = false;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, img);
    std::fclose(f);
  } else if (got >= 4 && magic[0] == 0x89 && magic[1] == 'P') {
    std::fclose(f);
    ok = decode_png(path, img);
  } else {
    std::fclose(f);
  }
  return ok && img->w > 0 && img->h > 0;
}

// ------------------------------------------------------------- resize ----
// Antialiased bilinear (triangle filter with support scaled by the
// downsampling factor) — matches PIL's Image.resize(BILINEAR) convention
// used by the reference's torchvision transforms.
struct FilterTaps {
  std::vector<int> xmin, count;   // per output coord
  std::vector<float> weights;     // flattened, kmax per coord
  int kmax = 0;
};

FilterTaps make_taps(int in, int out) {
  FilterTaps t;
  const double scale = double(in) / out;
  const double fscale = scale > 1.0 ? scale : 1.0;
  const double support = 1.0 * fscale;  // bilinear support = 1
  t.kmax = int(std::ptrdiff_t(2 * support + 2));
  t.xmin.resize(out);
  t.count.resize(out);
  t.weights.assign(size_t(out) * t.kmax, 0.0f);
  for (int x = 0; x < out; ++x) {
    double center = (x + 0.5) * scale;
    int lo = int(center - support + 0.5);
    if (lo < 0) lo = 0;
    int hi = int(center + support + 0.5);
    if (hi > in) hi = in;
    double total = 0.0;
    int k = 0;
    for (int i = lo; i < hi; ++i, ++k) {
      double d = (i + 0.5 - center) / fscale;
      double w = d < 0 ? 1.0 + d : 1.0 - d;
      if (w < 0) w = 0;
      t.weights[size_t(x) * t.kmax + k] = float(w);
      total += w;
    }
    if (total > 0)
      for (int j = 0; j < k; ++j)
        t.weights[size_t(x) * t.kmax + j] /= float(total);
    t.xmin[x] = lo;
    t.count[x] = k;
  }
  return t;
}

void resize_normalize(const Image& img, int size, float* out) {
  FilterTaps tx = make_taps(img.w, size);
  FilterTaps ty = make_taps(img.h, size);
  // horizontal pass: [h, size, 3] float
  std::vector<float> tmp(size_t(img.h) * size * 3);
  for (int y = 0; y < img.h; ++y) {
    const uint8_t* row = img.rgb.data() + size_t(y) * img.w * 3;
    float* trow = tmp.data() + size_t(y) * size * 3;
    for (int x = 0; x < size; ++x) {
      float acc[3] = {0, 0, 0};
      const float* w = &tx.weights[size_t(x) * tx.kmax];
      const uint8_t* src = row + size_t(tx.xmin[x]) * 3;
      for (int k = 0; k < tx.count[x]; ++k) {
        acc[0] += w[k] * src[k * 3 + 0];
        acc[1] += w[k] * src[k * 3 + 1];
        acc[2] += w[k] * src[k * 3 + 2];
      }
      trow[x * 3 + 0] = acc[0];
      trow[x * 3 + 1] = acc[1];
      trow[x * 3 + 2] = acc[2];
    }
  }
  // vertical pass + normalize
  for (int y = 0; y < size; ++y) {
    float* dst = out + size_t(y) * size * 3;
    const float* w = &ty.weights[size_t(y) * ty.kmax];
    for (int x = 0; x < size * 3; ++x) {
      float acc = 0;
      const float* col = tmp.data() + size_t(ty.xmin[y]) * size * 3 + x;
      for (int k = 0; k < ty.count[y]; ++k)
        acc += w[k] * col[size_t(k) * size * 3];
      dst[x] = acc / 127.5f - 1.0f;
    }
  }
}

}  // namespace

extern "C" int asyrp_decode_resize_batch(const char** paths, int n, int size,
                                         float* out, int n_threads,
                                         uint8_t* status /* may be null */) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> n_failed(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Image img;
      if (!decode_any(paths[i], &img)) {
        // keep going: record per-item status so the caller can repair
        // EXACTLY the failed files (multiple failures are not masked)
        if (status) status[i] = 1;
        n_failed.fetch_add(1);
        continue;
      }
      if (status) status[i] = 0;
      resize_normalize(img, size, out + size_t(i) * size * size * 3);
    }
  };
  std::vector<std::thread> pool;
  int nt = n_threads < n ? n_threads : n;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return n_failed.load();
}

// gcdata — native data-loading backend for gan_control_tpu.
//
// Role: the runtime replacement for the reference's torch-DataLoader worker
// pool (datasets/ffhq_dataset.py 'workers': 32): JPEG/PNG decode (sniffed by
// magic bytes — FFHQ/MetFaces ship PNGs, AFHQ JPEGs) + optional
// random-resized-crop + bilinear resize + horizontal flip + [-1,1]
// normalization, multithreaded in C++, producing ready NHWC float32 batches
// the Python side hands straight to jax.device_put.
//
// Exposed C ABI (consumed via ctypes from
// gan_control_tpu/data/native_loader.py):
//   gc_loader_create(paths, n_paths, size, batch, workers, seed,
//                    hflip, rrc_p)            -> handle
//   gc_loader_next(handle, float* out)        -> 0 on success
//   gc_loader_destroy(handle)
//   gc_decode_one(path, size, float* out)     -> 0 on success (test hook)

#include <cstddef>
#include <cstdio>
#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode an already-open JPEG stream (positioned at offset 0) to RGB8.
// Returns false on failure; the caller owns/closes `f`.
bool decode_jpeg(FILE* f, std::vector<uint8_t>* rgb, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // corrupt/crafted headers can claim up to 65500x65500 (12.9 GB): bound
  // before allocating instead of letting bad_alloc escape the worker
  if (cinfo.image_width == 0 || cinfo.image_height == 0 ||
      size_t(cinfo.image_width) * cinfo.image_height > 100u * 1000 * 1000) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb->resize(size_t(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  // libjpeg turns a mid-file EOF into a WARNING plus a fake EOI and
  // returns "success" with the tail gray-filled — treat any warning as a
  // decode failure (the PIL fallback raises on the same file)
  const bool clean = jerr.pub.num_warnings == 0;
  jpeg_destroy_decompress(&cinfo);
  return clean;
}

// Decode an already-open PNG stream (positioned at offset 0) to RGB8
// (palette/gray/alpha/16-bit all normalized to 8-bit RGB). Returns false
// on failure; the caller owns/closes `f`.
bool decode_png(FILE* f, std::vector<uint8_t>* rgb, int* w, int* h) {
  // declared BEFORE setjmp: longjmp must not jump over the construction of
  // locals with non-trivial destructors (UB + leak on corrupt files)
  std::vector<png_bytep> rows;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  const png_uint_32 width = png_get_image_width(png, info);
  const png_uint_32 height = png_get_image_height(png, info);
  const int color = png_get_color_type(png, info);
  const int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  if (png_get_rowbytes(png, info) != size_t(width) * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  if (width == 0 || height == 0 ||
      size_t(width) * height > 100u * 1000 * 1000) {
    // a crafted IHDR within libpng's default 1M-px-side limit could claim
    // terabytes: bound before allocating (bad_alloc would bypass
    // png_destroy_read_struct and kill the worker thread -> process)
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  *w = int(width);
  *h = int(height);
  rgb->resize(size_t(width) * height * 3);
  rows.resize(height);
  for (png_uint_32 y = 0; y < height; ++y)
    rows[y] = rgb->data() + size_t(y) * width * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// Magic-byte dispatch: PNG signature vs JPEG SOI. One open per image —
// sniff 8 bytes, rewind, hand the same stream to the decoder.
bool decode_image(const std::string& path, std::vector<uint8_t>* rgb, int* w,
                  int* h) {
  static const uint8_t png_sig[8] = {0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a,
                                     0x0a};
  uint8_t head[8] = {0};
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  size_t n = fread(head, 1, sizeof(head), f);
  rewind(f);
  bool ok = false;
  if (n >= 8 && std::memcmp(head, png_sig, 8) == 0)
    ok = decode_png(f, rgb, w, h);
  else if (n >= 2 && head[0] == 0xFF && head[1] == 0xD8)
    ok = decode_jpeg(f, rgb, w, h);
  fclose(f);
  return ok;
}

// Bilinear resample the rect [sx0,sy0,sw,sh] of src (w x h RGB8) to an
// out_size x out_size float32 HWC image in [-1,1]; optional mirror.
void resize_normalize(const uint8_t* src, int w, int h, int sx0, int sy0,
                      int sw, int sh, int out_size, bool mirror, float* out) {
  const float sx_step = float(sw) / out_size;
  const float sy_step = float(sh) / out_size;
  for (int oy = 0; oy < out_size; ++oy) {
    float fy = sy0 + (oy + 0.5f) * sy_step - 0.5f;
    fy = std::min(std::max(fy, 0.0f), float(h - 1));
    int y0 = int(fy);
    int y1 = std::min(y0 + 1, h - 1);
    float wy = fy - y0;
    for (int ox = 0; ox < out_size; ++ox) {
      int ox_dst = mirror ? (out_size - 1 - ox) : ox;
      float fx = sx0 + (ox + 0.5f) * sx_step - 0.5f;
      fx = std::min(std::max(fx, 0.0f), float(w - 1));
      int x0 = int(fx);
      int x1 = std::min(x0 + 1, w - 1);
      float wx = fx - x0;
      float* dst = out + (size_t(oy) * out_size + ox_dst) * 3;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(size_t(y0) * w + x0) * 3 + c];
        float v01 = src[(size_t(y0) * w + x1) * 3 + c];
        float v10 = src[(size_t(y1) * w + x0) * 3 + c];
        float v11 = src[(size_t(y1) * w + x1) * 3 + c];
        float v = v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy) +
                  v10 * (1 - wx) * wy + v11 * wx * wy;
        dst[c] = v / 127.5f - 1.0f;
      }
    }
  }
}

struct Batch {
  std::vector<float> buf;
  // zero-filled slots in THIS batch (decode failed after all retries); the
  // consumer gets this per-batch via gc_loader_next2 so failures are
  // attributed to the batch they actually corrupted, not smeared across
  // whatever is in flight
  long failed = 0;
};

struct Loader {
  std::vector<std::string> paths;
  int size = 0;
  int batch = 0;
  float rrc_p = 0.0f;
  bool hflip = true;

  std::vector<std::thread> threads;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::queue<Batch> ready;
  size_t max_ready = 4;
  std::atomic<bool> stop{false};
  // running total across all batches (observability; per-batch abort
  // decisions use Batch::failed from gc_loader_next2)
  std::atomic<long> failed_slots{0};
  uint64_t seed = 0;

  void worker(int tid) {
    std::mt19937_64 rng(seed + 0x9e3779b97f4a7c15ULL * (tid + 1));
    std::uniform_real_distribution<float> uni(0.0f, 1.0f);
    const size_t img_floats = size_t(size) * size * 3;
    std::vector<uint8_t> rgb;
    // per-worker epoch permutation (no replacement within an epoch — the
    // torch DataLoader shuffle semantics the Python fallback also keeps;
    // batches may span an epoch boundary so datasets smaller than batch
    // still stream)
    std::vector<size_t> perm(paths.size());
    for (size_t i = 0; i < perm.size(); ++i) perm[i] = i;
    std::shuffle(perm.begin(), perm.end(), rng);
    size_t cursor = 0;
    while (!stop.load()) {
      Batch out;
      out.buf.assign(img_floats * batch, 0.0f);
      for (int b = 0; b < batch; ++b) {
        bool filled = false;
        for (int attempt = 0; attempt < 16; ++attempt) {
          if (cursor == perm.size()) {
            std::shuffle(perm.begin(), perm.end(), rng);
            cursor = 0;
          }
          const std::string& p = paths[perm[cursor++]];
          int w, h;
          if (!decode_image(p, &rgb, &w, &h)) continue;
          int sx0 = 0, sy0 = 0, sw = w, sh = h;
          if (rrc_p > 0 && uni(rng) < rrc_p) {
            // torchvision RandomResizedCrop(scale=(0.8,1.0),
            // ratio=(0.9,1.1)): AREA fraction uniform, aspect log-uniform,
            // 10 attempts then center-crop fallback; offsets inclusive
            bool cropped = false;
            for (int tryi = 0; tryi < 10; ++tryi) {
              float target_area = float(w) * h * (0.8f + 0.2f * uni(rng));
              float aspect = std::exp(std::log(0.9f) +
                                      (std::log(1.1f) - std::log(0.9f)) *
                                          uni(rng));
              int cw = int(std::lround(std::sqrt(target_area * aspect)));
              int ch = int(std::lround(std::sqrt(target_area / aspect)));
              if (cw > 0 && ch > 0 && cw <= w && ch <= h) {
                sw = cw;
                sh = ch;
                sx0 = int(rng() % uint64_t(w - cw + 1));
                sy0 = int(rng() % uint64_t(h - ch + 1));
                cropped = true;
                break;
              }
            }
            if (!cropped) {
              int side = std::min(w, h);
              sw = sh = side;
              sx0 = (w - side) / 2;
              sy0 = (h - side) / 2;
            }
          }
          bool mirror = hflip && uni(rng) < 0.5f;
          resize_normalize(rgb.data(), w, h, sx0, sy0, sw, sh, size, mirror,
                           out.buf.data() + img_floats * b);
          filled = true;
          break;
        }
        if (!filled) {
          out.failed++;
          failed_slots.fetch_add(1);
        }
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] { return ready.size() < max_ready || stop.load(); });
      if (stop.load()) return;
      ready.push(std::move(out));
      cv_ready.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* gc_loader_create(const char** paths, int n_paths, int size, int batch,
                       int workers, uint64_t seed, int hflip, float rrc_p) {
  if (n_paths <= 0 || size <= 0 || batch <= 0) return nullptr;
  auto* ld = new Loader();
  ld->paths.assign(paths, paths + n_paths);
  ld->size = size;
  ld->batch = batch;
  ld->seed = seed;
  ld->hflip = hflip != 0;
  ld->rrc_p = rrc_p;
  int n_threads = std::max(1, workers);
  for (int t = 0; t < n_threads; ++t)
    ld->threads.emplace_back(&Loader::worker, ld, t);
  return ld;
}

// Pop one ready batch; *failed_out (nullable) receives the count of
// zero-filled slots in THIS batch.
int gc_loader_next2(void* handle, float* out, long* failed_out) {
  auto* ld = static_cast<Loader*>(handle);
  Batch b;
  {
    std::unique_lock<std::mutex> lk(ld->mu);
    ld->cv_ready.wait(lk, [&] { return !ld->ready.empty() || ld->stop.load(); });
    if (ld->stop.load()) return 1;
    b = std::move(ld->ready.front());
    ld->ready.pop();
    ld->cv_space.notify_one();
  }
  std::memcpy(out, b.buf.data(), b.buf.size() * sizeof(float));
  if (failed_out) *failed_out = b.failed;
  return 0;
}

int gc_loader_next(void* handle, float* out) {
  return gc_loader_next2(handle, out, nullptr);
}

void gc_loader_destroy(void* handle) {
  auto* ld = static_cast<Loader*>(handle);
  {
    // stop must be published UNDER the mutex: a worker that just evaluated
    // its wait predicate (while holding mu) but has not blocked yet would
    // otherwise miss the notify forever (lost wakeup) and join() would hang
    std::lock_guard<std::mutex> lk(ld->mu);
    ld->stop.store(true);
  }
  ld->cv_ready.notify_all();
  ld->cv_space.notify_all();
  for (auto& t : ld->threads) t.join();
  delete ld;
}

// Bumped whenever the ABI or decode capabilities change (2 = PNG support +
// failure accounting; 3 = per-batch failed counts via gc_loader_next2).
// The Python bridge refuses a stale .so lacking this symbol / an older
// value, forcing `make -C native` instead of silently degraded behavior.
long gc_abi_version() { return 3; }

long gc_loader_failed_slots(void* handle) {
  return static_cast<Loader*>(handle)->failed_slots.load();
}

int gc_decode_one(const char* path, int size, float* out) {
  std::vector<uint8_t> rgb;
  int w, h;
  if (!decode_image(path, &rgb, &w, &h)) return 1;
  resize_normalize(rgb.data(), w, h, 0, 0, w, h, size, false, out);
  return 0;
}

}  // extern "C"

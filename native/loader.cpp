// tpuslam native dataset loader: libpng grayscale decode + threaded
// prefetch ring.
//
// Role parity: the reference's dataset mains decode frames with
// cv::imread on the tracking thread (/root/reference/Examples/Monocular/
// mono_euroc.cc:124-132 LoadImages + the per-frame imread in the main
// loop) — on a TPU host that decode must instead overlap device compute,
// or a ~2-4 ms/frame PNG decode eats straight into the 10 ms/frame
// budget. This is the IO half of the runtime done natively: N worker
// threads decode ahead of the consumer into a bounded ring of
// pre-allocated float32 frames (grayscale, [0,255], the tracker's input
// convention — see tpuslam/datasets/euroc.py).
//
// C ABI (consumed by tpuslam/datasets/native_loader.py via ctypes):
//   tsl_open(paths, n, w, h, workers, depth) -> handle
//   tsl_next(handle, out_float32, idx)       -> 0 ok / <0 error
//   tsl_close(handle)
//
// Frames are delivered IN ORDER (SLAM is sequential); workers claim
// indices from an atomic counter and park results in the ring slot
// index % depth, so decode order can race ahead while delivery stays
// ordered — the same bounded producer/consumer the reference gets
// implicitly from its System thread pipeline.
//
// Build: make -C native  (g++ -O2 -shared -fPIC loader.cpp -lpng -lz)

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Slot {
  std::vector<float> pix;
  std::atomic<long> ready_idx{-1};  // which frame index currently parked
};

struct Loader {
  std::vector<std::string> paths;
  int w = 0, h = 0, depth = 0;
  std::vector<Slot> ring;
  std::atomic<long> next_claim{0};   // next frame index a worker grabs
  std::atomic<long> consumed{-1};    // highest frame index handed out
  std::atomic<bool> stop{false};
  std::atomic<int> error{0};
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready;   // a slot became ready
  std::condition_variable cv_space;   // a slot was consumed
};

// Minimal libpng grayscale decode into a pre-sized float buffer.
// Any bit depth / color type is folded to 8-bit gray (strip-16 +
// rgb_to_gray), matching PIL's convert("L") in the Python fallback.
int decode_png(const char* path, float* out, int w, int h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -2;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return -3;
  }
  if (setjmp(png_jmpbuf(png))) {  // libpng error path
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return -4;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 pw = png_get_image_width(png, info);
  png_uint_32 ph = png_get_image_height(png, info);
  if ((int)pw != w || (int)ph != h) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return -5;
  }
  int color = png_get_color_type(png, info);
  if (png_get_bit_depth(png, info) == 16) png_set_strip_16(png);
  if (color & PNG_COLOR_MASK_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && png_get_bit_depth(png, info) < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (color & PNG_COLOR_MASK_COLOR)
    png_set_rgb_to_gray(png, 1, -1, -1);  // ITU-R 709-ish default weights
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  std::vector<uint8_t> row(w);
  for (int y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out + (size_t)y * w;
    for (int x = 0; x < w; ++x) dst[x] = (float)row[x];
  }
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(f);
  return 0;
}

void worker_main(Loader* L) {
  const long n = (long)L->paths.size();
  while (!L->stop.load(std::memory_order_acquire)) {
    long idx = L->next_claim.fetch_add(1, std::memory_order_relaxed);
    if (idx >= n) return;
    Slot& slot = L->ring[idx % L->depth];
    // Wait until the slot's previous occupant (idx - depth) is consumed.
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_space.wait(lk, [&] {
        return L->stop.load() ||
               L->consumed.load(std::memory_order_acquire) >= idx - L->depth;
      });
      if (L->stop.load()) return;
    }
    int rc = decode_png(L->paths[idx].c_str(), slot.pix.data(), L->w, L->h);
    if (rc != 0) L->error.store(rc, std::memory_order_release);
    {
      std::lock_guard<std::mutex> lk(L->mu);
      slot.ready_idx.store(idx, std::memory_order_release);
    }
    L->cv_ready.notify_all();
  }
}

}  // namespace

extern "C" {

void* tsl_open(const char** paths, long n, int w, int h, int workers,
               int depth) {
  if (n <= 0 || w <= 0 || h <= 0) return nullptr;
  Loader* L = new Loader();
  L->paths.assign(paths, paths + n);
  L->w = w;
  L->h = h;
  L->depth = depth > 0 ? depth : 8;
  L->ring = std::vector<Slot>(L->depth);
  for (auto& s : L->ring) s.pix.resize((size_t)w * h);
  int nw = workers > 0 ? workers : 2;
  for (int i = 0; i < nw; ++i) L->workers.emplace_back(worker_main, L);
  return L;
}

// Blocking ordered delivery of frame `idx` (must be called with
// idx = 0, 1, 2, ... — the SLAM consumption order).
int tsl_next(void* handle, float* out, long idx) {
  Loader* L = (Loader*)handle;
  if (!L) return -1;
  Slot& slot = L->ring[idx % L->depth];
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_ready.wait(lk, [&] {
      return L->stop.load() ||
             slot.ready_idx.load(std::memory_order_acquire) == idx;
    });
    if (L->stop.load()) return -6;
  }
  int err = L->error.load(std::memory_order_acquire);
  if (err != 0) return err;
  std::memcpy(out, slot.pix.data(), sizeof(float) * (size_t)L->w * L->h);
  L->consumed.store(idx, std::memory_order_release);
  L->cv_space.notify_all();
  return 0;
}

void tsl_close(void* handle) {
  Loader* L = (Loader*)handle;
  if (!L) return;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop.store(true, std::memory_order_release);
  }
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"

// Native prefetching TUM RGB-D dataset loader.
//
// The runtime's data-ingest component, in C++ like the reference's IO
// layer (the reference decodes synchronously on the tracking thread via
// cv::imread, perfect/Examples/RGB-D/rgbd_tum.cc:75-96; at 30 Hz the
// PNG decode alone can eat a large share of the frame budget). This
// loader parses the association file, then a pool of worker threads
// decodes frames AHEAD of the consumer into a bounded in-order ring
// buffer, so the SLAM loop's frame fetch is a buffer copy.
//
// PNG decode via libpng: 8-bit RGB/gray color images and 16-bit
// grayscale depth (TUM format), depth returned raw (uint16 sensor
// units; the Python side scales by 1/DepthMapFactor or feeds uint16
// millimeters straight to the device).
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  double stamp = 0.0;
  int width = 0, height = 0;
  std::vector<uint8_t> rgb;     // H*W*3
  std::vector<uint16_t> depth;  // H*W
  bool ok = false;
};

bool read_png_rgb8(const std::string& path, std::vector<uint8_t>& out, int& w,
                   int& h) {
  FILE* fp = std::fopen(path.c_str(), "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  w = png_get_image_width(png, info);
  h = png_get_image_height(png, info);
  // Normalize anything to 8-bit RGB.
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out.resize(static_cast<size_t>(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = out.data() + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

bool read_png_gray16(const std::string& path, std::vector<uint16_t>& out, int& w,
                     int& h) {
  FILE* fp = std::fopen(path.c_str(), "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  w = png_get_image_width(png, info);
  h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (color != PNG_COLOR_TYPE_GRAY) {
    // Unexpected for TUM depth; refuse rather than silently convert.
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  if (depth < 16) png_set_expand_gray_1_2_4_to_8(png);
#if __BYTE_ORDER__ == __ORDER_LITTLE_ENDIAN__
  if (depth == 16) png_set_swap(png);  // PNG is big-endian
#endif
  png_read_update_info(png, info);
  out.resize(static_cast<size_t>(w) * h);
  std::vector<png_bytep> rows(h);
  if (depth == 16) {
    for (int y = 0; y < h; ++y)
      rows[y] = reinterpret_cast<png_bytep>(out.data() + static_cast<size_t>(y) * w);
    png_read_image(png, rows.data());
  } else {
    std::vector<uint8_t> tmp(static_cast<size_t>(w) * h);
    for (int y = 0; y < h; ++y) rows[y] = tmp.data() + static_cast<size_t>(y) * w;
    png_read_image(png, rows.data());
    for (size_t i = 0; i < tmp.size(); ++i) out[i] = tmp[i];
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

struct Loader {
  std::string root;
  std::vector<double> stamps;
  std::vector<std::string> rgb_files, depth_files;

  // In-order bounded prefetch ring.
  size_t capacity = 16;
  std::vector<Frame> slots;
  std::vector<int> slot_state;  // 0 empty, 1 decoding, 2 ready
  std::atomic<size_t> next_to_decode{0};
  size_t next_to_consume = 0;
  std::mutex mu;
  std::condition_variable cv_ready, cv_free;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  void worker() {
    for (;;) {
      size_t i = next_to_decode.fetch_add(1);
      if (i >= stamps.size() || stop.load()) return;
      size_t slot = i % capacity;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_free.wait(lk, [&] {
          return stop.load() || (slot_state[slot] == 0 && i < next_to_consume + capacity);
        });
        if (stop.load()) return;
        slot_state[slot] = 1;
      }
      Frame& f = slots[slot];
      f.stamp = stamps[i];
      int w1 = 0, h1 = 0, w2 = 0, h2 = 0;
      bool ok1 = read_png_rgb8(root + "/" + rgb_files[i], f.rgb, w1, h1);
      bool ok2 = read_png_gray16(root + "/" + depth_files[i], f.depth, w2, h2);
      f.width = w1;
      f.height = h1;
      f.ok = ok1 && ok2 && w1 == w2 && h1 == h2;
      {
        std::lock_guard<std::mutex> lk(mu);
        slot_state[slot] = 2;
      }
      cv_ready.notify_all();
    }
  }
};

bool parse_association(const std::string& path, Loader& L) {
  std::ifstream in(path);
  if (!in) return false;
  std::string line;
  while (std::getline(in, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    double t1, t2;
    std::string f1, f2;
    if (ss >> t1 >> f1 >> t2 >> f2) {
      L.stamps.push_back(t1);
      L.rgb_files.push_back(f1);
      L.depth_files.push_back(f2);
    }
  }
  return !L.stamps.empty();
}

}  // namespace

extern "C" {

void* tum_loader_open(const char* root, const char* assoc, int n_workers,
                      int prefetch) {
  auto* L = new Loader();
  L->root = root;
  if (!parse_association(assoc, *L)) {
    delete L;
    return nullptr;
  }
  L->capacity = prefetch > 0 ? static_cast<size_t>(prefetch) : 16;
  L->slots.resize(L->capacity);
  L->slot_state.assign(L->capacity, 0);
  int n = n_workers > 0 ? n_workers : 2;
  for (int i = 0; i < n; ++i) L->workers.emplace_back(&Loader::worker, L);
  return L;
}

long tum_loader_size(void* h) {
  return static_cast<Loader*>(h)->stamps.size();
}

// Returns 1 on success, 0 on decode failure, -1 past the end.
// rgb must hold w*h*3 bytes, depth w*h uint16.
int tum_loader_next(void* h, uint8_t* rgb, uint16_t* depth, double* stamp,
                    int* width, int* height) {
  auto* L = static_cast<Loader*>(h);
  size_t i = L->next_to_consume;
  if (i >= L->stamps.size()) return -1;
  size_t slot = i % L->capacity;
  Frame* f;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_ready.wait(lk, [&] { return L->slot_state[slot] == 2; });
    f = &L->slots[slot];
  }
  int ok = f->ok ? 1 : 0;
  *stamp = f->stamp;
  *width = f->width;
  *height = f->height;
  if (f->ok) {
    std::memcpy(rgb, f->rgb.data(), f->rgb.size());
    std::memcpy(depth, f->depth.data(), f->depth.size() * sizeof(uint16_t));
  }
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->slot_state[slot] = 0;
    L->next_to_consume = i + 1;
  }
  L->cv_free.notify_all();
  return ok;
}

void tum_loader_close(void* h) {
  auto* L = static_cast<Loader*>(h);
  L->stop.store(true);
  L->cv_free.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"

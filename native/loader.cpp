// Threaded PCD dataset loader.
//
// The registration CLI re-loads a whole dataset of multi-MB .pcd files
// before phase 1 (reference: main.cpp:79-83 loads N files sequentially
// through pcl::io::loadPCDFile). This native loader parses and unpacks
// the framework's standard layout (FIELDS x y z rgb, TYPE F F F F,
// ascii / binary / binary_compressed) with one worker thread per file,
// writing straight into caller-provided padded buffers — the Python
// reader (rspc_tpu/io/pcd.py) remains the general-format fallback.
//
// Returns per-file point counts; a file the fast path cannot handle
// (different fields/types, malformed header) reports -1 and the caller
// falls back to the Python reader for that file only.

#include <atomic>
#include <cmath>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" uint64_t rspc_lzf_decompress(const uint8_t* in, uint64_t in_len,
                                        uint8_t* out, uint64_t out_cap);

namespace {

struct Header {
  long width = 0, height = 0, points = -1;
  std::string data;          // ascii | binary | binary_compressed
  bool layout_ok = false;    // FIELDS x y z rgb, SIZE 4x4, TYPE F F F F
  size_t body_off = 0;
};

bool parse_header(const std::string& buf, Header* h) {
  size_t pos = 0;
  bool fields_ok = false, size_ok = false, type_ok = false, count_ok = true;
  while (pos < buf.size()) {
    size_t eol = buf.find('\n', pos);
    if (eol == std::string::npos) return false;
    std::string line = buf.substr(pos, eol - pos);
    pos = eol + 1;
    if (!line.empty() && line[0] == '#') continue;
    size_t sp = line.find(' ');
    std::string key = line.substr(0, sp);
    std::string rest = sp == std::string::npos ? "" : line.substr(sp + 1);
    if (key == "FIELDS") {
      fields_ok = (rest == "x y z rgb");
    } else if (key == "SIZE") {
      size_ok = (rest == "4 4 4 4");
    } else if (key == "TYPE") {
      type_ok = (rest == "F F F F");
    } else if (key == "COUNT") {
      count_ok = (rest == "1 1 1 1");
    } else if (key == "WIDTH") {
      h->width = std::atol(rest.c_str());
    } else if (key == "HEIGHT") {
      h->height = std::atol(rest.c_str());
    } else if (key == "POINTS") {
      h->points = std::atol(rest.c_str());
    } else if (key == "DATA") {
      h->data = rest;
      h->body_off = pos;
      break;
    }
  }
  if (h->points < 0) h->points = h->width * h->height;
  h->layout_ok = fields_ok && size_ok && type_ok && count_ok &&
                 !h->data.empty() && h->points >= 0;
  return h->layout_ok;
}

inline void emit_point(float x, float y, float z, uint32_t rgb, int64_t i,
                       float* xyz_out, float* rgb_out, uint8_t* valid_out) {
  xyz_out[3 * i] = x;
  xyz_out[3 * i + 1] = y;
  xyz_out[3 * i + 2] = z;
  rgb_out[3 * i] = (float)((rgb >> 16) & 0xFF);
  rgb_out[3 * i + 1] = (float)((rgb >> 8) & 0xFF);
  rgb_out[3 * i + 2] = (float)(rgb & 0xFF);
  bool finite = std::isfinite(x) && std::isfinite(y) && std::isfinite(z);
  if (!finite) {  // match the Python reader: masked AND zeroed (NaN xyz
                  // must not leak into masked elementwise math downstream)
    xyz_out[3 * i] = xyz_out[3 * i + 1] = xyz_out[3 * i + 2] = 0.0f;
  }
  valid_out[i] = (finite && z != 0.0f) ? 1 : 0;
}

// Load one file into the i-th slot of the padded output buffers.
int64_t load_one(const char* path, int64_t capacity, float* xyz_out,
                 float* rgb_out, uint8_t* valid_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize((size_t)sz);
  if (std::fread(&buf[0], 1, (size_t)sz, f) != (size_t)sz) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);

  Header h;
  if (!parse_header(buf, &h)) return -1;
  int64_t n = h.points < capacity ? h.points : capacity;

  if (h.data == "binary") {
    const uint8_t* rec = (const uint8_t*)buf.data() + h.body_off;
    if ((size_t)h.body_off + 16u * (size_t)h.points > buf.size()) return -1;
    for (int64_t i = 0; i < n; ++i) {
      float x, y, z;
      uint32_t rgb;
      std::memcpy(&x, rec + 16 * i, 4);
      std::memcpy(&y, rec + 16 * i + 4, 4);
      std::memcpy(&z, rec + 16 * i + 8, 4);
      std::memcpy(&rgb, rec + 16 * i + 12, 4);
      emit_point(x, y, z, rgb, i, xyz_out, rgb_out, valid_out);
    }
  } else if (h.data == "binary_compressed") {
    const uint8_t* p = (const uint8_t*)buf.data() + h.body_off;
    if (h.body_off + 8 > buf.size()) return -1;
    uint32_t comp = 0, uncomp = 0;
    std::memcpy(&comp, p, 4);
    std::memcpy(&uncomp, p + 4, 4);
    if (h.body_off + 8 + comp > buf.size()) return -1;
    std::vector<uint8_t> raw(uncomp);
    if (rspc_lzf_decompress(p + 8, comp, raw.data(), uncomp) != uncomp)
      return -1;
    // PCL stores compressed bodies field-major (SoA): x[], y[], z[], rgb[]
    if ((uint64_t)uncomp < 16ull * (uint64_t)h.points) return -1;
    const float* xs = (const float*)raw.data();
    const float* ys = xs + h.points;
    const float* zs = ys + h.points;
    const uint32_t* rgbs = (const uint32_t*)(zs + h.points);
    for (int64_t i = 0; i < n; ++i)
      emit_point(xs[i], ys[i], zs[i], rgbs[i], i, xyz_out, rgb_out,
                 valid_out);
  } else if (h.data == "ascii") {
    const char* p = buf.c_str() + h.body_off;
    char* end = nullptr;
    for (int64_t i = 0; i < n; ++i) {
      float x = std::strtof(p, &end);
      if (end == p) return -1;
      p = end;
      float y = std::strtof(p, &end);
      p = end;
      float z = std::strtof(p, &end);
      p = end;
      // TYPE F ascii rgb: PCL (and our writer) print the packed integer
      // value; older files print the float whose BITS are the packed
      // integer. Auto-detect like the Python reader: integral tokens are
      // packed values, fractional ones are bit patterns.
      double rgbd = std::strtod(p, &end);
      p = end;
      uint32_t rgb;
      if (std::isfinite(rgbd) && rgbd >= 0.0 && rgbd < 4294967296.0 &&
          rgbd == std::floor(rgbd)) {
        rgb = (uint32_t)rgbd;
      } else {
        float rf = (float)rgbd;
        std::memcpy(&rgb, &rf, 4);
      }
      emit_point(x, y, z, rgb, i, xyz_out, rgb_out, valid_out);
    }
  } else {
    return -1;
  }
  // zero the padded tail's validity
  for (int64_t i = n; i < capacity; ++i) valid_out[i] = 0;
  return n;
}

}  // namespace

extern "C" {

// Load n_files PCD files concurrently into padded [n_files, capacity]
// buffers. counts_out[i] = points loaded (clamped to capacity), or -1 if
// file i needs the general (Python) reader. Returns number of files the
// fast path handled.
int64_t rspc_load_dataset(const char** paths, int64_t n_files,
                          int64_t capacity, float* xyz_out, float* rgb_out,
                          uint8_t* valid_out, int64_t* counts_out) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 4;
  int64_t n_workers = (int64_t)hw < n_files ? (int64_t)hw : n_files;
  std::atomic<int64_t> next(0), ok(0);
  std::vector<std::thread> threads;
  threads.reserve((size_t)n_workers);
  for (int64_t w = 0; w < n_workers; ++w) {
    threads.emplace_back([&]() {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n_files) return;
        int64_t c = load_one(paths[i], capacity, xyz_out + i * capacity * 3,
                             rgb_out + i * capacity * 3,
                             valid_out + i * capacity);
        counts_out[i] = c;
        if (c >= 0) ok.fetch_add(1);
      }
    });
  }
  for (auto& t : threads) t.join();
  return ok.load();
}

}  // extern "C"

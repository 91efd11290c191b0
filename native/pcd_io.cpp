// Fast PCD record packing helpers.
//
// The framework's PCD reader/writer lives in Python (rspc_tpu/io/pcd.py);
// the hot inner loops — packing/unpacking x,y,z,rgb records and the LZF
// codec (lzf.cpp) — are native. This mirrors the reference's reliance on
// PCL's C++ pcd_io (SURVEY.md X10) for its multi-MB-per-frame dataset
// files, without pulling a full C++ parser into the I/O contract.

#include <cstdint>
#include <cstring>

extern "C" {

// interleave xyz[3n] f32 + packed rgb[n] u32 -> records[n*16] bytes
void rspc_pack_xyzrgb(const float* xyz, const uint32_t* rgb, int64_t n,
                      uint8_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(out + 16 * i, xyz + 3 * i, 12);
    std::memcpy(out + 16 * i + 12, rgb + i, 4);
  }
}

// split records[n*16] -> xyz[3n] f32 + rgb[n] u32
void rspc_unpack_xyzrgb(const uint8_t* rec, int64_t n, float* xyz,
                        uint32_t* rgb) {
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(xyz + 3 * i, rec + 16 * i, 12);
    std::memcpy(rgb + i, rec + 16 * i + 12, 4);
  }
}

}  // extern "C"

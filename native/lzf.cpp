// LZF codec (libLZF-compatible format, as used by PCL binary_compressed
// .pcd files). Freestanding reimplementation: hash-chain compressor with
// the standard control-byte stream layout (literal runs < 32, back
// references with 13-bit offsets and 3..264-byte lengths).
//
// The Python fallback in rspc_tpu/io/pcd.py implements the same format;
// this native path exists because million-point clouds make a per-byte
// Python loop the I/O bottleneck (reference writes multi-MB clouds per
// frame, src/main.cpp:53).

#include <cstdint>
#include <cstring>

extern "C" {

// Returns compressed size, or 0 if out_cap is insufficient.
uint64_t rspc_lzf_compress(const uint8_t* in, uint64_t in_len, uint8_t* out,
                           uint64_t out_cap) {
  if (in_len == 0) return 0;
  constexpr uint64_t kHashBits = 16;
  constexpr uint64_t kHashSize = 1ull << kHashBits;
  static thread_local int64_t htab[kHashSize];
  for (uint64_t i = 0; i < kHashSize; ++i) htab[i] = -1;

  uint64_t o = 0;
  uint64_t lit_start = 0;
  uint64_t i = 0;

  auto flush_literals = [&](uint64_t end) -> bool {
    uint64_t j = lit_start;
    while (j < end) {
      uint64_t cnt = end - j;
      if (cnt > 32) cnt = 32;
      if (o + 1 + cnt > out_cap) return false;
      out[o++] = static_cast<uint8_t>(cnt - 1);
      std::memcpy(out + o, in + j, cnt);
      o += cnt;
      j += cnt;
    }
    lit_start = end;
    return true;
  };

  while (i + 2 < in_len) {
    uint32_t seq = (uint32_t(in[i]) << 16) | (uint32_t(in[i + 1]) << 8) |
                   uint32_t(in[i + 2]);
    uint32_t h = ((seq >> 8) * 2654435761u) >> (32 - kHashBits);
    int64_t ref = htab[h];
    htab[h] = static_cast<int64_t>(i);
    if (ref >= 0) {
      uint64_t off = i - static_cast<uint64_t>(ref) - 1;
      if (off < 8192 && in[ref] == in[i] && in[ref + 1] == in[i + 1] &&
          in[ref + 2] == in[i + 2]) {
        uint64_t len = 3;
        uint64_t maxlen = in_len - i;
        if (maxlen > 264) maxlen = 264;
        while (len < maxlen && in[ref + len] == in[i + len]) ++len;
        if (!flush_literals(i)) return 0;
        uint64_t l = len - 2;
        if (l < 7) {
          if (o + 2 > out_cap) return 0;
          out[o++] = static_cast<uint8_t>((l << 5) | (off >> 8));
        } else {
          if (o + 3 > out_cap) return 0;
          out[o++] = static_cast<uint8_t>((7u << 5) | (off >> 8));
          out[o++] = static_cast<uint8_t>(l - 7);
        }
        out[o++] = static_cast<uint8_t>(off & 0xFF);
        i += len;
        lit_start = i;
        continue;
      }
    }
    ++i;
  }
  if (!flush_literals(in_len)) return 0;
  return o;
}

// Returns decompressed size (== expected) or 0 on malformed input.
uint64_t rspc_lzf_decompress(const uint8_t* in, uint64_t in_len, uint8_t* out,
                             uint64_t expected) {
  uint64_t i = 0, o = 0;
  while (i < in_len) {
    uint8_t ctrl = in[i++];
    if (ctrl < 32) {
      uint64_t cnt = uint64_t(ctrl) + 1;
      if (i + cnt > in_len || o + cnt > expected) return 0;
      std::memcpy(out + o, in + i, cnt);
      i += cnt;
      o += cnt;
    } else {
      uint64_t len = ctrl >> 5;
      if (len == 7) {
        if (i >= in_len) return 0;
        len += in[i++];
      }
      if (i >= in_len) return 0;
      uint64_t off = (uint64_t(ctrl & 0x1F) << 8) + in[i++] + 1;
      if (off > o) return 0;
      uint64_t ref = o - off;
      len += 2;
      if (o + len > expected) return 0;
      for (uint64_t k = 0; k < len; ++k) out[o + k] = out[ref + k];
      o += len;
    }
  }
  return o;
}

}  // extern "C"

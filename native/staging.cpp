// Host-side native kernels for the TPU query engine (C ABI, loaded via ctypes).
//
// TPU-native equivalents of the reference's host/native runtime pieces:
//  - pad_utf8:       Arrow (offsets,data) ragged strings -> fixed-shape padded
//                    byte matrix + lengths. The data-loader staging pass that
//                    feeds the device batch ABI (analog of the Arrow FFI
//                    import path, scan.rs:114 / NativeUtil.scala:94).
//  - radix_sort_u64: LSD radix sort returning a permutation (analog of
//                    native/core/src/execution/sort.rs RdxSort:79 used by the
//                    shuffle sorter).
//  - crc32:          block checksums for the spill format (analog of
//                    native/shuffle/src/writers/checksum.rs).
//  - spill block framing with a 4-byte codec magic + u64-LE offsets mirroring
//    native/shuffle/src/ipc.rs:23-46 lives in io/spill.py on top of these.
//
// Build: g++ -O3 -march=native -shared -fPIC staging.cpp -o libcomet_host.so -lz

#include <cstdint>
#include <cstring>
#include <vector>
#include <zlib.h>

extern "C" {

// Ragged UTF-8 (Arrow layout: offsets[n+1] into data) -> padded (n, max_len)
// matrix + int32 lengths. Strings longer than max_len are truncated (caller
// validates widths). Returns number of truncated strings.
int64_t pad_utf8(const int64_t* offsets, const uint8_t* data, int64_t n,
                 int64_t max_len, uint8_t* out_matrix, int32_t* out_lengths) {
  int64_t truncated = 0;
#pragma omp parallel for reduction(+ : truncated) schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    int64_t start = offsets[i];
    int64_t len = offsets[i + 1] - start;
    if (len > max_len) {
      len = max_len;
      ++truncated;
    }
    uint8_t* dst = out_matrix + i * max_len;
    std::memcpy(dst, data + start, static_cast<size_t>(len));
    std::memset(dst + len, 0, static_cast<size_t>(max_len - len));
    out_lengths[i] = static_cast<int32_t>(len);
  }
  return truncated;
}

// Same for Arrow int32 offsets (non-large string arrays).
int64_t pad_utf8_32(const int32_t* offsets, const uint8_t* data, int64_t n,
                    int64_t max_len, uint8_t* out_matrix, int32_t* out_lengths) {
  int64_t truncated = 0;
#pragma omp parallel for reduction(+ : truncated) schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    int64_t start = offsets[i];
    int64_t len = static_cast<int64_t>(offsets[i + 1]) - start;
    if (len > max_len) {
      len = max_len;
      ++truncated;
    }
    uint8_t* dst = out_matrix + i * max_len;
    std::memcpy(dst, data + start, static_cast<size_t>(len));
    std::memset(dst + len, 0, static_cast<size_t>(max_len - len));
    out_lengths[i] = static_cast<int32_t>(len);
  }
  return truncated;
}

// LSD radix sort over u64 keys: fills perm with the stable sort permutation.
// 8 passes x 256 buckets (the reference's rdxsort shape, sort.rs:19).
void radix_sort_u64(const uint64_t* keys, int64_t n, int32_t* perm) {
  std::vector<int32_t> tmp(static_cast<size_t>(n));
  int32_t* src = perm;
  int32_t* dst = tmp.data();
  for (int64_t i = 0; i < n; ++i) src[i] = static_cast<int32_t>(i);
  int64_t count[256];
  for (int pass = 0; pass < 8; ++pass) {
    int shift = pass * 8;
    std::memset(count, 0, sizeof(count));
    for (int64_t i = 0; i < n; ++i)
      ++count[(keys[src[i]] >> shift) & 0xFF];
    // skip no-op passes (all keys share this byte)
    bool trivial = false;
    for (int b = 0; b < 256; ++b)
      if (count[b] == n) { trivial = true; break; }
    if (trivial) continue;
    int64_t pos[256];
    int64_t acc = 0;
    for (int b = 0; b < 256; ++b) { pos[b] = acc; acc += count[b]; }
    for (int64_t i = 0; i < n; ++i)
      dst[pos[(keys[src[i]] >> shift) & 0xFF]++] = src[i];
    std::swap(src, dst);
  }
  if (src != perm) std::memcpy(perm, src, static_cast<size_t>(n) * sizeof(int32_t));
}

uint32_t crc32_buf(const uint8_t* buf, int64_t len) {
  return static_cast<uint32_t>(
      ::crc32(0L, reinterpret_cast<const Bytef*>(buf), static_cast<uInt>(len)));
}

// zlib compress/decompress for spill blocks (codec magic "ZLIB"; the
// reference uses SNAP/LZ4_/ZSTD/NONE — zlib is the toolchain-guaranteed one).
int64_t zlib_compress_bound(int64_t len) { return compressBound(static_cast<uLong>(len)); }

int64_t zlib_compress_buf(const uint8_t* src, int64_t src_len, uint8_t* dst,
                          int64_t dst_cap, int level) {
  uLongf out_len = static_cast<uLongf>(dst_cap);
  int rc = compress2(dst, &out_len, src, static_cast<uLong>(src_len), level);
  return rc == Z_OK ? static_cast<int64_t>(out_len) : -1;
}

int64_t zlib_decompress_buf(const uint8_t* src, int64_t src_len, uint8_t* dst,
                            int64_t dst_cap) {
  uLongf out_len = static_cast<uLongf>(dst_cap);
  int rc = uncompress(dst, &out_len, src, static_cast<uLong>(src_len));
  return rc == Z_OK ? static_cast<int64_t>(out_len) : -1;
}

// Columnar -> row serializer: pack fixed-width columns into row-major byte
// buffer with an 8-byte-aligned layout (null bitset word + one 8-byte slot
// per column) — the UnsafeRow-compatible shape of columnar_to_row.rs:949.
// cols: array of pointers; widths: bytes per value (1,2,4,8).
void columnar_to_rows(const uint8_t** cols, const uint8_t** validity,
                      const int32_t* widths, int32_t n_cols, int64_t n_rows,
                      uint8_t* out, int64_t row_stride) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n_rows; ++r) {
    uint8_t* row = out + r * row_stride;
    uint64_t* null_word = reinterpret_cast<uint64_t*>(row);
    *null_word = 0;
    for (int32_t c = 0; c < n_cols; ++c) {
      if (!validity[c][r]) *null_word |= (1ULL << c);
      uint64_t slot = 0;
      std::memcpy(&slot, cols[c] + r * widths[c], static_cast<size_t>(widths[c]));
      std::memcpy(row + 8 + c * 8, &slot, 8);
    }
  }
}

}  // extern "C"

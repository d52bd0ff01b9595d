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

// Full Spark UnsafeRow serialization (reference: columnar_to_row.rs:869
// ColumnarToRowContext + :949 convert; Native.scala:232 columnarToRowInit/
// Convert). Layout per row: [null bitset, ceil(n_cols/64) 8-byte words]
// [one 8-byte slot per column] [8-byte-aligned var-len payloads]. A var-len
// column's slot holds (offset_from_row_base << 32) | byte_length.
// widths[c] > 0 → fixed width (1/2/4/8 bytes, data at cols[c] + r*width);
// widths[c] == 0 → var-len: padded matrix var size var_pad_w[c] per row at
// cols[c] + r*var_pad_w[c], true length var_lens[c][r].

static inline int64_t row_fixed_size(int32_t n_cols) {
  return ((n_cols + 63) / 64) * 8 + static_cast<int64_t>(n_cols) * 8;
}

int64_t unsafe_rows_offsets(const int32_t* widths, const int32_t* var_pad_w,
                            const int32_t** var_lens, const uint8_t** validity,
                            int32_t n_cols, int64_t n_rows, int64_t* offsets) {
  const int64_t fixed = row_fixed_size(n_cols);
  offsets[0] = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    int64_t sz = fixed;
    for (int32_t c = 0; c < n_cols; ++c) {
      if (widths[c] == 0 && validity[c][r]) {
        sz += (static_cast<int64_t>(var_lens[c][r]) + 7) & ~7LL;  // 8-aligned
      }
    }
    offsets[r + 1] = offsets[r] + sz;
  }
  return offsets[n_rows];
}

void unsafe_rows_fill(const uint8_t** cols, const int32_t* widths,
                      const int32_t* var_pad_w, const int32_t** var_lens,
                      const uint8_t** validity, const int32_t* sext,
                      int32_t n_cols, int64_t n_rows,
                      const int64_t* offsets, uint8_t* out) {
  const int64_t fixed = row_fixed_size(n_cols);
  const int32_t null_words = (n_cols + 63) / 64;
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n_rows; ++r) {
    uint8_t* row = out + offsets[r];
    uint64_t* nulls = reinterpret_cast<uint64_t*>(row);
    for (int32_t w = 0; w < null_words; ++w) nulls[w] = 0;
    uint8_t* slots = row + null_words * 8;
    int64_t var_off = fixed;  // next var payload offset from row base
    for (int32_t c = 0; c < n_cols; ++c) {
      uint64_t slot = 0;
      if (!validity[c][r]) {
        nulls[c / 64] |= (1ULL << (c % 64));
      } else if (widths[c] > 0) {
        std::memcpy(&slot, cols[c] + r * widths[c], static_cast<size_t>(widths[c]));
        // sign-extend small signed ints the way Spark's writers do
        // (floats/bools keep zero upper bytes — sext[c] gates this)
        if (sext[c]) {
          if (widths[c] == 1) slot = static_cast<uint64_t>(static_cast<int64_t>(static_cast<int8_t>(slot)));
          else if (widths[c] == 2) slot = static_cast<uint64_t>(static_cast<int64_t>(static_cast<int16_t>(slot)));
          else if (widths[c] == 4) slot = static_cast<uint64_t>(static_cast<int64_t>(static_cast<int32_t>(slot)));
        }
      } else {
        const int32_t len = var_lens[c][r];
        std::memcpy(row + var_off, cols[c] + r * var_pad_w[c], static_cast<size_t>(len));
        // zero the alignment tail for deterministic buffers
        for (int64_t p = var_off + len; p < var_off + ((len + 7) & ~7LL); ++p) row[p] = 0;
        slot = (static_cast<uint64_t>(var_off) << 32) | static_cast<uint32_t>(len);
        var_off += (len + 7) & ~7LL;
      }
      std::memcpy(slots + c * 8, &slot, 8);
    }
  }
}

}  // extern "C"

// TFRecord container reader/writer with crc32c framing — C API for
// ctypes binding. Host-side data path of the framework (the reference
// delegates this to the TensorFlow C++ runtime via tf.data,
// reference: library.py:59, main.py:111).
//
// The C API exposes bulk operations: read all record offsets/lengths in
// one pass (so Python slices payloads out of a single mmap'd buffer)
// and frame/write records from contiguous payload buffers.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "crc32c.h"

namespace {
nmrgnn::Crc32c g_crc;
}

extern "C" {

// Scan a TFRecord file: fills offsets[i]/lengths[i] for up to max_records
// payloads. Returns the number of records found, or -1 on IO error,
// -2 on CRC mismatch (when check_crc != 0), -3 if max_records exceeded.
long tfrecord_scan(const char* path, long* offsets, long* lengths,
                   long max_records, int check_crc) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  long count = 0;
  std::vector<uint8_t> buf;
  for (;;) {
    uint8_t header[8];
    size_t got = std::fread(header, 1, 8, f);
    if (got == 0) break;
    if (got < 8) { std::fclose(f); return -1; }
    uint64_t len;
    std::memcpy(&len, header, 8);
    uint32_t hcrc;
    if (std::fread(&hcrc, 1, 4, f) != 4) { std::fclose(f); return -1; }
    if (check_crc && nmrgnn::Crc32c::mask(g_crc.compute(header, 8)) != hcrc) {
      std::fclose(f);
      return -2;
    }
    long payload_off = std::ftell(f);
    if (check_crc) {
      buf.resize(len);
      if (std::fread(buf.data(), 1, len, f) != len) { std::fclose(f); return -1; }
      uint32_t pcrc;
      if (std::fread(&pcrc, 1, 4, f) != 4) { std::fclose(f); return -1; }
      if (nmrgnn::Crc32c::mask(g_crc.compute(buf.data(), len)) != pcrc) {
        std::fclose(f);
        return -2;
      }
    } else {
      if (std::fseek(f, static_cast<long>(len) + 4, SEEK_CUR) != 0) {
        std::fclose(f);
        return -1;
      }
    }
    if (count >= max_records) { std::fclose(f); return -3; }
    offsets[count] = payload_off;
    lengths[count] = static_cast<long>(len);
    ++count;
  }
  std::fclose(f);
  return count;
}

// Append n records to path. payloads: concatenated payload bytes;
// lengths[i]: size of record i. Returns 0 on success.
int tfrecord_write(const char* path, const uint8_t* payloads,
                   const long* lengths, long n, int append) {
  FILE* f = std::fopen(path, append ? "ab" : "wb");
  if (!f) return -1;
  const uint8_t* p = payloads;
  for (long i = 0; i < n; ++i) {
    uint64_t len = static_cast<uint64_t>(lengths[i]);
    uint8_t header[8];
    std::memcpy(header, &len, 8);
    uint32_t hcrc = nmrgnn::Crc32c::mask(g_crc.compute(header, 8));
    uint32_t pcrc = nmrgnn::Crc32c::mask(g_crc.compute(p, len));
    if (std::fwrite(header, 1, 8, f) != 8 ||
        std::fwrite(&hcrc, 1, 4, f) != 4 ||
        std::fwrite(p, 1, len, f) != len ||
        std::fwrite(&pcrc, 1, 4, f) != 4) {
      std::fclose(f);
      return -1;
    }
    p += len;
  }
  std::fclose(f);
  return 0;
}

uint32_t nmrgnn_crc32c(const uint8_t* data, long n) {
  return g_crc.compute(data, static_cast<size_t>(n));
}

uint32_t nmrgnn_masked_crc(const uint8_t* data, long n) {
  return nmrgnn::Crc32c::mask(g_crc.compute(data, static_cast<size_t>(n)));
}

}  // extern "C"

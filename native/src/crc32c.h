// crc32c (Castagnoli) — slice-by-8 software implementation.
// Used for TFRecord framing checksums (masked CRC), replacing the TF
// runtime's native reader the reference depends on via tf.data
// (reference: library.py:59).
#pragma once
#include <cstddef>
#include <cstdint>

namespace nmrgnn {

class Crc32c {
 public:
  Crc32c() { init(); }

  uint32_t compute(const uint8_t* data, size_t n) const {
    uint32_t crc = 0xFFFFFFFFu;
    // process 8 bytes at a time (slice-by-8)
    while (n >= 8) {
      uint64_t chunk;
      __builtin_memcpy(&chunk, data, 8);
      crc ^= static_cast<uint32_t>(chunk);
      uint32_t hi = static_cast<uint32_t>(chunk >> 32);
      crc = table_[7][crc & 0xFF] ^ table_[6][(crc >> 8) & 0xFF] ^
            table_[5][(crc >> 16) & 0xFF] ^ table_[4][(crc >> 24) & 0xFF] ^
            table_[3][hi & 0xFF] ^ table_[2][(hi >> 8) & 0xFF] ^
            table_[1][(hi >> 16) & 0xFF] ^ table_[0][(hi >> 24) & 0xFF];
      data += 8;
      n -= 8;
    }
    while (n--) crc = (crc >> 8) ^ table_[0][(crc ^ *data++) & 0xFF];
    return crc ^ 0xFFFFFFFFu;
  }

  static uint32_t mask(uint32_t crc) {
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
  }

 private:
  void init() {
    constexpr uint32_t kPoly = 0x82F63B78u;
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k) c = (c & 1) ? (c >> 1) ^ kPoly : c >> 1;
      table_[0][i] = c;
    }
    for (int t = 1; t < 8; ++t)
      for (uint32_t i = 0; i < 256; ++i)
        table_[t][i] = (table_[t - 1][i] >> 8) ^ table_[0][table_[t - 1][i] & 0xFF];
  }

  uint32_t table_[8][256];
};

}  // namespace nmrgnn

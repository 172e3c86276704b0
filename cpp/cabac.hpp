// coolchic_tpu host entropy codec: binary arithmetic coder (CABAC).
//
// Format-compatible re-implementation of the VTM-style coder used by the
// reference bitstreams (reference: coolchic/cpp/TEncBinCoderCABAC.cpp,
// TDecBinCoderCABAC.{h,cpp}, Contexts.h, BitStream.cpp — BSD-licensed,
// ITU/ISO/IEC + Orange). The probability-state arithmetic, renormalization
// table and byte-packing rules below are format constants: change any of
// them and the bitstreams stop interoperating.
//
// Structure is our own: a single header-only codec with byte-vector I/O and
// a C ABI (see entropy_api.cpp) consumed from Python via ctypes — no
// pybind11 dependency.

#pragma once

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

namespace ccz {

// ---------------------------------------------------------------------------
// Adaptive binary probability model: two exponentially-decaying estimates
// held at 15-bit precision (reference: Contexts.h:45-50, 84-158).
// ---------------------------------------------------------------------------
constexpr int PROB_BITS = 15;
constexpr int PROB_BITS_0 = 10;
constexpr int PROB_BITS_1 = 14;
constexpr int MASK_0 = ~(~0u << PROB_BITS_0) << (PROB_BITS - PROB_BITS_0);
constexpr int MASK_1 = ~(~0u << PROB_BITS_1) << (PROB_BITS - PROB_BITS_1);
constexpr uint8_t DEFAULT_RATES = 8;  // packed (rate0=0, rate1=8) window sizes

// Renormalization shift per LPS range bucket (reference: Contexts.cpp:40-50).
constexpr uint8_t kRenormTable32[32] = {
    6, 5, 4, 4, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2, 2, 2,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
};

struct ProbState {
  uint16_t s0, s1;
  uint8_t rates;

  ProbState() : rates(DEFAULT_RATES) {
    uint16_t half = 1 << (PROB_BITS - 1);
    s0 = half;
    s1 = half;
  }
  // From a static state index in [1..127:2] (reference: Contexts.h:99-110).
  explicit ProbState(int state_idx) : rates(DEFAULT_RATES) {
    s0 = (state_idx << 8) & MASK_0;
    s1 = (state_idx << 8) & MASK_1;
  }

  void update(unsigned bin) {
    int rate0 = rates >> 4;
    int rate1 = rates & 15;
    s0 -= (s0 >> rate0) & MASK_0;
    s1 -= (s1 >> rate1) & MASK_1;
    if (bin) {
      s0 += (0x7fffu >> rate0) & MASK_0;
      s1 += (0x7fffu >> rate1) & MASK_1;
    }
  }
  uint8_t state() const { return (s0 + s1) >> 8; }
  uint8_t mps() const { return state() >> 7; }
  uint8_t lps_range(unsigned range) const {
    uint16_t q = state();
    if (q & 0x80) q = q ^ 0xff;
    return ((q >> 2) * (range >> 5) >> 1) + 4;
  }
};

// ---------------------------------------------------------------------------
// MSB-first byte sink (reference: BitStream.cpp OutputBitstream::write).
// ---------------------------------------------------------------------------
class ByteSink {
 public:
  std::vector<uint8_t> bytes;

  void write(uint32_t bits, uint32_t n) {
    uint32_t total = n + held_n_;
    uint32_t next_held_n = total % 8;
    uint8_t next_held = static_cast<uint8_t>(bits << (8 - next_held_n));
    if (total < 8) {
      held_ |= next_held;
      held_n_ = next_held_n;
      return;
    }
    uint32_t top = (n - next_held_n) & ~7u;
    uint32_t w = (static_cast<uint32_t>(held_) << top) | (bits >> next_held_n);
    switch (total >> 3) {
      case 4: bytes.push_back(w >> 24); [[fallthrough]];
      case 3: bytes.push_back(w >> 16); [[fallthrough]];
      case 2: bytes.push_back(w >> 8); [[fallthrough]];
      case 1: bytes.push_back(w);
    }
    held_ = next_held;
    held_n_ = next_held_n;
  }

  void align_zero() {
    if (held_n_) {
      bytes.push_back(held_);
      held_ = 0;
      held_n_ = 0;
    }
  }

 private:
  uint8_t held_ = 0;
  uint32_t held_n_ = 0;
};

// ---------------------------------------------------------------------------
// Encoder (reference: TEncBinCoderCABAC.cpp:49-370).
// ---------------------------------------------------------------------------
class Encoder {
 public:
  explicit Encoder(ByteSink& sink) : sink_(sink) { start(); }

  void start() {
    low_ = 0;
    range_ = 510;
    buffered_byte_ = 0xff;
    num_buffered_ = 0;
    bits_left_ = 23;
  }

  void encode_bin(ProbState& p, unsigned bin, bool do_update = false) {
    uint32_t lps = p.lps_range(range_);
    range_ -= lps;
    if (bin != p.mps()) {
      int n = kRenormTable32[lps >> 3];
      bits_left_ -= n;
      low_ += range_;
      low_ <<= n;
      range_ = lps << n;
      if (bits_left_ < 12) write_out();
    } else if (range_ < 256) {
      bits_left_ -= 1;
      low_ <<= 1;
      range_ <<= 1;
      if (bits_left_ < 12) write_out();
    }
    if (do_update) p.update(bin);
  }

  void encode_bin_ep(unsigned bin) {
    low_ <<= 1;
    if (bin) low_ += range_;
    if (--bits_left_ < 12) write_out();
  }

  void encode_bins_ep(unsigned bins, unsigned n) {
    if (range_ == 256) {
      encode_aligned_bins_ep(bins, n);
      return;
    }
    while (n > 8) {
      n -= 8;
      unsigned pattern = bins >> n;
      low_ <<= 8;
      low_ += range_ * pattern;
      bins -= pattern << n;
      bits_left_ -= 8;
      if (bits_left_ < 12) write_out();
    }
    low_ <<= n;
    low_ += range_ * bins;
    bits_left_ -= n;
    if (bits_left_ < 12) write_out();
  }

  void encode_aligned_bins_ep(unsigned bins, unsigned n) {
    unsigned rem = n;
    while (rem > 0) {
      unsigned take = rem < 8 ? rem : 8;
      unsigned mask = (1u << take) - 1;
      unsigned chunk = (bins >> (rem - take)) & mask;
      low_ = (low_ << take) + (chunk << 8);  // range known to be 256
      rem -= take;
      bits_left_ -= take;
      if (bits_left_ < 12) write_out();
    }
  }

  // Exp-Golomb with exponent `count`; |symbol| only, sign coded separately
  // (reference: TEncBinCoderCABAC.cpp:188-209).
  void encode_exgolomb(unsigned symbol, unsigned count) {
    unsigned bins = 0;
    unsigned nbins = 0;
    while (symbol >= (1u << count)) {
      bins = 2 * bins + 1;
      nbins += 1;
      symbol -= 1u << count;
      count += 1;
    }
    bins = 2 * bins;
    nbins += 1;
    bins = (bins << count) | symbol;
    nbins += count;
    if (nbins > 32) {
      std::fprintf(stderr, "exgolomb overflow: %u bits\n", nbins);
      std::abort();
    }
    encode_bins_ep(bins, nbins);
  }

  void encode_bin_trm(unsigned bin) {
    range_ -= 2;
    if (bin) {
      low_ += range_;
      low_ <<= 7;
      range_ = 2 << 7;
      bits_left_ -= 7;
    } else if (range_ >= 256) {
      return;
    } else {
      low_ <<= 1;
      range_ <<= 1;
      bits_left_ -= 1;
    }
    if (bits_left_ < 12) write_out();
  }

  void finish() {
    if (low_ >> (32 - bits_left_)) {
      sink_.write(buffered_byte_ + 1, 8);
      while (num_buffered_ > 1) {
        sink_.write(0x00, 8);
        num_buffered_--;
      }
      low_ -= 1u << (32 - bits_left_);
    } else {
      if (num_buffered_ > 0) sink_.write(buffered_byte_, 8);
      while (num_buffered_ > 1) {
        sink_.write(0xff, 8);
        num_buffered_--;
      }
    }
    sink_.write(low_ >> 8, 24 - bits_left_);
  }

  // Standard stream epilogue used by every cool-chic substream: terminate,
  // flush, stop bit, zero-align (reference: ccencapi.cpp:148-151, 361-364).
  void terminate_stream() {
    encode_bin_trm(1);
    finish();
    sink_.write(1, 1);
    sink_.align_zero();
  }

 private:
  void write_out() {
    unsigned lead = low_ >> (24 - bits_left_);
    bits_left_ += 8;
    low_ &= 0xffffffffu >> bits_left_;
    if (lead == 0xff) {
      num_buffered_++;
    } else if (num_buffered_ > 0) {
      unsigned carry = lead >> 8;
      sink_.write(buffered_byte_ + carry, 8);
      buffered_byte_ = lead & 0xff;
      unsigned fill = (0xff + carry) & 0xff;
      while (num_buffered_ > 1) {
        sink_.write(fill, 8);
        num_buffered_--;
      }
    } else {
      num_buffered_ = 1;
      buffered_byte_ = lead;
    }
  }

  ByteSink& sink_;
  uint32_t low_;
  uint32_t range_;
  uint32_t buffered_byte_;
  int32_t num_buffered_;
  int32_t bits_left_;
};

// ---------------------------------------------------------------------------
// Decoder (reference: TDecBinCoderCABAC.{h,cpp}).
// ---------------------------------------------------------------------------
class Decoder {
 public:
  Decoder(const uint8_t* data, size_t size) : data_(data), size_(size) {
    range_ = 510;
    value_ = (read_byte() << 8) | read_byte();
    bits_needed_ = -8;
  }

  unsigned decode_bin(ProbState& p, bool do_update = false) {
    unsigned bin = p.mps();
    uint32_t lps = p.lps_range(range_);
    range_ -= lps;
    uint32_t scaled = range_ << 7;
    if (value_ < scaled) {
      if (range_ < 256) {
        range_ <<= 1;
        value_ <<= 1;
        if (++bits_needed_ >= 0) refill();
      }
    } else {
      bin = 1 - bin;
      int n = kRenormTable32[lps >> 3];
      value_ -= scaled;
      value_ <<= n;
      range_ = lps << n;
      bits_needed_ += n;
      if (bits_needed_ >= 0) refill();
    }
    if (do_update) p.update(bin);
    return bin;
  }

  unsigned decode_bin_ep() {
    value_ += value_;
    if (++bits_needed_ >= 0) refill();
    unsigned scaled = range_ << 7;
    if (value_ >= scaled) {
      value_ -= scaled;
      return 1;
    }
    return 0;
  }

  unsigned decode_bins_ep(int n) {
    if (range_ == 256) return decode_aligned_bins_ep(n);
    unsigned rem = n;
    unsigned bins = 0;
    while (rem > 8) {
      value_ = (value_ << 8) + (read_byte() << (8 + bits_needed_));
      unsigned scaled = range_ << 15;
      for (int i = 0; i < 8; i++) {
        bins += bins;
        scaled >>= 1;
        if (value_ >= scaled) {
          bins++;
          value_ -= scaled;
        }
      }
      rem -= 8;
    }
    bits_needed_ += rem;
    value_ <<= rem;
    if (bits_needed_ >= 0) refill();
    unsigned scaled = range_ << (rem + 7);
    for (int i = 0; i < (int)rem; i++) {
      bins += bins;
      scaled >>= 1;
      if (value_ >= scaled) {
        bins++;
        value_ -= scaled;
      }
    }
    return bins;
  }

  unsigned decode_aligned_bins_ep(int n) {
    unsigned rem = n;
    unsigned bins = 0;
    while (rem > 0) {
      unsigned take = rem < 8 ? rem : 8;
      unsigned mask = (1u << take) - 1;
      unsigned chunk = (value_ >> (15 - take)) & mask;
      bins = (bins << take) | chunk;
      value_ = (value_ << take) & 0x7fff;
      rem -= take;
      bits_needed_ += take;
      if (bits_needed_ >= 0) {
        value_ |= read_byte() << bits_needed_;
        bits_needed_ -= 8;
      }
    }
    return bins;
  }

  int decode_exgolomb(int count) {
    uint64_t symbol = 0;
    unsigned bit = 1;
    while (bit) {
      // Corrupt-stream guard: legit prefixes are short (count starts <= 12
      // and symbols fit 31 bits), but garbage input — including EOF
      // zero-fill, where value_ doubles mod 2^32 — can keep the unary
      // prefix alive forever and push the shift past bit 31 (UB).
      if (count >= 40) return 0;
      bit = decode_bin_ep();
      symbol += (uint64_t)bit << count;
      count += 1;
    }
    count -= 1;
    if (count > 0) symbol += decode_bins_ep(count);
    return (int)symbol;
  }

  unsigned decode_bin_trm() {
    range_ -= 2;
    unsigned scaled = range_ << 7;
    if (value_ >= scaled) return 1;
    if (range_ < 256) {
      range_ += range_;
      value_ += value_;
      if (++bits_needed_ == 0) refill();
    }
    return 0;
  }

 private:
  uint32_t read_byte() { return pos_ < size_ ? data_[pos_++] : 0; }
  void refill() {
    value_ += read_byte() << bits_needed_;
    bits_needed_ -= 8;
  }

  const uint8_t* data_;
  size_t size_;
  size_t pos_ = 0;
  uint32_t range_;
  uint32_t value_;
  int32_t bits_needed_;
};

}  // namespace ccz

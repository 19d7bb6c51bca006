// rans.cpp — static order-0 byte rANS codec for v2 container streams.
//
// zlib's huffman-only mode tops out ~100 MB/s/core on the nibble-packed
// bin-index stream; a static rANS with per-chunk frequency tables reaches
// several hundred MB/s/core at equal-or-better ratio (fractional-bit codes
// vs whole-bit huffman). Used for the IDS4 packed + exception streams when
// the native library is present (container flag records the codec; zlib
// remains the portable fallback).
//
// Blob layout (version 2, sentinel-tagged):
//   u32 0xFFFFFFFF | u32 n_chunks
//   per chunk: u32 raw_len | u32 enc_len | u16 freq[256]
//              | u32 state_a | u32 state_b
//              | enc_len bytes (decoder reads forward)
// Legacy layout (no sentinel): u32 n_chunks, single final_state per chunk
// (still decodable — committed golden fixtures use it).
//
// Standard rans_byte construction (32-bit state, byte renormalization,
// 12-bit probabilities). Two interleaved states per chunk (even/odd
// symbol indices) double the encode/decode dependency-chain parallelism;
// chunks additionally run on parallel threads.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t kProbBits = 12;
constexpr uint32_t kProbScale = 1u << kProbBits;
constexpr uint32_t kRansL = 1u << 23;
constexpr size_t kChunk = 1u << 20;

struct Freqs {
  uint16_t freq[256];
  uint32_t cum[257];
};

void build_freqs(const uint8_t* data, size_t n, Freqs& f) {
  uint64_t counts[256] = {0};
  for (size_t i = 0; i < n; ++i) counts[data[i]]++;
  // normalize to kProbScale with every present symbol >= 1
  uint64_t total = n;
  uint32_t assigned = 0;
  int last_present = -1;
  for (int s = 0; s < 256; ++s) {
    if (!counts[s]) {
      f.freq[s] = 0;
      continue;
    }
    uint64_t scaled = (counts[s] * kProbScale) / total;
    if (scaled == 0) scaled = 1;
    f.freq[s] = uint16_t(scaled);
    assigned += scaled;
    last_present = s;
  }
  // fix rounding drift: positive drift goes to the most frequent symbol;
  // negative drift (many rare symbols bumped to freq 1) is stolen round-robin
  // from the largest freqs, which keeps every present symbol >= 1. One sort +
  // O(|drift|) decrements; |drift| <= 256 (floors under-assign by < 1 per
  // symbol, freq-1 bumps over-assign by <= 1 per symbol).
  (void)last_present;
  int32_t delta = int32_t(kProbScale) - int32_t(assigned);
  if (delta > 0) {
    int big = 0;
    for (int s = 1; s < 256; ++s)
      if (f.freq[s] > f.freq[big]) big = s;
    f.freq[big] = uint16_t(f.freq[big] + delta);
  } else if (delta < 0) {
    int order[256];
    int np = 0;
    for (int s = 0; s < 256; ++s)
      if (f.freq[s] > 1) order[np++] = s;
    std::sort(order, order + np,
              [&](int a, int b) { return f.freq[a] > f.freq[b]; });
    for (int i = 0; delta != 0; i = (i + 1 == np ? 0 : i + 1)) {
      int s = order[i];
      if (f.freq[s] > 1) {
        f.freq[s]--;
        delta++;
      }
    }
  }
  f.cum[0] = 0;
  for (int s = 0; s < 256; ++s) f.cum[s + 1] = f.cum[s] + f.freq[s];
}

// returns encoded size; out must hold raw_len + 64 bytes of slack
size_t encode_chunk(const uint8_t* data, size_t n, const Freqs& f,
                    uint8_t* out, size_t out_cap, uint32_t final_state[2]) {
  // Division-free encode: q = floor(x/freq) via the exact ceil-reciprocal
  // (Granlund-Montgomery): with s = ceil(log2(freq)) and
  // rcp = ceil(2^(31+s)/freq), q == (x*rcp) >> (31+s) for all x < 2^31
  // (the state stays < 2^31 by the renormalization bound). The transition
  // x' = (q << 12) + (x - q*freq) + cum == x + cum + q*(4096 - freq).
  uint32_t rcp[256];
  uint8_t sh[256];
  uint32_t xmax[256];
  uint32_t cmpl[256];
  for (int s = 0; s < 256; ++s) {
    uint32_t freq = f.freq[s];
    if (!freq) continue;
    uint32_t bits = 0;
    while (freq > (1u << bits)) ++bits;  // freq <= 2^bits
    uint64_t num = 1ull << (31 + bits);
    rcp[s] = uint32_t((num + freq - 1) / freq);
    sh[s] = uint8_t(31 + bits);
    xmax[s] = ((kRansL >> kProbBits) << 8) * freq;
    cmpl[s] = kProbScale - freq;
  }
  uint8_t* end = out + out_cap;
  uint8_t* p = end;  // write backwards
  // two interleaved states: even indices -> a, odd -> b; encoded in
  // reverse symbol order so the forward decoder mirrors it exactly. The
  // pair-per-iteration body keeps the two dependency chains visibly
  // independent for out-of-order execution.
  uint32_t sa = kRansL, sb = kRansL;
  auto enc_step = [&](uint32_t st, uint8_t s) {
    while (st >= xmax[s]) {
      *--p = uint8_t(st & 0xFF);
      st >>= 8;
    }
    uint32_t q = uint32_t((uint64_t(st) * rcp[s]) >> sh[s]);
    return st + f.cum[s] + q * cmpl[s];
  };
  size_t i = n;
  if (i & 1) {  // odd tail index is even-parity? n odd => last index n-1 even
    --i;
    sa = enc_step(sa, data[i]);
  }
  while (i >= 2) {
    sb = enc_step(sb, data[i - 1]);
    sa = enc_step(sa, data[i - 2]);
    i -= 2;
  }
  final_state[0] = sa;
  final_state[1] = sb;
  size_t enc_len = size_t(end - p);
  std::memmove(out, p, enc_len);
  return enc_len;
}

void decode_chunk(const uint8_t* enc, size_t enc_len, const Freqs& f,
                  uint32_t state_a, uint32_t state_b, bool interleaved,
                  uint8_t* out, size_t n) {
  // 4 KiB slot->symbol lookup
  std::vector<uint8_t> slot2sym(kProbScale);
  for (int s = 0; s < 256; ++s)
    for (uint32_t i = f.cum[s]; i < f.cum[s + 1]; ++i) slot2sym[i] = uint8_t(s);
  const uint8_t* p = enc;
  const uint8_t* pe = enc + enc_len;
  auto dec_step = [&](uint32_t st, size_t i) {
    uint32_t slot = st & (kProbScale - 1);
    uint8_t s = slot2sym[slot];
    out[i] = s;
    st = uint32_t(f.freq[s]) * (st >> kProbBits) + slot - f.cum[s];
    while (st < kRansL && p < pe) st = (st << 8) | *p++;
    return st;
  };
  if (!interleaved) {  // legacy single-state blobs
    uint32_t st = state_a;
    for (size_t i = 0; i < n; ++i) st = dec_step(st, i);
    return;
  }
  uint32_t sa = state_a, sb = state_b;
  size_t i = 0;
  while (i + 2 <= n) {
    sa = dec_step(sa, i);
    sb = dec_step(sb, i + 1);
    i += 2;
  }
  if (i < n) sa = dec_step(sa, i);
}

}  // namespace

extern "C" {

// Compress n bytes; out capacity must be >= rans_bound(n). Returns size.
size_t dctz_rans_bound(size_t n) {
  size_t chunks = (n + kChunk - 1) / kChunk;
  if (!chunks) chunks = 1;
  return 8 + chunks * (4 + 4 + 512 + 8 + kChunk + kChunk / 16 + 64);
}

size_t dctz_rans_compress(const uint8_t* data, size_t n, uint8_t* out,
                          size_t out_cap) {
  size_t n_chunks = (n + kChunk - 1) / kChunk;
  struct Enc {
    Freqs f;
    std::vector<uint8_t> buf;
    size_t enc_len;
    uint32_t state[2];
    size_t raw_len;
  };
  std::vector<Enc> encs(n_chunks);

  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 1;
  std::vector<std::thread> threads;
  for (unsigned t = 0; t < hw && t < n_chunks; ++t) {
    threads.emplace_back([&, t] {
      for (size_t c = t; c < n_chunks; c += hw) {
        const uint8_t* src = data + c * kChunk;
        size_t len = (c + 1) * kChunk <= n ? kChunk : n - c * kChunk;
        Enc& e = encs[c];
        e.raw_len = len;
        build_freqs(src, len, e.f);
        e.buf.resize(len + len / 8 + 128);
        e.enc_len = encode_chunk(src, len, e.f, e.buf.data(), e.buf.size(),
                                 e.state);
      }
    });
  }
  for (auto& th : threads) th.join();

  uint8_t* p = out;
  uint8_t* pend = out + out_cap;
  auto put32 = [&](uint32_t v) {
    std::memcpy(p, &v, 4);
    p += 4;
  };
  if (p + 8 > pend) return 0;
  put32(0xFFFFFFFFu);  // version-2 sentinel (interleaved states)
  put32(uint32_t(n_chunks));
  for (auto& e : encs) {
    if (p + 16 + 512 + e.enc_len > pend) return 0;
    put32(uint32_t(e.raw_len));
    put32(uint32_t(e.enc_len));
    std::memcpy(p, e.f.freq, 512);
    p += 512;
    put32(e.state[0]);
    put32(e.state[1]);
    std::memcpy(p, e.buf.data(), e.enc_len);
    p += e.enc_len;
  }
  return size_t(p - out);
}

// Decompress into out (capacity out_cap); returns decoded size or 0.
size_t dctz_rans_decompress(const uint8_t* blob, size_t blob_len, uint8_t* out,
                            size_t out_cap) {
  if (blob_len < 4) return 0;
  const uint8_t* p = blob;
  const uint8_t* pend = blob + blob_len;
  auto get32 = [&](uint32_t* v) {
    std::memcpy(v, p, 4);
    p += 4;
  };
  uint32_t n_chunks;
  get32(&n_chunks);
  bool interleaved = false;
  if (n_chunks == 0xFFFFFFFFu) {
    interleaved = true;
    if (p + 4 > pend) return 0;
    get32(&n_chunks);
  }

  struct Dec {
    const uint8_t* enc;
    size_t enc_len;
    Freqs f;
    uint32_t state_a;
    uint32_t state_b;
    size_t raw_len;
    size_t out_off;
  };
  std::vector<Dec> decs(n_chunks);
  size_t off = 0;
  for (uint32_t c = 0; c < n_chunks; ++c) {
    if (p + (interleaved ? 16 : 12) + 512 > pend) return 0;
    Dec& d = decs[c];
    uint32_t raw_len, enc_len;
    get32(&raw_len);
    get32(&enc_len);
    std::memcpy(d.f.freq, p, 512);
    p += 512;
    get32(&d.state_a);
    d.state_b = 0;
    if (interleaved) get32(&d.state_b);
    d.f.cum[0] = 0;
    for (int s = 0; s < 256; ++s) d.f.cum[s + 1] = d.f.cum[s] + d.f.freq[s];
    if (d.f.cum[256] != kProbScale) return 0;
    d.raw_len = raw_len;
    d.enc_len = enc_len;
    d.enc = p;
    if (p + enc_len > pend) return 0;
    p += enc_len;
    d.out_off = off;
    off += raw_len;
    if (off > out_cap) return 0;
  }

  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 1;
  std::vector<std::thread> threads;
  for (unsigned t = 0; t < hw && t < n_chunks; ++t) {
    threads.emplace_back([&, t] {
      for (size_t c = t; c < n_chunks; c += hw) {
        Dec& d = decs[c];
        decode_chunk(d.enc, d.enc_len, d.f, d.state_a, d.state_b, interleaved,
                     out + d.out_off, d.raw_len);
      }
    });
  }
  for (auto& th : threads) th.join();
  return off;
}

}  // extern "C"

extern "C" size_t dctz_rans_raw_size(const uint8_t* blob, size_t blob_len) {
  // Total decoded size of a rANS blob (sums the per-chunk raw lengths).
  if (blob_len < 4) return size_t(-1);
  const uint8_t* p = blob;
  const uint8_t* pend = blob + blob_len;
  uint32_t n_chunks;
  std::memcpy(&n_chunks, p, 4);
  p += 4;
  size_t hdr = 12;
  if (n_chunks == 0xFFFFFFFFu) {
    if (p + 4 > pend) return size_t(-1);
    std::memcpy(&n_chunks, p, 4);
    p += 4;
    hdr = 16;
  }
  size_t total = 0;
  for (uint32_t c = 0; c < n_chunks; ++c) {
    if (p + hdr + 512 > pend) return size_t(-1);
    uint32_t raw_len, enc_len;
    std::memcpy(&raw_len, p, 4);
    std::memcpy(&enc_len, p + 4, 4);
    p += hdr + 512 + enc_len;
    if (p > pend) return size_t(-1);
    total += raw_len;
  }
  return total;
}

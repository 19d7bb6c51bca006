// filters.cpp — native stream filters for the v2 container host stage.
//
// The Python/numpy implementations of the IDS4 nibble pack and the byte
// shuffle cost ~100 ms / ~30 ms per 128 MB on this host (multiple
// single-threaded passes); these threaded single-pass versions cut that to
// ~10-20 ms. Loaded via ctypes from dctz_tpu/core/entropy.py with the
// numpy path as the portable fallback (identical bytes either way).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int nthreads_for(size_t n) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 1;
  size_t per = 1 << 20;
  size_t want = (n + per - 1) / per;
  return int(want < hw ? (want ? want : 1) : hw);
}

template <typename F>
void parallel_slices(size_t n, size_t align, F body) {
  int t = nthreads_for(n);
  std::vector<std::thread> threads;
  size_t per = ((n / t) / align + 1) * align;
  for (int i = 0; i < t; ++i) {
    size_t lo = i * per;
    if (lo >= n) break;
    size_t hi = lo + per < n ? lo + per : n;
    threads.emplace_back(body, lo, hi, i);
  }
  for (auto& th : threads) th.join();
}

// Split [0, n_rows) so each slice carries ~equal BYTES (row i costs
// weight(i)); thread count scales with total bytes, not row count — the
// row-count heuristic left multi-MB gathers single-threaded.
template <typename W, typename F>
void parallel_rows_by_bytes(size_t n_rows, W weight, F body) {
  size_t total = 0;
  for (size_t i = 0; i < n_rows; ++i) total += weight(i);
  int t = nthreads_for(total);
  if (t <= 1 || n_rows == 0) {
    if (n_rows) body(size_t(0), n_rows, 0);
    return;
  }
  std::vector<std::thread> threads;
  size_t per = total / t + 1, acc = 0, lo = 0;
  int ti = 0;
  for (size_t i = 0; i < n_rows; ++i) {
    acc += weight(i);
    if (acc >= per && i + 1 < n_rows) {
      threads.emplace_back(body, lo, i + 1, ti++);
      lo = i + 1;
      acc = 0;
    }
  }
  threads.emplace_back(body, lo, n_rows, ti);
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Pass 1: per-slice exception counts so pass 2 can write without locks.
// ids: n bytes (n even). packed: n/2 bytes out. exc: capacity >= n bytes.
// Returns the exception count.
size_t dctz_pack_ids4(const uint8_t* ids, size_t n, uint8_t* packed,
                      uint8_t* exc) {
  const int T = nthreads_for(n);
  std::vector<size_t> counts(T + 1, 0);
  size_t per = ((n / T) / 2 + 1) * 2;

  {
    std::vector<std::thread> th;
    for (int i = 0; i < T; ++i) {
      size_t lo = size_t(i) * per;
      if (lo >= n) break;
      size_t hi = lo + per < n ? lo + per : n;
      th.emplace_back([&, lo, hi, i] {
        size_t c = 0;
        for (size_t j = lo; j < hi; ++j) c += ids[j] > 14;
        counts[i + 1] = c;
      });
    }
    for (auto& t : th) t.join();
  }
  for (int i = 0; i < T; ++i) counts[i + 1] += counts[i];

  {
    std::vector<std::thread> th;
    for (int i = 0; i < T; ++i) {
      size_t lo = size_t(i) * per;
      if (lo >= n) break;
      size_t hi = lo + per < n ? lo + per : n;
      th.emplace_back([&, lo, hi, i] {
        size_t e = counts[i];
        for (size_t j = lo; j < hi; j += 2) {
          uint8_t a = ids[j], b = ids[j + 1];
          uint8_t na = a > 14 ? 15 : a;
          uint8_t nb = b > 14 ? 15 : b;
          packed[j / 2] = uint8_t(na | (nb << 4));
          if (a > 14) exc[e++] = a;
          if (b > 14) exc[e++] = b;
        }
      });
    }
    for (auto& t : th) t.join();
  }
  return counts[T];
}

// packed: n/2 bytes (n even); exc consumed in order (exc_len available);
// out: n bytes. Returns exceptions consumed, or (size_t)-1 when the packed
// stream references more exceptions than exc_len provides (corrupt or
// truncated input — never read past the exception buffer).
size_t dctz_unpack_ids4(const uint8_t* packed, size_t n, const uint8_t* exc,
                        size_t exc_len, uint8_t* out) {
  const int T = nthreads_for(n);
  std::vector<size_t> counts(T + 1, 0);
  size_t per = ((n / T) / 2 + 1) * 2;

  {
    std::vector<std::thread> th;
    for (int i = 0; i < T; ++i) {
      size_t lo = size_t(i) * per;
      if (lo >= n) break;
      size_t hi = lo + per < n ? lo + per : n;
      th.emplace_back([&, lo, hi, i] {
        size_t c = 0;
        for (size_t j = lo; j < hi; j += 2) {
          uint8_t p = packed[j / 2];
          c += (p & 15) == 15;
          c += (p >> 4) == 15;
        }
        counts[i + 1] = c;
      });
    }
    for (auto& t : th) t.join();
  }
  for (int i = 0; i < T; ++i) counts[i + 1] += counts[i];
  // Pass 1 derived the exception demand from the packed stream alone, so the
  // bound can be enforced before any exc[] read happens.
  if (counts[T] > exc_len) return size_t(-1);

  {
    std::vector<std::thread> th;
    for (int i = 0; i < T; ++i) {
      size_t lo = size_t(i) * per;
      if (lo >= n) break;
      size_t hi = lo + per < n ? lo + per : n;
      th.emplace_back([&, lo, hi, i] {
        size_t e = counts[i];
        for (size_t j = lo; j < hi; j += 2) {
          uint8_t p = packed[j / 2];
          uint8_t a = p & 15, b = p >> 4;
          out[j] = a == 15 ? exc[e++] : a;
          out[j + 1] = b == 15 ? exc[e++] : b;
        }
      });
    }
    for (auto& t : th) t.join();
  }
  return counts[T];
}

// Gather variable-length row prefixes into a tight stream (DPK container
// host assembly: each fixed-capacity device row carries lens[i] real bytes).
// Returns total bytes written.
size_t dctz_pack_rows(const uint8_t* rows, size_t n_rows, size_t cap,
                      const uint32_t* lens, uint8_t* out) {
  std::vector<size_t> off(n_rows + 1, 0);
  for (size_t i = 0; i < n_rows; ++i) off[i + 1] = off[i] + lens[i];
  parallel_rows_by_bytes(
      n_rows, [&](size_t i) { return lens[i]; },
      [&](size_t lo, size_t hi, int) {
        for (size_t i = lo; i < hi; ++i)
          std::memcpy(out + off[i], rows + i * cap, lens[i]);
      });
  return off[n_rows];
}

// Inverse: scatter a tight stream back into zeroed capacity rows.
// Returns bytes consumed, or (size_t)-1 if any lens[i] > cap.
size_t dctz_unpack_rows(const uint8_t* tight, size_t n_rows, size_t cap,
                        const uint32_t* lens, uint8_t* rows) {
  std::vector<size_t> off(n_rows + 1, 0);
  for (size_t i = 0; i < n_rows; ++i) {
    if (lens[i] > cap) return size_t(-1);
    off[i + 1] = off[i] + lens[i];
  }
  // copy + tail-zero per row in one pass (a full upfront memset touched
  // every output byte twice — half the scatter's wall time)
  parallel_rows_by_bytes(
      n_rows, [&](size_t) { return cap; },
      [&](size_t lo, size_t hi, int) {
        for (size_t i = lo; i < hi; ++i) {
          std::memcpy(rows + i * cap, tight + off[i], lens[i]);
          std::memset(rows + i * cap + lens[i], 0, cap - lens[i]);
        }
      });
  return off[n_rows];
}

// HDF5-style byte shuffle: n bytes of `itemsize`-byte items -> planes.
// Plane-major inner loops (b outer, i inner) in cache-sized item tiles:
// sequential writes per plane instead of `items`-strided ones (measured
// 2.4 -> ~0.8 ms per 2 MB DC stream on the dev host).
void dctz_shuffle(const uint8_t* in, size_t n, size_t itemsize, uint8_t* out) {
  size_t items = n / itemsize;
  const size_t TI = 4096;  // items per tile (~16-32 KB of input)
  parallel_rows_by_bytes(
      items, [&](size_t) { return itemsize; },
      [&](size_t lo, size_t hi, int) {
        for (size_t t0 = lo; t0 < hi; t0 += TI) {
          size_t t1 = t0 + TI < hi ? t0 + TI : hi;
          for (size_t b = 0; b < itemsize; ++b) {
            uint8_t* o = out + b * items;
            const uint8_t* s = in + b;
            for (size_t i = t0; i < t1; ++i) o[i] = s[i * itemsize];
          }
        }
      });
}

void dctz_unshuffle(const uint8_t* in, size_t n, size_t itemsize,
                    uint8_t* out) {
  size_t items = n / itemsize;
  const size_t TI = 4096;
  parallel_rows_by_bytes(
      items, [&](size_t) { return itemsize; },
      [&](size_t lo, size_t hi, int) {
        for (size_t t0 = lo; t0 < hi; t0 += TI) {
          size_t t1 = t0 + TI < hi ? t0 + TI : hi;
          for (size_t b = 0; b < itemsize; ++b) {
            const uint8_t* s = in + b * items;
            uint8_t* o = out + b;
            for (size_t i = t0; i < t1; ++i) o[i * itemsize] = s[i];
          }
        }
      });
}

}  // extern "C"

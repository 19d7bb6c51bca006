// dctz_ref.cpp — native CPU reference codec for DCTZ-TPU.
//
// A from-scratch C++ implementation of the reference compressor's semantics
// (swson/DCTZ: dctz-comp-lib.c / dctz-decomp-lib.c / dct.c / util.c /
// binning.c), used three ways:
//   1. bit-level oracle for the JAX codec (same container bytes),
//   2. interop check for the reference on-disk format (dctz.h:96-119),
//   3. CPU baseline measured by bench.py.
//
// Differences from the reference implementation (not from its semantics):
//   * The 64-point DCT-II/III is a direct orthonormal basis matmul instead
//     of FFTW complex FFTs (identical to ~1e-16; the reference's Makhoul
//     construction IS the orthonormal DCT, verified in tests).
//   * The three deflate streams run on std::threads instead of raw pthreads
//     (same zlib parameters: level 6, windowBits 15, memLevel 8 —
//     dctz-comp-lib.c:642-643).
//   * A coefficient exactly equal to +range_max would index conv_tbl[255]
//     (UB) in the reference; we clamp to the outermost bin.
//   * sf for an all-zero array is clamped to 1.0 (the reference divides by
//     pow(10,-inf) == 0).
//
// Build: make -C cpp   (produces libdctzref.so; ctypes wrapper in
// dctz_tpu/native.py)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <thread>
#include <vector>
#include <zlib.h>

namespace {

constexpr int kBlk = 64;
constexpr int kNBins = 255;
constexpr int kEscape = 255;
constexpr double kBrsf = 1.0;

// ---------------------------------------------------------------------------
// Orthonormal DCT-II basis (rows = analysis vectors).
// ---------------------------------------------------------------------------
struct Basis {
  int n;
  std::vector<double> b;  // (n, n) row-major
  explicit Basis(int n_) : n(n_), b(size_t(n_) * n_) {
    for (int k = 0; k < n; ++k) {
      double w = std::sqrt(2.0 / n);
      if (k == 0) w /= std::sqrt(2.0);
      for (int m = 0; m < n; ++m)
        b[size_t(k) * n + m] = w * std::cos(M_PI * (2.0 * m + 1.0) * k / (2.0 * n));
    }
  }
};

template <typename T>
void dct_block(const Basis& basis, const T* x, T* out, int n) {
  // coeff[k] = sum_m B[k,m] * x[m]; float path accumulates in float like the
  // reference's fftwf-based transform (dct-float.c).
  for (int k = 0; k < n; ++k) {
    T acc = 0;
    for (int m = 0; m < n; ++m) acc += T(basis.b[size_t(k) * n + m]) * x[m];
    out[k] = acc;
  }
}

template <typename T>
void idct_block(const Basis& basis, const T* c, T* out, int n) {
  // x[m] = sum_k B[k,m] * c[k]
  for (int m = 0; m < n; ++m) {
    T acc = 0;
    for (int k = 0; k < n; ++k) acc += T(basis.b[size_t(k) * n + m]) * c[k];
    out[m] = acc;
  }
}

// ---------------------------------------------------------------------------
// conv_tbl closed form (dctz-comp-lib.c:27-43) and bin centers
// (binning.c:12-30).
// ---------------------------------------------------------------------------
inline uint8_t zigzag_id(int lin) {
  const int half = kNBins / 2;  // 127
  return uint8_t(lin <= half ? 2 * (half - lin) : 2 * (lin - half) - 1);
}

template <typename T>
inline T bin_center(int id, T w) {
  int k = id / 2;
  return T((id % 2) ? (k + 1) : -k) * w;
}

// ---------------------------------------------------------------------------
// zlib helpers (reference parameters).
// ---------------------------------------------------------------------------
std::vector<uint8_t> deflate_buf(const uint8_t* data, size_t n) {
  uLong cap = compressBound(n);
  std::vector<uint8_t> out(cap);
  z_stream zs{};
  deflateInit2(&zs, Z_DEFAULT_COMPRESSION, Z_DEFLATED, 15, 8,
               Z_DEFAULT_STRATEGY);
  zs.next_in = const_cast<Bytef*>(data);
  zs.avail_in = n;
  zs.next_out = out.data();
  zs.avail_out = cap;
  deflate(&zs, Z_FINISH);
  out.resize(zs.total_out);
  deflateEnd(&zs);
  return out;
}

void inflate_buf(const uint8_t* data, size_t n, uint8_t* out, size_t out_n) {
  z_stream zs{};
  inflateInit(&zs);
  zs.next_in = const_cast<Bytef*>(data);
  zs.avail_in = n;
  zs.next_out = out;
  zs.avail_out = out_n;
  inflate(&zs, Z_NO_FLUSH);
  inflateEnd(&zs);
}

// ---------------------------------------------------------------------------
// v1 container header (56 bytes, dctz.h:96-119 x86-64 layout).
// ---------------------------------------------------------------------------
#pragma pack(push, 1)
struct HeaderV1 {
  int32_t datatype;  // 0 FLOAT, 1 DOUBLE
  uint32_t num_elements;
  double error_bound;
  uint32_t tot_ac_exact;
  uint32_t pad0;
  double scaling_factor;  // union; float stored in low 4 bytes
  double mean;
  uint32_t bindex_sz;
  uint32_t dc_sz;
  uint32_t ac_sz;
  uint32_t bindex_count;  // QT only; tail padding for EC
};
#pragma pack(pop)
static_assert(sizeof(HeaderV1) == 56, "header layout");

void put_union(double* slot, double v, bool is_double) {
  if (is_double) {
    *slot = v;
  } else {
    float f = float(v);
    std::memset(slot, 0, 8);
    std::memcpy(slot, &f, 4);
  }
}

double get_union(const double* slot, bool is_double) {
  if (is_double) return *slot;
  float f;
  std::memcpy(&f, slot, 4);
  return f;
}

// ---------------------------------------------------------------------------
// Core codec, templated over element type.
// ---------------------------------------------------------------------------
template <typename T>
size_t compress_impl(const T* data, uint32_t n, double eb, int qt_mode,
                     int verify, uint8_t* out, size_t out_cap) {
  const bool is_double = sizeof(T) == 8;
  const uint32_t nblk = (n + kBlk - 1) / kBlk;
  const uint32_t rem = n % kBlk;

  // --- statistics & scaling (util.c:12-44, dctz-comp-lib.c:186-217) ---
  double amax = 0.0, sum = 0.0;
  if (is_double) {
    for (uint32_t i = 0; i < n; ++i) {
      double v = std::fabs(double(data[i]));
      if (v > amax) amax = v;
      sum += double(data[i]);
    }
  } else {
    float amaxf = 0.0f, sumf = 0.0f;  // float accumulator like util.c:31-41
    for (uint32_t i = 0; i < n; ++i) {
      float v = std::fabs(float(data[i]));
      if (v > amaxf) amaxf = v;
      sumf += float(data[i]);
    }
    amax = amaxf;
    sum = sumf;
  }
  double mean = is_double ? sum / n : double(float(sum / n));
  T sf;
  if (is_double)
    sf = amax > 0 ? T(std::pow(10.0, std::ceil(std::log10(amax)) - 1)) : T(1);
  else
    sf = amax > 0 ? T(std::pow(10.0f, float(std::ceil(std::log10(float(amax)))) - 1))
                  : T(1);

  std::vector<T> xs(data, data + n);
  if (sf != T(1))
    for (uint32_t i = 0; i < n; ++i) xs[i] /= sf;

  // --- bin geometry (dctz-comp-lib.c:271-281) ---
  const int half = kNBins / 2;
  const T bin_width = T(eb * 2.0 * kBrsf);
  const T range_max = T((half * 2 + 1) * (eb * kBrsf));
  const T range_min = -range_max;

  // --- pass 1: block DCT + bin assignment (dctz-comp-lib.c:318-416) ---
  static thread_local Basis basis64(kBlk);
  std::vector<T> coef(size_t(nblk) * kBlk, T(0));
  std::vector<uint8_t> bin_index(n, kEscape);
  std::vector<float> dc(nblk);
  std::vector<T> qtable(kBlk, T(0));

  for (uint32_t i = 0; i < nblk; ++i) {
    const int lsz = (i == nblk - 1 && rem) ? int(rem) : kBlk;
    T* c = &coef[size_t(i) * kBlk];
    if (lsz == kBlk) {
      dct_block(basis64, &xs[size_t(i) * kBlk], c, kBlk);
    } else {
      Basis tail(lsz);  // rem-point transform (dctz-comp-lib.c:326-336)
      dct_block(tail, &xs[size_t(i) * kBlk], c, lsz);
    }
    dc[i] = float(c[0]);
    qtable[0] = c[0];  // faithful quirk: last block's DC survives
    bin_index[size_t(i) * kBlk] = kEscape;
    for (int j = 1; j < lsz; ++j) {
      T item = c[j];
      if (item < range_min || item > range_max) {
        if (qt_mode && std::fabs(double(item)) >= double(qtable[j]))
          qtable[j] = T(std::fabs(double(item)));
        bin_index[size_t(i) * kBlk + j] = kEscape;
      } else {
        int lin = int((item - range_min) / bin_width);
        if (lin > kNBins - 1) lin = kNBins - 1;  // clamp (reference UB)
        bin_index[size_t(i) * kBlk + j] = zigzag_id(lin);
      }
    }
  }

  // --- QT table clamp + pass 2 (dctz-comp-lib.c:450-544) ---
  if (qt_mode)
    for (int j = 1; j < kBlk; ++j)
      if (qtable[j] < T(1)) qtable[j] = T(1);
  const double qt_factor = (kNBins == 255) ? 10.0 : 2000.0;

  for (uint32_t i = 0; i < nblk; ++i) {
    const int lsz = (i == nblk - 1 && rem) ? int(rem) : kBlk;
    for (int j = 1; j < lsz; ++j) {
      size_t idx = size_t(i) * kBlk + j;
      if (bin_index[idx] != kEscape) continue;
      T item = coef[idx];
      if (qt_mode) {
        // C mixes T with double eb/qt_factor: compute in double, round once
        // (dctz-comp-lib.c:489-517).
        if (item < range_min)
          item = T((double(item) / double(qtable[j])) * eb * qt_factor +
                   double(range_min));
        else if (item > range_max)
          item = T((double(item) / double(qtable[j])) * eb * qt_factor +
                   double(range_max));
        coef[idx] = item;
        if (item >= range_min && item <= range_max) {
          int lin = int((item - range_min) / bin_width);
          if (lin > kNBins - 1) lin = kNBins - 1;
          bin_index[idx] = zigzag_id(lin);
        }
      }
    }
  }

  // --- optional verify-and-repair (mirror of dctz_tpu/ops/repair.py): the
  // reference ships this pointwise check disabled (util.c:96-102); when
  // `verify` is set, blocks whose reconstruction exceeds eb*range get their
  // error-carrying coefficients force-escaped. ---
  if (verify) {
    double vmin = data[0], vmax = data[0];
    for (uint32_t i = 1; i < n; ++i) {
      double v = double(data[i]);
      if (v < vmin) vmin = v;
      if (v > vmax) vmax = v;
    }
    const double tol = (vmax - vmin) * eb * 0.99;
    // decoder-side geometry (dctz-decomp-lib.c:373)
    const T drange_max = T(eb * kNBins);
    const T drange_min = -drange_max;
    std::vector<T> chat(kBlk), xhat(kBlk);
    for (int pass = 0; pass < 2; ++pass) {
      const double floor_pass = (pass == 0) ? double(bin_width) / 8
                                            : double(bin_width) * 1e-3;
      for (uint32_t i = 0; i < nblk; ++i) {
        const int lsz = (i == nblk - 1 && rem) ? int(rem) : kBlk;
        // reconstruct exactly as decompress_impl will
        chat[0] = T(dc[i]);
        for (int j = 1; j < lsz; ++j) {
          size_t idx = size_t(i) * kBlk + j;
          uint8_t id = bin_index[idx];
          if (id == kEscape) {
            T v = T(float(coef[idx]));
            if (qt_mode) {
              if (v > T(0))
                v = T((double(v) - double(drange_max)) / (eb * qt_factor) *
                      double(qtable[j]));
              else
                v = T((double(v) - double(drange_min)) / (eb * qt_factor) *
                      double(qtable[j]));
            }
            chat[j] = v;
          } else {
            chat[j] = bin_center(int(id), bin_width);
          }
        }
        double blk_err = 0.0;
        if (lsz == kBlk) {
          idct_block(basis64, chat.data(), xhat.data(), kBlk);
        } else {
          Basis tail(lsz);
          idct_block(tail, chat.data(), xhat.data(), lsz);
        }
        for (int j = 0; j < lsz; ++j) {
          double e = std::fabs(double(T(xhat[j] * sf)) -
                               double(data[size_t(i) * kBlk + j]));
          if (e > blk_err) blk_err = e;
        }
        if (blk_err <= tol) continue;
        for (int j = 1; j < lsz; ++j) {
          size_t idx = size_t(i) * kBlk + j;
          double e = std::fabs(double(coef[idx]) - double(chat[j]));
          double floor_j = floor_pass;
          if (qt_mode) {
            // escaping through the qtable has its own f32 floor
            double qf = 3e-6 * std::fabs(double(qtable[j]));
            if (qf > floor_j) floor_j = qf;
          }
          if (e <= floor_j || bin_index[idx] == kEscape) continue;
          bin_index[idx] = kEscape;
          if (qt_mode) {
            // renormalize the newly forced value like a real escape, side
            // chosen by sign (identical for out-of-range values)
            T item = coef[idx];
            double side = item > T(0) ? double(range_max) : double(range_min);
            coef[idx] = T((double(item) / double(qtable[j])) * eb * qt_factor +
                          side);
          }
        }
      }
    }
  }

  // --- collect the AC_exact stream in block order ---
  std::vector<float> ac_exact;
  ac_exact.reserve(1024);
  for (uint32_t i = 0; i < nblk; ++i) {
    const int lsz = (i == nblk - 1 && rem) ? int(rem) : kBlk;
    for (int j = 1; j < lsz; ++j) {
      size_t idx = size_t(i) * kBlk + j;
      if (bin_index[idx] == kEscape) ac_exact.push_back(float(coef[idx]));
    }
  }
  const uint32_t tot_ac = uint32_t(ac_exact.size());

  // --- parallel deflate (dctz-comp-lib.c:620-732) ---
  std::vector<uint8_t> bz, dz, az;
  {
    std::thread t0([&] { bz = deflate_buf(bin_index.data(), bin_index.size()); });
    std::thread t1([&] {
      dz = deflate_buf(reinterpret_cast<uint8_t*>(dc.data()),
                       dc.size() * sizeof(float));
    });
    std::thread t2([&] {
      az = deflate_buf(reinterpret_cast<uint8_t*>(ac_exact.data()),
                       ac_exact.size() * sizeof(float));
    });
    t0.join();
    t1.join();
    t2.join();
  }

  // --- assemble container (dctz-comp-lib.c:775-820) ---
  HeaderV1 h{};
  h.datatype = is_double ? 1 : 0;
  h.num_elements = n;
  h.error_bound = eb;
  h.tot_ac_exact = tot_ac;
  put_union(&h.scaling_factor, double(sf), is_double);
  put_union(&h.mean, mean, is_double);
  h.bindex_sz = uint32_t(bz.size());
  h.dc_sz = uint32_t(dz.size());
  h.ac_sz = uint32_t(az.size());
  h.bindex_count = qt_mode ? n : 0;

  size_t total = sizeof(h) + bz.size() + dz.size() + az.size() +
                 (qt_mode ? sizeof(T) * kBlk : 0);
  if (total > out_cap) return 0;
  uint8_t* p = out;
  std::memcpy(p, &h, sizeof(h));
  p += sizeof(h);
  std::memcpy(p, bz.data(), bz.size());
  p += bz.size();
  std::memcpy(p, dz.data(), dz.size());
  p += dz.size();
  std::memcpy(p, az.data(), az.size());
  p += az.size();
  if (qt_mode) {
    std::memcpy(p, qtable.data(), sizeof(T) * kBlk);
    p += sizeof(T) * kBlk;
  }
  return total;
}

template <typename T>
int decompress_impl(const uint8_t* blob, size_t blob_len, T* out,
                    uint32_t out_cap) {
  const bool is_double = sizeof(T) == 8;
  HeaderV1 h;
  if (blob_len < sizeof(h)) return -1;
  std::memcpy(&h, blob, sizeof(h));
  const uint32_t n = h.num_elements;
  if (n > out_cap) return -2;
  const uint32_t nblk = (n + kBlk - 1) / kBlk;
  const uint32_t rem = n % kBlk;
  const double eb = h.error_bound;
  const double sf = get_union(&h.scaling_factor, is_double);

  size_t body = sizeof(h) + size_t(h.bindex_sz) + h.dc_sz + h.ac_sz;
  if (blob_len < body) return -3;
  const bool qt_mode = blob_len == body + sizeof(T) * kBlk;

  const uint8_t* p = blob + sizeof(h);
  std::vector<uint8_t> bin_index(n);
  std::vector<float> dc(nblk);
  std::vector<float> ac(h.tot_ac_exact ? h.tot_ac_exact : 1);
  inflate_buf(p, h.bindex_sz, bin_index.data(), n);
  p += h.bindex_sz;
  inflate_buf(p, h.dc_sz, reinterpret_cast<uint8_t*>(dc.data()),
              dc.size() * sizeof(float));
  p += h.dc_sz;
  inflate_buf(p, h.ac_sz, reinterpret_cast<uint8_t*>(ac.data()),
              size_t(h.tot_ac_exact) * sizeof(float));
  p += h.ac_sz;
  std::vector<T> qtable(kBlk, T(0));
  if (qt_mode) std::memcpy(qtable.data(), p, sizeof(T) * kBlk);

  const int half = kNBins / 2;
  const T bin_width = T(eb * 2.0 * kBrsf);
  const T range_max = T(eb * kNBins);  // dctz-decomp-lib.c:373
  const T range_min = -range_max;
  const double qt_factor = (kNBins == 255) ? 10.0 : 2000.0;
  (void)half;

  static thread_local Basis basis64(kBlk);
  std::vector<T> coef(kBlk);
  size_t pos = 0;
  for (uint32_t i = 0; i < nblk; ++i) {
    const int lsz = (i == nblk - 1 && rem) ? int(rem) : kBlk;
    coef[0] = T(dc[i]);
    for (int j = 1; j < lsz; ++j) {
      uint8_t id = bin_index[size_t(i) * kBlk + j];
      if (id == kEscape) {
        T v = T(ac[pos++]);
        if (qt_mode) {
          // dctz-decomp-lib.c:401-413 (double intermediates, round once)
          if (v > T(0))
            v = T((double(v) - double(range_max)) / (eb * qt_factor) *
                  double(qtable[j]));
          else
            v = T((double(v) - double(range_min)) / (eb * qt_factor) *
                  double(qtable[j]));
        }
        coef[j] = v;
      } else {
        coef[j] = bin_center(int(id), bin_width);
      }
    }
    T* dst = out + size_t(i) * kBlk;
    if (lsz == kBlk) {
      idct_block(basis64, coef.data(), dst, kBlk);
    } else {
      Basis tail(lsz);
      idct_block(tail, coef.data(), dst, lsz);
    }
  }
  if (T(sf) != T(1))
    for (uint32_t i = 0; i < n; ++i) out[i] *= T(sf);
  return int(qt_mode);
}

}  // namespace

extern "C" {

// datatype: 0 = float32, 1 = float64; qt_mode: 0 = EC, 1 = QT; verify: run
// the pointwise verify-and-repair pass (0 = reference-faithful behavior).
// Returns container size, or 0 if out_cap is too small.
size_t dctz_ref_compress_v(int datatype, int qt_mode, int verify,
                           const void* data, uint32_t n, double error_bound,
                           uint8_t* out, size_t out_cap) {
  if (error_bound < 1e-6) return 0;  // dctz-comp-lib.c:135-138
  if (datatype == 1)
    return compress_impl<double>(static_cast<const double*>(data), n,
                                 error_bound, qt_mode, verify, out, out_cap);
  return compress_impl<float>(static_cast<const float*>(data), n, error_bound,
                              qt_mode, verify, out, out_cap);
}

size_t dctz_ref_compress(int datatype, int qt_mode, const void* data,
                         uint32_t n, double error_bound, uint8_t* out,
                         size_t out_cap) {
  return dctz_ref_compress_v(datatype, qt_mode, 0, data, n, error_bound, out,
                             out_cap);
}

// Returns >= 0 on success (1 if the container was QT mode), negative on error.
int dctz_ref_decompress(const uint8_t* blob, size_t blob_len, int datatype,
                        void* out, uint32_t out_cap) {
  if (datatype == 1)
    return decompress_impl<double>(blob, blob_len, static_cast<double*>(out),
                                   out_cap);
  return decompress_impl<float>(blob, blob_len, static_cast<float*>(out),
                                out_cap);
}

// Peek at a container header: fills n/error_bound/datatype; returns 0 on ok.
int dctz_ref_peek(const uint8_t* blob, size_t blob_len, uint32_t* n,
                  double* error_bound, int* datatype) {
  if (blob_len < sizeof(HeaderV1)) return -1;
  HeaderV1 h;
  std::memcpy(&h, blob, sizeof(h));
  *n = h.num_elements;
  *error_bound = h.error_bound;
  *datatype = h.datatype;
  return 0;
}

}  // extern "C"

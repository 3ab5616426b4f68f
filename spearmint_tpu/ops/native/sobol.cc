// Native Sobol sequence generator (gray-code construction).
//
// The framework's host-side native component (SURVEY.md §2a): the
// reference ships a ~1000-line FORTRAN-port Python Sobol
// (sobol_lib.py); this is the C++ equivalent of its
// i4_sobol_generate(dim, n, skip) role, exposed through ctypes
// (spearmint_tpu/ops/native.py) with a SciPy fallback for dimensions
// beyond the embedded direction-number table.
//
// Direction numbers: first dimension is the van der Corput sequence;
// higher dimensions use primitive polynomials over GF(2) with initial
// values from the standard Joe–Kuo table (public mathematical data).
//
// Build: make -C spearmint_tpu/ops/native   (produces libspearmint_native.so)

#include <cstdint>
#include <cstring>

#include "sobol_directions.h"

namespace {

// Joe–Kuo new-joe-kuo-6 table (dimension 1 is van der Corput and needs
// no entry); generated into sobol_directions.h by bin/gen_sobol_table.py.
using sobol_table::kDims;

constexpr int kMaxExtraDims = sizeof(kDims) / sizeof(kDims[0]);
constexpr int kBits = 32;

inline int count_trailing_zeros(uint64_t x) {
  int c = 0;
  while (!(x & 1)) {
    x >>= 1;
    ++c;
  }
  return c;
}

}  // namespace

extern "C" {

// Max dimensionality the native path supports (python falls back to
// SciPy beyond this).
int spearmint_sobol_max_dim() { return kMaxExtraDims + 1; }

// Fill out[n*dim] (row-major points) with the Sobol sequence, skipping
// the first `skip` points.  Returns 0 on success, -1 on bad args.
int spearmint_sobol(int dim, long n, long skip, double* out) {
  if (dim < 1 || dim > kMaxExtraDims + 1 || n < 0 || skip < 0) return -1;

  // direction integers per dimension
  uint32_t v[1 + kMaxExtraDims][kBits];
  for (int k = 0; k < kBits; ++k) v[0][k] = 1u << (kBits - 1 - k);
  for (int j = 1; j < dim; ++j) {
    const auto& d = kDims[j - 1];
    const int s = d.s;
    for (int k = 0; k < s; ++k) v[j][k] = d.m[k] << (kBits - 1 - k);
    for (int k = s; k < kBits; ++k) {
      uint32_t val = v[j][k - s] ^ (v[j][k - s] >> s);
      for (int i = 1; i < s; ++i) {
        if ((d.a >> (s - 1 - i)) & 1) val ^= v[j][k - i];
      }
      v[j][k] = val;
    }
  }

  uint32_t x[1 + kMaxExtraDims];
  std::memset(x, 0, sizeof(x));
  const double scale = 1.0 / 4294967296.0;  // 2^-32

  // advance through skipped points (gray-code update per step)
  for (long i = 0; i < skip; ++i) {
    const int c = count_trailing_zeros(~static_cast<uint64_t>(i));
    for (int j = 0; j < dim; ++j) x[j] ^= v[j][c];
  }
  for (long i = 0; i < n; ++i) {
    for (int j = 0; j < dim; ++j) out[i * dim + j] = x[j] * scale;
    const int c =
        count_trailing_zeros(~static_cast<uint64_t>(skip + i));
    for (int j = 0; j < dim; ++j) x[j] ^= v[j][c];
  }
  return 0;
}

}  // extern "C"

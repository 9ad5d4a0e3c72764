// fib_tf_tpu native toolchain — shared-library surface for ctypes.
//
// Exposes the table generator to Python without spawning a subprocess:
//   fib_table_rows() / fib_table_cols()   -> table geometry
//   fib_init_table(float* out)            -> fill rows*cols floats
//   fib_calc_inter(double v, double* out) -> 30 intermediates at V
//
// Loaded by fib_tf_tpu/utils/native.py via ctypes (no pybind11 in the
// image); built by the Makefile next to this file.

#include "model_traits.h"
#include "rates.h"

extern "C" {

int fib_table_rows() { return fib::CourtemancheTraits::kTableRows; }
int fib_table_cols() { return fib::CourtemancheTraits::kTableCols; }

void fib_init_table(float* out) {
  using Traits = fib::CourtemancheTraits;
  for (int r = 0; r < Traits::kTableRows; ++r) {
    const double v = static_cast<double>(r) - Traits::kVOffset;
    const auto inter = fib::computeIntermediates(v).as_array();
    for (int c = 0; c < Traits::kTableCols; ++c) {
      out[r * Traits::kTableCols + c] = static_cast<float>(inter[c]);
    }
  }
}

void fib_calc_inter(double v, double* out) {
  const auto inter = fib::computeIntermediates(v).as_array();
  for (std::size_t i = 0; i < inter.size(); ++i) out[i] = inter[i];
}

}  // extern "C"

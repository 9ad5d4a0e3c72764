// fib_tf_tpu native toolchain — offline lookup-table generator.
//
// Emits the Courtemanche rate table consumed by the TPU kernels
// (fib_tf_tpu/ops/table.py): kTableRows rows at 1 mV resolution starting at
// -kVOffset mV, kTableCols doubles per row, row-major, one value per line.
//
// Usage:
//   generate_table                 -> full table on stdout
//   generate_table <V>             -> the 30 intermediates at voltage V
//                                     (golden-value mode for tests)
//   generate_table --csv           -> CSV with a header row of column names

#include <cstdio>
#include <cstdlib>
#include <cstring>

#include "model_traits.h"
#include "rates.h"

namespace {

void printRow(double v, const char* sep) {
  const auto inter = fib::computeIntermediates(v).as_array();
  for (std::size_t i = 0; i < inter.size(); ++i) {
    std::printf("%.9g%s", inter[i], i + 1 < inter.size() ? sep : "\n");
  }
}

}  // namespace

int main(int argc, char** argv) {
  using Traits = fib::CourtemancheTraits;

  if (argc > 1 && std::strcmp(argv[1], "--csv") == 0) {
    for (std::size_t i = 0; i < fib::kInterNames.size(); ++i) {
      std::printf("%s%s", fib::kInterNames[i],
                  i + 1 < fib::kInterNames.size() ? "," : "\n");
    }
    for (int r = 0; r < Traits::kTableRows; ++r) {
      printRow(static_cast<double>(r) - Traits::kVOffset, ",");
    }
    return 0;
  }

  if (argc > 1) {  // golden-value mode: one voltage
    const double v = std::atof(argv[1]);
    const auto inter = fib::computeIntermediates(v).as_array();
    for (double x : inter) std::printf("%.9g\n", x);
    return 0;
  }

  for (int r = 0; r < Traits::kTableRows; ++r) {
    const double v = static_cast<double>(r) - Traits::kVOffset;
    const auto inter = fib::computeIntermediates(v).as_array();
    for (double x : inter) std::printf("%.9g\n", x);
  }
  return 0;
}

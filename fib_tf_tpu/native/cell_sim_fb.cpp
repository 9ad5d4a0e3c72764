// fib_tf_tpu native toolchain — 0D Fenton / Beeler-Reuter / Luo-Rudy cell
// simulator.
//
// Companion to cell_sim.cpp (Courtemanche): the native cross-check for the
// smaller models.  Output: one line per millisecond.
//
// Usage:
//   cell_sim_fb fenton <ms> <dt> <stim_u> [--ab2]        -> "t u v w s"
//   cell_sim_fb br <ms> <dt> <stim_mV> [--skip] [--ab2]  -> "t V C"
//   cell_sim_fb lr1 <ms> <dt> <stim_mV>                  -> "t V Cai"
//   cell_sim_fb tp06 <ms> <dt> <stim_mV>                 -> "t V Cai"

#include <cstdio>
#include <cstdlib>
#include <cstring>

#include "fenton_br.h"
#include "luo_rudy.h"
#include "tp06.h"

int main(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(stderr,
                 "usage: cell_sim_fb fenton|br <ms> <dt> <stim> [--skip]\n");
    return 2;
  }
  const bool is_br = std::strcmp(argv[1], "br") == 0;
  const bool is_lr = std::strcmp(argv[1], "lr1") == 0;
  const bool is_tp = std::strcmp(argv[1], "tp06") == 0;
  const double ms = std::atof(argv[2]);
  const double dt = std::atof(argv[3]);
  const double stim = std::atof(argv[4]);
  bool skip = false, ab2 = false;
  for (int a = 5; a < argc; ++a) {
    if (!std::strcmp(argv[a], "--skip")) skip = true;
    if (!std::strcmp(argv[a], "--ab2")) ab2 = true;
  }

  const long steps = static_cast<long>(ms / dt);
  const long per_ms = static_cast<long>(1.0 / dt);

  if (is_tp) {
    fib::TPState s = fib::tpInitial(stim);
    for (long i = 0; i < steps; ++i) {
      s = fib::tpStep(s, dt);
      if ((i + 1) % per_ms == 0)
        std::printf("%.1f %.6f %.8f\n", (i + 1) * dt, s.v, s.cai);
    }
  } else if (is_lr) {
    fib::LRState s = fib::lrInitial(stim);
    for (long i = 0; i < steps; ++i) {
      s = fib::lrStep(s, dt);
      if ((i + 1) % per_ms == 0)
        std::printf("%.1f %.6f %.8f\n", (i + 1) * dt, s.v, s.cai);
    }
  } else if (is_br) {
    fib::BRState s = fib::brInitial(stim);
    fib::BRDeriv prev = fib::brDerivative(s);  // AB2 bootstrap f_{-1} = f_0
    for (long i = 0; i < steps; ++i) {
      // the graph-level multi-rate pattern: groups of 5 substeps, slow
      // gates advanced 5*dt on the first substep only (br.py:98-107)
      const int n = skip ? ((i % 5 == 0) ? 5 : 0) : 1;
      s = ab2 ? fib::brStepAB2(s, &prev, dt, n) : fib::brStep(s, dt, n);
      if ((i + 1) % per_ms == 0)
        std::printf("%.1f %.6f %.8f\n", (i + 1) * dt, s.v, s.c);
    }
  } else {
    fib::Fenton4vState s = fib::fentonInitial(stim);
    fib::Fenton4vState prev = fib::fentonDerivative(s);
    for (long i = 0; i < steps; ++i) {
      s = ab2 ? fib::fentonStepAB2(s, &prev, dt)
              : fib::fentonStep(s, dt);
      if ((i + 1) % per_ms == 0)
        std::printf("%.1f %.6f %.6f %.6f %.6f\n", (i + 1) * dt, s.u, s.v,
                    s.w, s.s);
    }
  }
  return 0;
}

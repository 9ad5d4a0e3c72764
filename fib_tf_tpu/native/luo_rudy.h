// fib_tf_tpu native toolchain — Luo-Rudy 1991 cell dynamics.
//
// Independent C++ implementation of the phase-1 Luo-Rudy guinea-pig
// ventricular model (Luo & Rudy, Circ Res 1991;68:1501-1526) for the 0D
// cross-check harness (cell_sim_fb.cpp).  Written from the paper's rate
// table, not from the JAX model (models/luo_rudy.py) — the point of the
// cross-check is an independent derivation of the same published
// equations.  Double precision throughout; the Rush-Larsen gate update
// uses the zoo's parity form g + (g - g_inf)*expm1(-dt/tau) clipped to
// [1e-5, 0.99999] (reference ionic.py:115-123).

#pragma once

#include <cmath>

namespace fib {

struct LRState {
  double v, cai;
  double m, h, j, d, f, x;
};

struct LRRates {
  double a, b;  // alpha, beta (ms^-1)
};

namespace lr {

// membrane constants at T = 310 K, [K]o = 5.4, [K]i = 145, [Na]o = 140,
// [Na]i = 18 mM
constexpr double kRTF = 26.71;
constexpr double kPrNaK = 0.01833;
inline double eNa() { return kRTF * std::log(140.0 / 18.0); }
inline double eK() {
  return kRTF * std::log((5.4 + kPrNaK * 140.0) / (145.0 + kPrNaK * 18.0));
}
inline double eK1() { return kRTF * std::log(5.4 / 145.0); }

constexpr double kGNa = 23.0, kGSi = 0.09, kGKp = 0.0183;
constexpr double kGB = 0.03921, kEB = -59.87;
inline double gK() { return 0.282 * std::sqrt(5.4 / 5.4); }
inline double gK1() { return 0.6047 * std::sqrt(5.4 / 5.4); }

// -- rate table (paper p. 1510) ---------------------------------------------

inline LRRates rateM(double v) {
  const double dm = v + 47.13;
  const double a = std::fabs(dm) < 1e-3
                       ? 3.2
                       : 0.32 * dm / (1.0 - std::exp(-0.1 * dm));
  return {a, 0.08 * std::exp(-v / 11.0)};
}

inline LRRates rateH(double v) {
  if (v < -40.0)
    return {0.135 * std::exp(-(80.0 + v) / 6.8),
            3.56 * std::exp(0.079 * v) + 3.1e5 * std::exp(0.35 * v)};
  return {0.0, 1.0 / (0.13 * (1.0 + std::exp(-(v + 10.66) / 11.1)))};
}

inline LRRates rateJ(double v) {
  if (v < -40.0) {
    const double a =
        (-1.2714e5 * std::exp(0.2444 * v) -
         3.474e-5 * std::exp(-0.04391 * v)) *
        (v + 37.78) / (1.0 + std::exp(0.311 * (v + 79.23)));
    const double b = 0.1212 * std::exp(-0.01052 * v) /
                     (1.0 + std::exp(-0.1378 * (v + 40.14)));
    return {a, b};
  }
  return {0.0, 0.3 * std::exp(-2.535e-7 * v) /
                   (1.0 + std::exp(-0.1 * (v + 32.0)))};
}

inline LRRates rateD(double v) {
  return {0.095 * std::exp(-0.01 * (v - 5.0)) /
              (1.0 + std::exp(-0.072 * (v - 5.0))),
          0.07 * std::exp(-0.017 * (v + 44.0)) /
              (1.0 + std::exp(0.05 * (v + 44.0)))};
}

inline LRRates rateF(double v) {
  return {0.012 * std::exp(-0.008 * (v + 28.0)) /
              (1.0 + std::exp(0.15 * (v + 28.0))),
          0.0065 * std::exp(-0.02 * (v + 30.0)) /
              (1.0 + std::exp(-0.2 * (v + 30.0)))};
}

inline LRRates rateX(double v) {
  return {0.0005 * std::exp(0.083 * (v + 50.0)) /
              (1.0 + std::exp(0.057 * (v + 50.0))),
          0.0013 * std::exp(-0.06 * (v + 20.0)) /
              (1.0 + std::exp(-0.04 * (v + 20.0)))};
}

// time-independent inactivation of I_K; V = -77 singularity removable
inline double xiFactor(double v) {
  if (v <= -100.0) return 1.0;
  if (std::fabs(v + 77.0) < 1e-3) return 2.837 * 0.04 * std::exp(1.68);
  return 2.837 * (std::exp(0.04 * (v + 77.0)) - 1.0) /
         ((v + 77.0) * std::exp(0.04 * (v + 35.0)));
}

// instantaneous inward-rectifier activation alpha/(alpha+beta)
inline double k1Inf(double v) {
  const double dv = v - eK1();
  const double a = 1.02 / (1.0 + std::exp(0.2385 * (dv - 59.215)));
  const double b = (0.49124 * std::exp(0.08032 * (dv + 5.476)) +
                    std::exp(0.06175 * (dv - 594.31))) /
                   (1.0 + std::exp(-0.5143 * (dv + 4.753)));
  return a / (a + b);
}

inline double rushLarsen(double g, const LRRates& r, double dt) {
  const double inf = r.a / (r.a + r.b);
  const double tau = 1.0 / (r.a + r.b);
  const double g1 = g + (g - inf) * std::expm1(-dt / tau);
  return g1 < 1e-5 ? 1e-5 : (g1 > 0.99999 ? 0.99999 : g1);
}

}  // namespace lr

// rest at the paper's initial conditions with the V plane set to `stim`
// (the cross-check convention of brInitial: gates stay at their V=-84.5
// steady states, computed from the rate functions)
inline LRState lrInitial(double stim) {
  constexpr double v_rest = -84.5;
  LRState s{};
  s.v = stim;
  s.cai = 2e-4;
  auto ss = [](const LRRates& r) { return r.a / (r.a + r.b); };
  s.m = ss(lr::rateM(v_rest));
  s.h = ss(lr::rateH(v_rest));
  s.j = ss(lr::rateJ(v_rest));
  s.d = ss(lr::rateD(v_rest));
  s.f = ss(lr::rateF(v_rest));
  s.x = ss(lr::rateX(v_rest));
  return s;
}

// total membrane current from the PRE-update gates (the zoo's
// Beeler-Reuter ordering convention); *i_si_out feeds the Ca pool ODE
inline double lrCurrents(const LRState& s, double* i_si_out) {
  const double v = s.v;
  const double i_na =
      lr::kGNa * s.m * s.m * s.m * s.h * s.j * (v - lr::eNa());
  const double e_si = 7.7 - 13.0287 * std::log(s.cai);
  const double i_si = lr::kGSi * s.d * s.f * (v - e_si);
  const double i_k = lr::gK() * s.x * lr::xiFactor(v) * (v - lr::eK());
  const double i_k1 = lr::gK1() * lr::k1Inf(v) * (v - lr::eK1());
  const double kp = 1.0 / (1.0 + std::exp((7.488 - v) / 5.98));
  const double i_kp = lr::kGKp * kp * (v - lr::eK1());
  const double i_b = lr::kGB * (v - lr::kEB);
  *i_si_out = i_si;
  return i_na + i_si + i_k + i_k1 + i_kp + i_b;
}

// one substep: Rush-Larsen gates, explicit Euler on V and [Ca]i
inline LRState lrStep(const LRState& s, double dt) {
  LRState o = s;
  o.m = lr::rushLarsen(s.m, lr::rateM(s.v), dt);
  o.h = lr::rushLarsen(s.h, lr::rateH(s.v), dt);
  o.j = lr::rushLarsen(s.j, lr::rateJ(s.v), dt);
  o.d = lr::rushLarsen(s.d, lr::rateD(s.v), dt);
  o.f = lr::rushLarsen(s.f, lr::rateF(s.v), dt);
  o.x = lr::rushLarsen(s.x, lr::rateX(s.v), dt);
  double i_si;
  const double i_sum = lrCurrents(s, &i_si);
  o.v = s.v - dt * i_sum;
  o.cai = s.cai + dt * (-1e-4 * i_si + 0.07 * (1e-4 - s.cai));
  return o;
}

}  // namespace fib

// fib_tf_tpu native toolchain — ten Tusscher-Panfilov 2006 cell dynamics.
//
// Independent C++ implementation of the TP06 human ventricular model
// (ten Tusscher & Panfilov, Am J Physiol 291:H1088, 2006) for the 0D
// cross-check harness (cell_sim_fb.cpp).  Written from the paper's
// appendix equations, not from the JAX model (models/tp06.py) — the
// point of the cross-check is an independent derivation of the same
// published equations.  Double precision throughout; the Rush-Larsen
// update is the zoo's parity form g + (g - g_inf)*expm1(-dt/tau)
// clipped to [1e-5, 0.99999] (reference ionic.py:115-123), applied to
// the 12 voltage gates, the Ca-gated fCass, AND the release adaptation
// variable Rq (whose ODE is linear in Rq).  Epicardial parameter set.

#pragma once

#include <cmath>

namespace fib {

struct TPState {
  double v;
  double cai, casr, cass, nai, ki;
  double rq;
  double m, h, j, d, f, f2, fcass, r, s, xr1, xr2, xs;
};

namespace tp {

// physical constants at T = 310 K
constexpr double kRTF = 8314.472 * 310.0 / 96485.3415;
constexpr double kF_RT = 1.0 / kRTF;
constexpr double kFaraday = 96485.3415;

// milieu
constexpr double kKo = 5.4, kNao = 140.0, kCao = 2.0, kPkNa = 0.03;

// geometry / capacitance factor
constexpr double kCm = 0.185;
constexpr double kVc = 0.016404, kVsr = 0.001094, kVss = 0.00005468;

// conductances (epicardial set)
constexpr double kGNa = 14.838, kGK1 = 5.405, kGKr = 0.153;
constexpr double kGCaL = 3.980e-5, kGbNa = 0.00029, kGbCa = 0.000592;
constexpr double kGpCa = 0.1238, kKpCa = 0.0005, kGpK = 0.0146;
constexpr double kGto = 0.294, kGKs = 0.392;
constexpr double kPNaK = 2.724, kKmK = 1.0, kKmNa = 40.0;
constexpr double kKNaCa = 1000.0, kGamma = 0.35, kKmNai = 87.5;
constexpr double kKmCa = 1.38, kKsat = 0.1, kAlpha = 2.5;

// calcium subsystem
constexpr double kVrel = 0.102, kK1p = 0.15, kK2p = 0.045;
constexpr double kK3 = 0.060, kK4 = 0.005;
constexpr double kMaxSr = 2.5, kMinSr = 1.0, kEcSr = 1.5;
constexpr double kVleak = 0.00036, kVxfer = 0.0038;
constexpr double kVmaxUp = 0.006375, kKup = 0.00025;
constexpr double kBufC = 0.2, kKbufC = 0.001;
constexpr double kBufSr = 10.0, kKbufSr = 0.3;
constexpr double kBufSs = 0.4, kKbufSs = 0.00025;

struct InfTau {
  double inf, tau;
};

// -- voltage-gate rates (paper appendix) -------------------------------------

inline InfTau rateM(double v) {
  const double inf = std::pow(1.0 + std::exp((-56.86 - v) / 9.03), -2.0);
  const double a = 1.0 / (1.0 + std::exp((-60.0 - v) / 5.0));
  const double b = 0.1 / (1.0 + std::exp((v + 35.0) / 5.0)) +
                   0.1 / (1.0 + std::exp((v - 50.0) / 200.0));
  return {inf, a * b};
}

inline double hjInf(double v) {
  return std::pow(1.0 + std::exp((v + 71.55) / 7.43), -2.0);
}

inline InfTau rateH(double v) {
  double a, b;
  if (v < -40.0) {
    a = 0.057 * std::exp(-(v + 80.0) / 6.8);
    b = 2.7 * std::exp(0.079 * v) + 3.1e5 * std::exp(0.3485 * v);
  } else {
    a = 0.0;
    b = 0.77 / (0.13 * (1.0 + std::exp(-(v + 10.66) / 11.1)));
  }
  return {hjInf(v), 1.0 / (a + b)};
}

inline InfTau rateJ(double v) {
  double a, b;
  if (v < -40.0) {
    a = (-2.5428e4 * std::exp(0.2444 * v) -
         6.948e-6 * std::exp(-0.04391 * v)) *
        (v + 37.78) / (1.0 + std::exp(0.311 * (v + 79.23)));
    b = 0.02424 * std::exp(-0.01052 * v) /
        (1.0 + std::exp(-0.1378 * (v + 40.14)));
  } else {
    a = 0.0;
    b = 0.6 * std::exp(0.057 * v) / (1.0 + std::exp(-0.1 * (v + 32.0)));
  }
  return {hjInf(v), 1.0 / (a + b)};
}

inline InfTau rateXr1(double v) {
  const double inf = 1.0 / (1.0 + std::exp((-26.0 - v) / 7.0));
  const double a = 450.0 / (1.0 + std::exp((-45.0 - v) / 10.0));
  const double b = 6.0 / (1.0 + std::exp((v + 30.0) / 11.5));
  return {inf, a * b};
}

inline InfTau rateXr2(double v) {
  const double inf = 1.0 / (1.0 + std::exp((v + 88.0) / 24.0));
  const double a = 3.0 / (1.0 + std::exp((-60.0 - v) / 20.0));
  const double b = 1.12 / (1.0 + std::exp((v - 60.0) / 20.0));
  return {inf, a * b};
}

inline InfTau rateXs(double v) {
  const double inf = 1.0 / (1.0 + std::exp((-5.0 - v) / 14.0));
  const double a = 1400.0 / std::sqrt(1.0 + std::exp((5.0 - v) / 6.0));
  const double b = 1.0 / (1.0 + std::exp((v - 35.0) / 15.0));
  return {inf, a * b + 80.0};
}

inline InfTau rateR(double v) {
  const double inf = 1.0 / (1.0 + std::exp((20.0 - v) / 6.0));
  const double tau = 9.5 * std::exp(-(v + 40.0) * (v + 40.0) / 1800.0) + 0.8;
  return {inf, tau};
}

// epicardial s gate (the endo variant differs; the cross-check runs epi)
inline InfTau rateS(double v) {
  const double inf = 1.0 / (1.0 + std::exp((v + 20.0) / 5.0));
  const double tau = 85.0 * std::exp(-(v + 45.0) * (v + 45.0) / 320.0) +
                     5.0 / (1.0 + std::exp((v - 20.0) / 5.0)) + 3.0;
  return {inf, tau};
}

inline InfTau rateD(double v) {
  const double inf = 1.0 / (1.0 + std::exp((-8.0 - v) / 7.5));
  const double a = 1.4 / (1.0 + std::exp((-35.0 - v) / 13.0)) + 0.25;
  const double b = 1.4 / (1.0 + std::exp((v + 5.0) / 5.0));
  const double g = 1.0 / (1.0 + std::exp((50.0 - v) / 20.0));
  return {inf, a * b + g};
}

inline InfTau rateF(double v) {
  const double inf = 1.0 / (1.0 + std::exp((v + 20.0) / 7.0));
  const double tau = 1102.5 * std::exp(-(v + 27.0) * (v + 27.0) / 225.0) +
                     200.0 / (1.0 + std::exp((13.0 - v) / 10.0)) +
                     180.0 / (1.0 + std::exp((v + 30.0) / 10.0)) + 20.0;
  return {inf, tau};
}

inline InfTau rateF2(double v) {
  const double inf = 0.67 / (1.0 + std::exp((v + 35.0) / 7.0)) + 0.33;
  const double tau = 562.0 * std::exp(-(v + 27.0) * (v + 27.0) / 240.0) +
                     31.0 / (1.0 + std::exp((25.0 - v) / 10.0)) +
                     80.0 / (1.0 + std::exp((v + 30.0) / 10.0));
  return {inf, tau};
}

inline InfTau rateFCass(double cass) {
  const double sq = (cass / 0.05) * (cass / 0.05);
  return {0.6 / (1.0 + sq) + 0.4, 80.0 / (1.0 + sq) + 2.0};
}

// steady-state rectification of I_K1 (instantaneous)
inline double k1Inf(double v, double e_k) {
  const double dv = v - e_k;
  const double a = 0.1 / (1.0 + std::exp(0.06 * (dv - 200.0)));
  const double b = (3.0 * std::exp(0.0002 * (dv + 100.0)) +
                    std::exp(0.1 * (dv - 10.0))) /
                   (1.0 + std::exp(-0.5 * dv));
  return a / (a + b);
}

inline double rushLarsen(double g, const InfTau& r, double dt) {
  const double g1 = g + (g - r.inf) * std::expm1(-dt / r.tau);
  return g1 < 1e-5 ? 1e-5 : (g1 > 0.99999 ? 0.99999 : g1);
}

}  // namespace tp

// rest at the paper's initial conditions with the V plane set to `stim`
// (gates stay at their V=-86.2 steady states, fcass at its CaSS=7e-5
// steady state — the lrInitial convention)
inline TPState tpInitial(double stim) {
  constexpr double v_rest = -86.2;
  TPState s{};
  s.v = stim;
  s.cai = 7e-5;
  s.cass = 7e-5;
  s.casr = 1.3;
  s.nai = 7.67;
  s.ki = 138.3;
  s.rq = 1.0;
  s.m = tp::rateM(v_rest).inf;
  s.h = tp::rateH(v_rest).inf;
  s.j = tp::rateJ(v_rest).inf;
  s.d = tp::rateD(v_rest).inf;
  s.f = tp::rateF(v_rest).inf;
  s.f2 = tp::rateF2(v_rest).inf;
  s.fcass = tp::rateFCass(7e-5).inf;
  s.r = tp::rateR(v_rest).inf;
  s.s = tp::rateS(v_rest).inf;
  s.xr1 = tp::rateXr1(v_rest).inf;
  s.xr2 = tp::rateXr2(v_rest).inf;
  s.xs = tp::rateXs(v_rest).inf;
  return s;
}

struct TPCurrents {
  double i_na, i_b_na, i_cal, i_b_ca, i_to, i_kr, i_ks, i_k1, i_naca,
      i_nak, i_p_ca, i_p_k;
  double sum() const {
    return i_na + i_b_na + i_cal + i_b_ca + i_to + i_kr + i_ks + i_k1 +
           i_naca + i_nak + i_p_ca + i_p_k;
  }
};

// the twelve membrane currents from the PRE-update state (the zoo's
// Beeler-Reuter ordering convention)
inline TPCurrents tpCurrents(const TPState& s) {
  using namespace tp;
  const double v = s.v;
  TPCurrents c{};

  const double e_na = kRTF * std::log(kNao / s.nai);
  const double e_k = kRTF * std::log(kKo / s.ki);
  const double e_ks =
      kRTF * std::log((kKo + kPkNa * kNao) / (s.ki + kPkNa * s.nai));
  const double e_ca = 0.5 * kRTF * std::log(kCao / s.cai);

  c.i_na = kGNa * s.m * s.m * s.m * s.h * s.j * (v - e_na);
  c.i_b_na = kGbNa * (v - e_na);

  // L-type Ca: GHK-like driving term, removable singularity at V=15 mV
  const double x = 2.0 * (v - 15.0) * kF_RT;
  const double num = 0.25 * s.cass * std::exp(x) - kCao;
  const double drive = std::fabs(x) < 1e-4
                           ? 0.5 * kRTF * (0.25 * s.cass - kCao)
                           : (v - 15.0) * num / std::expm1(x);
  c.i_cal = kGCaL * s.d * s.f * s.f2 * s.fcass * 4.0 * kFaraday * kF_RT *
            drive;
  c.i_b_ca = kGbCa * (v - e_ca);

  c.i_to = kGto * s.r * s.s * (v - e_k);
  c.i_kr = kGKr * std::sqrt(kKo / 5.4) * s.xr1 * s.xr2 * (v - e_k);
  c.i_ks = kGKs * s.xs * s.xs * (v - e_ks);
  c.i_k1 = kGK1 * std::sqrt(kKo / 5.4) * k1Inf(v, e_k) * (v - e_k);

  const double evf = std::exp(kGamma * v * kF_RT);
  const double evf1 = std::exp((kGamma - 1.0) * v * kF_RT);
  c.i_naca = kKNaCa *
             (evf * s.nai * s.nai * s.nai * kCao -
              evf1 * kNao * kNao * kNao * s.cai * kAlpha) /
             ((kKmNai * kKmNai * kKmNai + kNao * kNao * kNao) *
              (kKmCa + kCao) * (1.0 + kKsat * evf1));
  c.i_nak = kPNaK * kKo * s.nai /
            ((kKo + kKmK) * (s.nai + kKmNa) *
             (1.0 + 0.1245 * std::exp(-0.1 * v * kF_RT) +
              0.0353 * std::exp(-v * kF_RT)));
  c.i_p_ca = kGpCa * s.cai / (kKpCa + s.cai);
  c.i_p_k = kGpK * (v - e_k) / (1.0 + std::exp((25.0 - v) / 5.98));
  return c;
}

// one substep: Rush-Larsen on the 12 gates + fCass + Rq, explicit Euler
// on V and the four ionic pools with instantaneous-buffer scaling
inline TPState tpStep(const TPState& s, double dt) {
  using namespace tp;
  TPState o = s;

  o.m = rushLarsen(s.m, rateM(s.v), dt);
  o.h = rushLarsen(s.h, rateH(s.v), dt);
  o.j = rushLarsen(s.j, rateJ(s.v), dt);
  o.d = rushLarsen(s.d, rateD(s.v), dt);
  o.f = rushLarsen(s.f, rateF(s.v), dt);
  o.f2 = rushLarsen(s.f2, rateF2(s.v), dt);
  o.fcass = rushLarsen(s.fcass, rateFCass(s.cass), dt);
  o.r = rushLarsen(s.r, rateR(s.v), dt);
  o.s = rushLarsen(s.s, rateS(s.v), dt);
  o.xr1 = rushLarsen(s.xr1, rateXr1(s.v), dt);
  o.xr2 = rushLarsen(s.xr2, rateXr2(s.v), dt);
  o.xs = rushLarsen(s.xs, rateXs(s.v), dt);

  const TPCurrents c = tpCurrents(s);

  // SR release with CaSR-gated rates; dRq/dt = -k2 CaSS Rq + k4 (1-Rq)
  // is linear in Rq -> the exact Rush-Larsen update
  const double kcasr =
      kMaxSr - (kMaxSr - kMinSr) /
                   (1.0 + (kEcSr / s.casr) * (kEcSr / s.casr));
  const double k1 = kK1p / kcasr;
  const double k2 = kK2p * kcasr;
  const double rq_tau = 1.0 / (k2 * s.cass + kK4);
  o.rq = rushLarsen(s.rq, {kK4 * rq_tau, rq_tau}, dt);
  const double o_gate =
      k1 * s.cass * s.cass * s.rq / (kK3 + k1 * s.cass * s.cass);
  const double i_rel = kVrel * o_gate * (s.casr - s.cass);
  const double i_leak = kVleak * (s.casr - s.cai);
  const double i_up =
      kVmaxUp / (1.0 + (kKup / s.cai) * (kKup / s.cai));
  const double i_xfer = kVxfer * (s.cass - s.cai);

  const double buf_c =
      1.0 / (1.0 + kBufC * kKbufC / ((s.cai + kKbufC) * (s.cai + kKbufC)));
  const double buf_sr =
      1.0 /
      (1.0 + kBufSr * kKbufSr / ((s.casr + kKbufSr) * (s.casr + kKbufSr)));
  const double buf_ss =
      1.0 /
      (1.0 + kBufSs * kKbufSs / ((s.cass + kKbufSs) * (s.cass + kKbufSs)));

  const double cm_2vcf = kCm / (2.0 * kVc * kFaraday);
  o.cai = s.cai + dt * buf_c *
                      ((i_leak - i_up) * kVsr / kVc + i_xfer -
                       (c.i_b_ca + c.i_p_ca - 2.0 * c.i_naca) * cm_2vcf);
  o.casr = s.casr + dt * buf_sr * (i_up - i_rel - i_leak);
  o.cass = s.cass + dt * buf_ss *
                        (-c.i_cal * kCm / (2.0 * kVss * kFaraday) +
                         i_rel * kVsr / kVss - i_xfer * kVc / kVss);
  o.nai = s.nai + dt * (-(c.i_na + c.i_b_na + 3.0 * c.i_nak +
                          3.0 * c.i_naca) *
                        kCm / (kVc * kFaraday));
  o.ki = s.ki + dt * (-(c.i_k1 + c.i_to + c.i_kr + c.i_ks + c.i_p_k -
                        2.0 * c.i_nak) *
                      kCm / (kVc * kFaraday));

  o.v = s.v - dt * c.sum();
  return o;
}

}  // namespace fib

// fib_tf_tpu native toolchain — Fenton 4v and Beeler-Reuter cell dynamics.
//
// Independent C++ implementations of the two smaller models for the 0D
// cross-check harness (cell_sim_fb.cpp): the 4-variable
// Cherry-Ehrlich-Nattel-Fenton left-atrial model (Cherry et al., Heart
// Rhythm 2007) and the modified 8-variable Beeler-Reuter ventricular
// model (Beeler & Reuter, J Physiol 1977; d/f rate prefactors doubled for
// spiral inducibility, matching the JAX model in
// models/beeler_reuter.py).

#pragma once

#include <array>
#include <cmath>

namespace fib {

// ---------------------------------------------------------------------------
// Fenton 4v
// ---------------------------------------------------------------------------

struct Fenton4vState {
  double u, v, w, s;
};

inline Fenton4vState fentonInitial(double stim) {
  return {stim, 1.0, 1.0, 0.0};
}

// step functions with H(0) = G(0) = 0.5, matching the sign()-based forms
inline double stepH(double x) { return x > 0 ? 1.0 : (x < 0 ? 0.0 : 0.5); }
inline double stepG(double x) { return 1.0 - stepH(x); }

inline Fenton4vState fentonDerivative(const Fenton4vState& st) {
  constexpr double tau_vp = 3.33, tau_vn = 19.2;
  constexpr double tau_wp = 160.0, tau_wn1 = 75.0, tau_wn2 = 75.0;
  constexpr double tau_d = 0.065, tau_si = 31.8364, tau_so = tau_si;
  constexpr double tau_a = 0.009;
  constexpr double u_c = 0.23, u_w = 0.146, u_0 = 0.0, u_m = 1.0;
  constexpr double u_csi = 0.8, u_so = 0.3;
  constexpr double r_sp = 0.02, r_sn = 1.2, k = 3.0;
  constexpr double a_so = 0.115, b_so = 0.84, c_so = 0.02;

  const double u = st.u, v = st.v, w = st.w, s = st.s;
  const double i_fi = -v * stepH(u - u_c) * (u - u_c) * (u_m - u) / tau_d;
  const double i_si = -w * s / tau_si;
  const double i_so = 0.5 * (a_so - tau_a) * (1.0 + std::tanh((u - b_so) / c_so))
                    + (u - u_0) * stepG(u - u_so) / tau_so
                    + stepH(u - u_so) * tau_a;

  Fenton4vState d{};
  d.u = -(i_fi + i_si + i_so);
  d.v = (u > u_c) ? -v / tau_vp : (1.0 - v) / tau_vn;
  d.w = (u > u_c) ? -w / tau_wp
                  : ((u > u_w) ? (1.0 - w) / tau_wn2 : (1.0 - w) / tau_wn1);
  const double r_s = (r_sp - r_sn) * stepH(u - u_c) + r_sn;
  d.s = r_s * (0.5 * (1.0 + std::tanh((u - u_csi) * k)) - s);
  return d;
}

inline Fenton4vState fentonStep(const Fenton4vState& st, double dt) {
  const auto d = fentonDerivative(st);
  return {st.u + dt * d.u, st.v + dt * d.v, st.w + dt * d.w,
          st.s + dt * d.s};
}

// Adams-Bashforth-2 variant (the scheme the reference's ionic.h:15-19
// reserves 2x-VARIABLES storage for behind #ifdef ADAMS_BASHFORTH).
// `prev` carries f_{n-1} and is updated in place; bootstrap it with
// fentonDerivative(initial state) so the first step reduces to Euler —
// the same convention as the JAX models (models/fenton.py).
inline Fenton4vState fentonStepAB2(const Fenton4vState& st,
                                   Fenton4vState* prev, double dt) {
  const auto d = fentonDerivative(st);
  Fenton4vState out{
      st.u + dt * (1.5 * d.u - 0.5 * prev->u),
      st.v + dt * (1.5 * d.v - 0.5 * prev->v),
      st.w + dt * (1.5 * d.w - 0.5 * prev->w),
      st.s + dt * (1.5 * d.s - 0.5 * prev->s),
  };
  *prev = d;
  return out;
}

// ---------------------------------------------------------------------------
// Beeler-Reuter (modified)
// ---------------------------------------------------------------------------

struct BRState {
  double v, c;                      // potential, Ca concentration
  double x1, m, h, j, d, f;         // gates
};

inline BRState brInitial(double stim) {
  BRState s{};
  s.v = stim;
  s.c = 1e-4;
  s.m = 0.01; s.h = 0.988; s.j = 0.975;
  s.d = 0.003; s.f = 0.994; s.x1 = 0.0001;
  return s;
}

// rational-exponential rate: (c0 e^{c1(v+c2)} + c3(v+c4)) / (e^{c5(v+c2)} + c6)
inline double brRate(double v, const std::array<double, 7>& c) {
  return (c[0] * std::exp(c[1] * (v + c[2])) + c[3] * (v + c[4])) /
         (std::exp(c[5] * (v + c[2])) + c[6]);
}

struct GateParams {
  std::array<double, 7> a, b;
};

// Beeler & Reuter 1977 Table 1, with the x2 d/f modification
inline const GateParams& brGate(int g) {
  static const GateParams gp[6] = {
      /* x1 */ {{0.0005, 0.083, 50.0, 0, 0, 0.057, 1.0},
                {0.0013, -0.06, 20.0, 0, 0, -0.04, 1.0}},
      /* m  */ {{0.0, 0.0, 47.0, -1.0, 47.0, -0.1, -1.0},
                {40.0, -0.056, 72.0, 0, 0, 0, 0}},
      /* h  */ {{0.126, -0.25, 77.0, 0, 0, 0, 0},
                {1.7, 0.0, 22.5, 0, 0, -0.082, 1.0}},
      /* j  */ {{0.055, -0.25, 78.0, 0, 0, -0.2, 1.0},
                {0.3, 0.0, 32.0, 0, 0, -0.1, 1.0}},
      /* d  */ {{2 * 0.095, -0.01, -5.0, 0, 0, -0.072, 1.0},
                {2 * 0.07, -0.017, 44.0, 0, 0, 0.05, 1.0}},
      /* f  */ {{2 * 0.012, -0.008, 28.0, 0, 0, 0.15, 1.0},
                {2 * 0.0065, -0.02, 30.0, 0, 0, -0.2, 1.0}},
  };
  return gp[g];
}

inline double brRushLarsen(double g, double v, int gate, double dt) {
  const auto& p = brGate(gate);
  const double a = brRate(v, p.a);
  const double b = brRate(v, p.b);
  const double inf = a / (a + b);
  const double tau = 1.0 / (a + b);
  const double g1 = g + (g - inf) * std::expm1(-dt / tau);
  return g1 < 1e-5 ? 1e-5 : (g1 > 0.99999 ? 0.99999 : g1);
}

enum BRGate { G_X1 = 0, G_M, G_H, G_J, G_D, G_F };

// Membrane currents from the PRE-update gates: reference br.py:160-168
// feeds M/H/J/D/F/XI — not M1... — into ix1/iNa/iCa.  Returns the total;
// *i_ca_out gets the slow inward current (the Ca ODE needs it).
inline double brCurrents(const BRState& s, double* i_ca_out) {
  constexpr double g_s = 0.09, g_na = 4.0, g_nac = 0.005, e_na = 50.0;
  const double v = s.v;
  const double i_k1 = 0.35 * (
      4.0 * (std::exp(0.04 * (v + 85.0)) - 1.0) /
          (std::exp(0.08 * (v + 53.0)) + std::exp(0.04 * (v + 53.0))) +
      0.2 * ((v + 23.0) / (1.0 - std::exp(-0.04 * (v + 23.0)))));
  const double i_x1 = s.x1 * 0.8 * (std::exp(0.04 * (v + 77.0)) - 1.0) /
                      std::exp(0.04 * (v + 35.0));
  const double i_na =
      (g_na * s.m * s.m * s.m * s.h * s.j + g_nac) * (v - e_na);
  const double e_ca = -82.3 - 13.0278 * std::log(s.c);
  const double i_ca = g_s * s.d * s.f * (v - e_ca);
  *i_ca_out = i_ca;
  return i_k1 + i_x1 + i_na + i_ca;
}

// the Rush-Larsen gate block shared by both integrators; n = dt multiples
// for the slow gates (0 = frozen)
inline void brAdvanceGates(const BRState& s, BRState* o, double dt, int n) {
  o->m = brRushLarsen(s.m, s.v, G_M, dt);
  o->h = brRushLarsen(s.h, s.v, G_H, dt);
  if (n > 0) {
    o->x1 = brRushLarsen(s.x1, s.v, G_X1, dt * n);
    o->j = brRushLarsen(s.j, s.v, G_J, dt * n);
    o->d = brRushLarsen(s.d, s.v, G_D, dt * n);
    o->f = brRushLarsen(s.f, s.v, G_F, dt * n);
  }
}

inline double brClipV(double v) {
  return v < -85.0 ? -85.0 : (v > 25.0 ? 25.0 : v);
}

// one substep; n = dt multiples for the slow gates (0 = frozen)
inline BRState brStep(const BRState& s, double dt, int n) {
  BRState o = s;
  brAdvanceGates(s, &o, dt, n);
  double i_ca;
  const double i_sum = brCurrents(s, &i_ca);
  o.v = brClipV(s.v - dt * i_sum);
  o.c = s.c + dt * (-1.0e-7 * i_ca + 0.07 * (1.0e-7 - s.c));
  return o;
}

// Adams-Bashforth-2 on the Euler-updated planes (V, Ca); gates stay
// Rush-Larsen.  `prev` carries {dv, dc} = f_{n-1}; bootstrap it with
// brDerivative(initial state), matching models/beeler_reuter.py.
struct BRDeriv {
  double dv, dc;
};

inline BRDeriv brDerivative(const BRState& s) {
  double i_ca;
  const double i_sum = brCurrents(s, &i_ca);
  return {-i_sum, -1.0e-7 * i_ca + 0.07 * (1.0e-7 - s.c)};
}

inline BRState brStepAB2(const BRState& s, BRDeriv* prev, double dt, int n) {
  BRState o = s;
  brAdvanceGates(s, &o, dt, n);
  const BRDeriv d = brDerivative(s);
  o.v = brClipV(s.v + dt * (1.5 * d.dv - 0.5 * prev->dv));
  o.c = s.c + dt * (1.5 * d.dc - 0.5 * prev->dc);
  *prev = d;
  return o;
}

}  // namespace fib

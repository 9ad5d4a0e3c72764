// fib_tf_tpu native toolchain — Courtemanche voltage-dependent rate
// functions.
//
// Independent C++ implementation of the 30 voltage-dependent intermediates
// of the Courtemanche-Ramirez-Nattel 1998 human atrial model, used by the
// offline lookup-table generator (generate_table.cpp).  The table layout
// (150 rows at 1 mV from -100 mV, 30 columns in the order of
// kInterNames) matches what the TPU kernels consume via
// fib_tf_tpu/ops/table.py, and what the reference's native path used
// (see /root/reference/courtemanche.h:473-479 for the behavior being
// reproduced; this file is written from the published model equations,
// not copied).
//
// The Python implementation (fib_tf_tpu/models/courtemanche.py
// calc_intermediates) is the primary source of truth; tests cross-check
// this generator against it to 1e-5 relative tolerance.

#pragma once

#include <array>
#include <cmath>
#include <cstddef>

namespace fib {

// ---- membrane / exchanger constants (Courtemanche et al. 1998) -----------
constexpr double kR = 8.3143;        // J/(mol K)
constexpr double kT = 310.0;         // K
constexpr double kF = 96.4867;       // C/mmol
constexpr double kCm = 100.0;        // pF
constexpr double kNaO = 140.0;       // mM
constexpr double kGK1 = 0.09;
constexpr double kKQ10 = 3.0;
constexpr double kGKr = 0.029411765;
constexpr double kCaO = 1.8;         // mM
constexpr double kINaCaMax = 1600.0;
constexpr double kKmNa = 87.5;
constexpr double kKmCa = 1.38;
constexpr double kKsat = 0.1;
constexpr double kGamma = 0.35;
constexpr double kSigma = 1.0;

constexpr double kRT = kR * kT;

// Column order of the generated table; must match
// fib_tf_tpu.models.courtemanche.INTER_KEYS.
inline constexpr std::array<const char*, 30> kInterNames = {
    "d_infinity", "f_infinity", "tau_w",       "tau_d",       "tau_f",
    "w_infinity", "m_inf",      "h_inf",       "j_inf",       "tau_oa",
    "tau_oi",     "tau_ua",     "tau_ui",      "tau_xr",      "tau_xs",
    "tau_m",      "tau_h",      "tau_j",       "oa_infinity", "oi_infinity",
    "ua_infinity", "ui_infinity", "xr_infinity", "xs_infinity", "g_Kur",
    "f_NaK",      "i_NaCaa",    "i_NaCab",     "i_K1a",       "i_Kra",
};

struct Intermediates {
  double d_infinity, f_infinity, tau_w, tau_d, tau_f, w_infinity;
  double m_inf, h_inf, j_inf;
  double tau_oa, tau_oi, tau_ua, tau_ui, tau_xr, tau_xs;
  double tau_m, tau_h, tau_j;
  double oa_infinity, oi_infinity, ua_infinity, ui_infinity;
  double xr_infinity, xs_infinity;
  double g_Kur, f_NaK, i_NaCaa, i_NaCab, i_K1a, i_Kra;

  static Intermediates from_array(const std::array<double, 30>& a) {
    Intermediates o{};
    o.d_infinity = a[0]; o.f_infinity = a[1]; o.tau_w = a[2];
    o.tau_d = a[3]; o.tau_f = a[4]; o.w_infinity = a[5];
    o.m_inf = a[6]; o.h_inf = a[7]; o.j_inf = a[8];
    o.tau_oa = a[9]; o.tau_oi = a[10]; o.tau_ua = a[11]; o.tau_ui = a[12];
    o.tau_xr = a[13]; o.tau_xs = a[14];
    o.tau_m = a[15]; o.tau_h = a[16]; o.tau_j = a[17];
    o.oa_infinity = a[18]; o.oi_infinity = a[19];
    o.ua_infinity = a[20]; o.ui_infinity = a[21];
    o.xr_infinity = a[22]; o.xs_infinity = a[23];
    o.g_Kur = a[24]; o.f_NaK = a[25];
    o.i_NaCaa = a[26]; o.i_NaCab = a[27];
    o.i_K1a = a[28]; o.i_Kra = a[29];
    return o;
  }

  std::array<double, 30> as_array() const {
    return {d_infinity, f_infinity, tau_w,       tau_d,       tau_f,
            w_infinity, m_inf,      h_inf,       j_inf,       tau_oa,
            tau_oi,     tau_ua,     tau_ui,      tau_xr,      tau_xs,
            tau_m,      tau_h,      tau_j,       oa_infinity, oi_infinity,
            ua_infinity, ui_infinity, xr_infinity, xs_infinity, g_Kur,
            f_NaK,      i_NaCaa,    i_NaCab,     i_K1a,       i_Kra};
  }
};

inline double sigmoid(double x) { return 1.0 / (1.0 + std::exp(-x)); }

// L-type Ca channel d gate
inline void dGate(double v, Intermediates& out) {
  out.d_infinity = sigmoid((v + 10.0) / 8.0);
  if (std::fabs(v + 10.0) < 1.0e-10) {
    out.tau_d = 4.579 / (1.0 + std::exp((v + 10.0) / -6.24));
  } else {
    const double e = std::exp((v + 10.0) / -6.24);
    out.tau_d = (1.0 - e) / (0.035 * (v + 10.0) * (1.0 + e));
  }
}

// L-type Ca channel f gate
inline void fGate(double v, Intermediates& out) {
  out.f_infinity = sigmoid(-(v + 28.0) / 6.9);
  const double g = 0.0337 * (v + 10.0);
  out.tau_f = 9.0 / (0.0197 * std::exp(-g * g) + 0.02);
}

// SR release w gate
inline void wGate(double v, Intermediates& out) {
  if (std::fabs(v - 7.9) < 1.0e-10) {
    out.tau_w = (6.0 * 0.2) / 1.3;
  } else {
    const double e = std::exp(-(v - 7.9) / 5.0);
    out.tau_w = (6.0 * (1.0 - e)) / ((1.0 + 0.3 * e) * (v - 7.9));
  }
  out.w_infinity = 1.0 - sigmoid((v - 40.0) / 17.0);
}

// fast Na m/h/j gates (Luo-Rudy style rate branches)
inline void sodiumGates(double v, Intermediates& out) {
  const double am = (std::fabs(v + 47.13) < 0.001)
                        ? 3.2
                        : (0.32 * (v + 47.13)) /
                              (1.0 - std::exp(-0.1 * (v + 47.13)));
  const double bm = 0.08 * std::exp(-v / 11.0);
  out.m_inf = am / (am + bm);
  out.tau_m = 1.0 / (am + bm);

  const bool sub = v < -40.0;
  const double ah = sub ? 0.135 * std::exp((v + 80.0) / -6.8) : 0.0;
  const double bh =
      sub ? 3.56 * std::exp(0.079 * v) + 310000.0 * std::exp(0.35 * v)
          : 1.0 / (0.13 * (1.0 + std::exp((v + 10.66) / -11.1)));
  out.h_inf = ah / (ah + bh);
  out.tau_h = 1.0 / (ah + bh);

  const double aj =
      sub ? ((-127140.0 * std::exp(0.2444 * v) -
              3.474e-05 * std::exp(-0.04391 * v)) *
             (v + 37.78)) /
                (1.0 + std::exp(0.311 * (v + 79.23)))
          : 0.0;
  const double bj =
      sub ? (0.1212 * std::exp(-0.01052 * v)) /
                (1.0 + std::exp(-0.1378 * (v + 40.14)))
          : (0.3 * std::exp(-2.535e-07 * v)) /
                (1.0 + std::exp(-0.1 * (v + 32.0)));
  out.j_inf = aj / (aj + bj);
  out.tau_j = 1.0 / (aj + bj);
}

// transient outward (oa/oi) and ultrarapid (ua/ui) K gates; both use the
// shifted voltage (v + 10)
inline void potassiumGates(double v, Intermediates& out) {
  const double vs = v + 10.0;

  const double aoa =
      0.65 / (std::exp(vs / -8.5) + std::exp((vs - 40.0) / -59.0));
  const double boa = 0.65 / (2.5 + std::exp((vs + 72.0) / 17.0));
  out.tau_oa = 1.0 / (aoa + boa) / kKQ10;
  out.oa_infinity = sigmoid(-(vs + 10.47) / -17.54);

  const double aoi = 1.0 / (18.53 + std::exp((vs + 103.7) / 10.95));
  const double boi = 1.0 / (35.56 + std::exp((vs - 8.74) / -7.44));
  out.tau_oi = 1.0 / (aoi + boi) / kKQ10;
  out.oi_infinity = 1.0 / (1.0 + std::exp((vs + 33.1) / 5.3));

  const double aua =
      0.65 / (std::exp(vs / -8.5) + std::exp((vs - 40.0) / -59.0));
  const double bua = 0.65 / (2.5 + std::exp((vs + 72.0) / 17.0));
  out.tau_ua = 1.0 / (aua + bua) / kKQ10;
  out.ua_infinity = 1.0 / (1.0 + std::exp((vs + 20.3) / -9.6));

  const double aui = 1.0 / (21.0 + std::exp((vs - 195.0) / -28.0));
  const double bui = std::exp((vs - 168.0) / 16.0);
  out.tau_ui = 1.0 / (aui + bui) / kKQ10;
  out.ui_infinity = 1.0 / (1.0 + std::exp((vs - 109.45) / 27.48));
}

// delayed rectifier xr/xs gates
inline void rectifierGates(double v, Intermediates& out) {
  const double axr =
      (std::fabs(v + 14.1) < 1.0e-10)
          ? 0.0015
          : (0.0003 * (v + 14.1)) / (1.0 - std::exp((v + 14.1) / -5.0));
  const double bxr =
      (std::fabs(v - 3.3328) < 1.0e-10)
          ? 0.000378361
          : (7.3898e-05 * (v - 3.3328)) /
                (std::exp((v - 3.3328) / 5.1237) - 1.0);
  out.tau_xr = 1.0 / (axr + bxr);
  out.xr_infinity = 1.0 / (1.0 + std::exp((v + 14.1) / -6.5));

  const double axs =
      (std::fabs(v - 19.9) < 1.0e-10)
          ? 0.00068
          : (4.0e-05 * (v - 19.9)) / (1.0 - std::exp((v - 19.9) / -17.0));
  const double bxs =
      (std::fabs(v - 19.9) < 1.0e-10)
          ? 0.000315
          : (3.5e-05 * (v - 19.9)) / (std::exp((v - 19.9) / 9.0) - 1.0);
  out.tau_xs = 0.5 / (axs + bxs);
  out.xs_infinity = std::sqrt(1.0 / (1.0 + std::exp((v - 19.9) / -12.7)));
}

// voltage-only parts of the pump/exchanger/background currents
inline void currentPrefactors(double v, Intermediates& out) {
  out.g_Kur = 0.005 + 0.05 / (1.0 + std::exp((v - 15.0) / -13.0));

  out.f_NaK = 1.0 / (1.0 + 0.1245 * std::exp((-0.1 * kF * v) / kRT) +
                     0.0365 * kSigma * std::exp((-kF * v) / kRT));

  const double kmna3 = kKmNa * kKmNa * kKmNa;
  const double nao3 = kNaO * kNaO * kNaO;
  const double den = (kmna3 + nao3) * (kKmCa + kCaO) *
                     (1.0 + kKsat * std::exp(((kGamma - 1.0) * v * kF) / kRT));
  out.i_NaCaa =
      (kCm * kINaCaMax * (std::exp((kGamma * kF * v) / kRT) * kCaO)) / den;
  out.i_NaCab = (kCm * kINaCaMax *
                 (std::exp(((kGamma - 1.0) * kF * v) / kRT) * nao3)) /
                den;

  out.i_K1a = (kCm * kGK1) / (1.0 + std::exp(0.07 * (v + 80.0)));
  out.i_Kra = (kCm * kGKr) / (1.0 + std::exp((v + 15.0) / 22.4));
}

inline Intermediates computeIntermediates(double v) {
  Intermediates out{};
  dGate(v, out);
  fGate(v, out);
  wGate(v, out);
  sodiumGates(v, out);
  potassiumGates(v, out);
  rectifierGates(v, out);
  currentPrefactors(v, out);
  return out;
}

}  // namespace fib

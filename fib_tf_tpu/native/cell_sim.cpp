// fib_tf_tpu native toolchain — 0D Courtemanche cell simulator.
//
// A standalone C++ reference integrator for the 21-variable Courtemanche
// model: Rush-Larsen (NSFD expm1 form, clipped like the Python path) for
// the gates, forward Euler for the concentrations, optional fast/slow
// multi-rate (fast = {V, Na_i, m, h} every dt; slow every 10th step with
// 10*dt, recomputed after the fast commit — the same schedule the Python
// engine fuses into its outer step).
//
// Role: the native-side ground truth for cross-checking the JAX model
// (tests/test_native.py), playing the part the reference's CUDA
// deriv<Courtemanche> + Config played in its native path.  Written from
// the published model equations / the Python implementation in
// models/courtemanche.py, with rates from rates.h.
//
// Usage: cell_sim <ms> <dt> <stim_mV> [--multirate] [--table] [--chronic 0|1]
// Output: one line per millisecond: "t_ms V Na_i Ca_i"

#include <array>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "model_traits.h"
#include "rates.h"

namespace {

struct Config {
  double dt = 0.1;
  double diff = 0.0;             // 0D cell: no diffusion term
  // fiber direction for anisotropic conduction (reference common.h:21-24
  // carried a float3 `normal`; the 2D framework realization is
  // SimConfig.fiber_angle/fiber_ratio — unused in this 0D harness but
  // kept for Config-surface parity)
  double normal[3] = {1.0, 0.0, 0.0};
  bool chronic = true;
  bool multirate = false;
  bool use_table = false;
  const float* table = nullptr;  // 150x30, 1 mV rows from -100 mV
};

enum S {
  V = 0, Na_i, m, h, j, K_i, oa, oi, ua, ui, xr, xs,
  Ca_i, d, f, f_Ca, Ca_rel, u_gate, v_gate, w_gate, Ca_up,
  N_STATES
};

using State = std::array<double, N_STATES>;

State initial_state(double stim) {
  State s{};
  s[V] = stim;
  s[Na_i] = 1.117e+01; s[m] = 2.98e-3; s[h] = 9.649e-1; s[j] = 9.775e-1;
  s[K_i] = 1.39e+02; s[oa] = 3.043e-2; s[oi] = 9.992e-1;
  s[ua] = 4.966e-3; s[ui] = 9.986e-1; s[xr] = 3.296e-5; s[xs] = 1.869e-2;
  s[Ca_i] = 1.013e-4; s[d] = 1.367e-4; s[f] = 9.996e-1; s[f_Ca] = 7.755e-1;
  s[Ca_rel] = 1.488; s[u_gate] = 0.0; s[v_gate] = 1.0; s[w_gate] = 0.9992;
  s[Ca_up] = 1.488;
  return s;
}

double rush_larsen(double g, double g_inf, double tau, double dt) {
  const double g1 = g + (g - g_inf) * std::expm1(-dt / tau);
  return g1 < 1e-5 ? 1e-5 : (g1 > 0.99999 ? 0.99999 : g1);
}

fib::Intermediates get_inter(const Config& cfg, double v) {
  if (cfg.use_table && cfg.table) {
    using T = fib::CourtemancheTraits;
    int i = static_cast<int>(v + T::kVOffset);
    i = i < 0 ? 0 : (i >= T::kTableRows ? T::kTableRows - 1 : i);
    const float* row = &cfg.table[i * T::kTableCols];
    std::array<double, 30> a{};
    for (int c = 0; c < 30; ++c) a[c] = row[c];
    return fib::Intermediates::from_array(a);
  }
  return fib::computeIntermediates(v);
}

// one evaluation of the full right-hand side; returns the candidate new
// state with per-state step dt_fast for fast states, dt_slow for the rest
State advance(const Config& cfg, const State& s, double dt_fast,
              double dt_slow) {
  // membrane / Ca-handling constants (Courtemanche et al. 1998)
  constexpr double R = 8.3143, T = 310.0, F = 96.4867, Cm = 100.0;
  constexpr double g_Na = 7.8, Na_o = 140.0, K_o = 5.4;
  constexpr double g_to = 0.1652, g_Ks = 0.12941176, g_Ca_L = 0.12375;
  constexpr double Km_Na_i = 10.0, Km_K_o = 1.5, i_NaK_max = 0.59933874;
  constexpr double i_CaP_max = 0.275;
  constexpr double g_B_Na = 0.0006744375, g_B_Ca = 0.001131, g_B_K = 0.0;
  constexpr double Ca_o = 1.8, K_rel = 30.0, tau_tr = 180.0;
  constexpr double I_up_max = 0.005, K_up = 0.00092, Ca_up_max = 15.0;
  constexpr double CMDN_max = 0.05, TRPN_max = 0.07, CSQN_max = 10.0;
  constexpr double Km_CMDN = 0.00238, Km_TRPN = 0.0005, Km_CSQN = 0.8;
  constexpr double V_cell = 20100.0, V_i = V_cell * 0.68;
  constexpr double tau_f_Ca = 2.0, tau_u = 8.0;
  constexpr double V_rel = 0.0048 * V_cell, V_up = 0.0552 * V_cell;
  const double rt_f = (R * T) / F;
  const double chronic = cfg.chronic ? 1.0 : 0.0;

  const double v = s[V];
  const auto in = get_inter(cfg, v);

  State o = s;
  o[d] = rush_larsen(s[d], in.d_infinity, in.tau_d, dt_slow);
  o[f] = rush_larsen(s[f], in.f_infinity, in.tau_f, dt_slow);
  o[w_gate] = rush_larsen(s[w_gate], in.w_infinity, in.tau_w, dt_slow);
  o[m] = rush_larsen(s[m], in.m_inf, in.tau_m, dt_fast);
  o[h] = rush_larsen(s[h], in.h_inf, in.tau_h, dt_fast);
  o[j] = rush_larsen(s[j], in.j_inf, in.tau_j, dt_slow);
  o[oa] = rush_larsen(s[oa], in.oa_infinity, in.tau_oa, dt_slow);
  o[oi] = rush_larsen(s[oi], in.oi_infinity, in.tau_oi, dt_slow);
  o[ua] = rush_larsen(s[ua], in.ua_infinity, in.tau_ua, dt_slow);
  o[ui] = rush_larsen(s[ui], in.ui_infinity, in.tau_ui, dt_slow);
  o[xr] = rush_larsen(s[xr], in.xr_infinity, in.tau_xr, dt_slow);
  o[xs] = rush_larsen(s[xs], in.xs_infinity, in.tau_xs, dt_slow);

  const double f_Ca_inf = 1.0 / (1.0 + s[Ca_i] / 0.00035);
  o[f_Ca] = rush_larsen(s[f_Ca], f_Ca_inf, tau_f_Ca, dt_slow);

  const double E_K = rt_f * std::log(K_o / s[K_i]);
  const double i_K1 = in.i_K1a * (v - E_K);
  const double i_to = (1.0 - 0.5 * chronic) * Cm * g_to *
                      s[oa] * s[oa] * s[oa] * s[oi] * (v - E_K);
  const double i_Kur = (1.0 - 0.5 * chronic) * Cm * in.g_Kur *
                       s[ua] * s[ua] * s[ua] * s[ui] * (v - E_K);
  const double i_Kr = in.i_Kra * s[xr] * (v - E_K);
  const double i_Ks = Cm * g_Ks * s[xs] * s[xs] * (v - E_K);
  const double km = Km_Na_i / s[Na_i];
  const double i_NaK = ((Cm * i_NaK_max * in.f_NaK) /
                        (1.0 + std::sqrt(km * km * km))) *
                       (K_o / (K_o + Km_K_o));
  const double i_B_K = Cm * g_B_K * (v - E_K);
  o[K_i] = s[K_i] + dt_slow *
           ((2.0 * i_NaK - (i_K1 + i_to + i_Kur + i_Kr + i_Ks + i_B_K)) /
            (V_i * F));

  const double E_Na = rt_f * std::log(Na_o / s[Na_i]);
  const double i_Na =
      Cm * g_Na * s[m] * s[m] * s[m] * s[h] * s[j] * (v - E_Na);
  const double i_NaCa =
      in.i_NaCaa * s[Na_i] * s[Na_i] * s[Na_i] - in.i_NaCab * s[Ca_i];
  const double i_B_Na = Cm * g_B_Na * (v - E_Na);
  o[Na_i] = s[Na_i] + dt_fast *
            ((-3.0 * i_NaK - (3.0 * i_NaCa + i_B_Na + i_Na)) / (V_i * F));

  const double i_Ca_L = (1.0 - 0.7 * chronic) * Cm * g_Ca_L * s[d] * s[f] *
                        s[f_Ca] * (v - 65.0);
  const double i_CaP = (Cm * i_CaP_max * s[Ca_i]) / (0.0005 + s[Ca_i]);
  const double E_Ca = (rt_f / 2.0) * std::log(Ca_o / s[Ca_i]);
  const double i_B_Ca = Cm * g_B_Ca * (v - E_Ca);
  o[V] = v + dt_fast * (-(i_Na + i_K1 + i_to + i_Kur + i_Kr + i_Ks +
                          i_B_Na + i_B_Ca + i_NaK + i_CaP + i_NaCa +
                          i_Ca_L) / Cm);

  const double i_rel = K_rel * s[u_gate] * s[u_gate] * s[v_gate] *
                       s[w_gate] * (s[Ca_rel] - s[Ca_i]);
  const double i_tr = (s[Ca_up] - s[Ca_rel]) / tau_tr;
  o[Ca_rel] = s[Ca_rel] + dt_slow * ((i_tr - i_rel) /
              (1.0 + (CSQN_max * Km_CSQN) /
                     ((s[Ca_rel] + Km_CSQN) * (s[Ca_rel] + Km_CSQN))));

  const double Fn = 1000.0 * (1.0e-15 * V_rel * i_rel -
                    (1.0e-15 / (2.0 * F)) * (0.5 * i_Ca_L - 0.2 * i_NaCa));
  const double u_inf =
      1.0 / (1.0 + std::exp(-(Fn - 3.4175e-13) / 1.367e-15));
  o[u_gate] = rush_larsen(s[u_gate], u_inf, tau_u, dt_slow);

  const double tau_v = 1.91 + 2.09 * u_inf;
  const double v_inf =
      1.0 - 1.0 / (1.0 + std::exp(-(Fn - 6.835e-14) / 1.367e-15));
  o[v_gate] = rush_larsen(s[v_gate], v_inf, tau_v, dt_slow);

  const double i_up = I_up_max / (1.0 + K_up / s[Ca_i]);
  const double i_up_leak = (I_up_max * s[Ca_up]) / Ca_up_max;
  o[Ca_up] = s[Ca_up] + dt_slow *
             (i_up - (i_up_leak + (i_tr * V_rel) / V_up));

  const double b1 =
      (2.0 * i_NaCa - (i_CaP + i_Ca_L + i_B_Ca)) / (2.0 * V_i * F) +
      (V_up * (i_up_leak - i_up) + i_rel * V_rel) / V_i;
  const double ci_t = s[Ca_i] + Km_TRPN;
  const double ci_c = s[Ca_i] + Km_CMDN;
  const double b2 = 1.0 + (TRPN_max * Km_TRPN) / (ci_t * ci_t) +
                    (CMDN_max * Km_CMDN) / (ci_c * ci_c);
  o[Ca_i] = s[Ca_i] + dt_slow * (b1 / b2);

  return o;
}

const int kFast[4] = {V, Na_i, m, h};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: cell_sim <ms> <dt> <stim_mV> [--multirate] "
                 "[--table] [--chronic 0|1]\n");
    return 2;
  }
  const double ms = std::atof(argv[1]);
  Config cfg;
  cfg.dt = std::atof(argv[2]);
  const double stim = std::atof(argv[3]);
  std::vector<float> table;
  for (int a = 4; a < argc; ++a) {
    if (!std::strcmp(argv[a], "--multirate")) cfg.multirate = true;
    if (!std::strcmp(argv[a], "--table")) {
      using T = fib::CourtemancheTraits;
      table.resize(T::kTableRows * T::kTableCols);
      for (int r = 0; r < T::kTableRows; ++r) {
        const auto in =
            fib::computeIntermediates(static_cast<double>(r) - T::kVOffset)
                .as_array();
        for (int c = 0; c < T::kTableCols; ++c)
          table[r * T::kTableCols + c] = static_cast<float>(in[c]);
      }
      cfg.use_table = true;
      cfg.table = table.data();
    }
    if (!std::strcmp(argv[a], "--chronic") && a + 1 < argc)
      cfg.chronic = std::atoi(argv[++a]) != 0;
  }

  State s = initial_state(stim);
  const long steps = static_cast<long>(ms / cfg.dt);
  const long per_ms = static_cast<long>(1.0 / cfg.dt);
  for (long i = 0; i < steps; ++i) {
    if (cfg.multirate) {
      // fast states every dt; slow states every 10th step with 10*dt,
      // recomputed AFTER the fast commit (court.py:615-619 schedule)
      State fast = advance(cfg, s, cfg.dt, 10.0 * cfg.dt);
      for (int k : kFast) s[k] = fast[k];
      if (i % 10 == 0) {
        State slow = advance(cfg, s, cfg.dt, 10.0 * cfg.dt);
        for (int k2 = 0; k2 < N_STATES; ++k2) {
          bool is_fast = false;
          for (int k : kFast) is_fast |= (k2 == k);
          if (!is_fast) s[k2] = slow[k2];
        }
      }
    } else {
      s = advance(cfg, s, cfg.dt, cfg.dt);
    }
    if ((i + 1) % per_ms == 0) {
      std::printf("%.1f %.6f %.6f %.8f\n", (i + 1) * cfg.dt, s[V], s[Na_i],
                  s[Ca_i]);
    }
  }
  return 0;
}

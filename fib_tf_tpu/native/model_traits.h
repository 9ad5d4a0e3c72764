// fib_tf_tpu native toolchain — compile-time model registry.
//
// The trait-struct pattern: per-model constants resolved at compile time
// (the C++-side analog of the Python MODEL_REGISTRY).  Mirrors the role of
// the reference's ionic.h trait structs (ionic.h:12-52) for the native
// table toolchain.

#pragma once

namespace fib {

// Per-cell parameter storage: 2x with Adams-Bashforth-2 (the previous
// derivative rides along).  The reference reserved exactly this behind
// #ifdef ADAMS_BASHFORTH (ionic.h:15-19) without implementing the
// scheme; fenton_br.h implements it (fentonStepAB2 / brStepAB2).
template <typename Traits, bool kAdamsBashforth = false>
struct ParamCount {
  static constexpr int value =
      kAdamsBashforth ? 2 * Traits::kVariables : Traits::kVariables;
};

struct FentonTraits {
  static constexpr int kVariables = 4;
  static constexpr float kUpstroke = 0.5f;   // wavefront threshold
  static constexpr float kVmin = 0.0f;
  static constexpr float kVmax = 1.0f;
  static constexpr float kDiff = 1.5f;       // default diffusion
  static constexpr int kTableRows = 1;       // no lookup table
  static constexpr int kTableCols = 1;
};

struct BeelerReuterTraits {
  static constexpr int kVariables = 8;
  static constexpr float kUpstroke = 0.5f;   // on the normalized image
  static constexpr float kVmin = -90.0f;
  static constexpr float kVmax = 30.0f;
  static constexpr float kDiff = 0.809f;
  static constexpr int kTableRows = 1;       // uses Chebyshev, not tables
  static constexpr int kTableCols = 1;
};

struct CourtemancheTraits {
  static constexpr int kVariables = 21;
  static constexpr float kUpstroke = -40.0f;
  static constexpr float kVmin = -100.0f;
  static constexpr float kVmax = 50.0f;
  static constexpr float kDiff = 0.809f;
  // 1 mV-resolution rate table: row = clamp(int(V + 100), 0, 149)
  static constexpr int kTableRows = 150;
  static constexpr int kTableCols = 30;
  static constexpr float kVOffset = 100.0f;
};

}  // namespace fib

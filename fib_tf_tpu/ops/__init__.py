"""Numerics core: stencils, boundaries, phase fields, integrators,
Chebyshev rate approximation, and lookup tables."""

from fib_tf_tpu.ops.stencil import (
    laplace,
    enforce_boundary,
    phase_field_correction,
    add_hole_to_phase_field,
    pace_mask,
    gaussian_mask,
)
from fib_tf_tpu.ops.integrators import euler, rush_larsen

__all__ = [
    "laplace",
    "enforce_boundary",
    "phase_field_correction",
    "add_hole_to_phase_field",
    "pace_mask",
    "gaussian_mask",
    "euler",
    "rush_larsen",
]

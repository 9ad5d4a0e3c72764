"""Chebyshev polynomial rate approximation.

The reference's answer to "lookup tables are slow on GPU": at *definition
time* it least-squares-fits a degree-8 Chebyshev polynomial to each
voltage-dependent rate function sampled on [min_v, max_v], converts the fit
to the basis of Chebyshev leading terms S_i (S_0 = 1, S_i = 2x*S_{i-1}), and
bakes the coefficients into the graph; at *run time* only the S_i product
chain and a weighted sum remain (reference br.py:207-252, 275-332).

Here the fit happens in numpy when the step function is built, and the
evaluation traces into the jitted step, where XLA fuses the polynomial with
the Rush-Larsen update.  The S-basis change reproduces the reference exactly:
its integer basis matrix `a` with `a //= np.diag(a)` (which numpy broadcasts
column-wise: a[i,j] //= a[j,j]) followed by `d = aᵀ c` and `r = Σ d_i S_i`
is algebraically the plain monomial expansion of the Chebyshev fit; we build
`d` the same way so float32 evaluation order matches.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def chebyshev_fit(x: np.ndarray, y: np.ndarray, deg: int = 8) -> np.ndarray:
    """Fit y(x) and return coefficients in the S_i (leading-term) basis.

    Mirrors reference br.py:303-332 (`expand_chebyshev`) including the
    integer basis matrix construction and its column-wise diagonal division.
    """
    c = np.polynomial.chebyshev.Chebyshev.fit(x, y, deg).coef

    # a[i, j] = coefficient of x^j in T_i
    a = np.zeros([deg + 1, deg + 1], dtype=np.int64)
    a[0, 0] = 1                      # T_0 = 1
    a[1, 1] = 1                      # T_1 = x
    for i in range(2, deg + 1):
        a[i, 1:] += 2 * a[i - 1, :-1]   # + 2x T_{i-1}
        a[i, :] -= a[i - 2, :]          # -  T_{i-2}
    # numpy broadcasting: column j divided by a[j, j] = 2^(j-1); exact for
    # Chebyshev coefficient columns, so this is the T->S basis change.
    diag = np.diag(a).copy()
    a //= diag
    d = a.T @ c
    return d.astype(np.float64)


def chebyshev_terms(x: jnp.ndarray, deg: int) -> Sequence[jnp.ndarray]:
    """Leading-term chain [S_0 .. S_deg]: S_0=1, S_1=x, S_i=2x*S_{i-1}
    (reference br.py:289-301)."""
    assert deg > 1
    terms = [jnp.ones_like(x) * 0 + 1.0, x]
    for _ in range(deg - 1):
        terms.append(2.0 * x * terms[-1])
    return terms


def chebyshev_eval(
    d: np.ndarray, terms: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """Evaluate Σ d_i S_i given a precomputed term chain
    (reference br.py:329-332)."""
    r = jnp.float32(d[0]) + jnp.zeros_like(terms[1])
    for i in range(1, len(d)):
        r = r + jnp.float32(d[i]) * terms[i]
    return r


def normalize_voltage(v: jnp.ndarray, min_v: float, max_v: float) -> jnp.ndarray:
    """Map voltage from [min_v, max_v] to the Chebyshev domain [-1, 1]
    (reference br.py:215)."""
    mid = 0.5 * (max_v + min_v)
    half = 0.5 * (max_v - min_v)
    return (v - mid) / half

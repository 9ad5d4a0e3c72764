"""Tests of the definition-time Chebyshev rate approximation."""

import jax.numpy as jnp
import numpy as np

from fib_tf_tpu.ops import chebyshev


class TestFit:
    def test_s_basis_equals_monomial_expansion(self):
        # The T->S basis change plus the S_i chain must reproduce the plain
        # monomial expansion of the Chebyshev fit (see module docstring).
        x = np.linspace(-1, 1, 1001)
        y = np.exp(2.0 * x) / (1 + np.exp(2.0 * x))
        d = chebyshev.chebyshev_fit(x, y, deg=8)
        cheb = np.polynomial.chebyshev.Chebyshev.fit(x, y, 8)
        mono = np.polynomial.chebyshev.cheb2poly(cheb.coef)
        # d_i * 2^(i-1) should equal the monomial coefficient for i >= 1
        scale = np.array([1.0] + [2.0 ** (i - 1) for i in range(1, 9)])
        np.testing.assert_allclose(d * scale, mono, rtol=1e-10, atol=1e-12)

    def test_fit_accuracy_on_sigmoid(self):
        x = np.linspace(-1, 1, 1001)
        y = 1.0 / (1.0 + np.exp(-5 * x))
        d = chebyshev.chebyshev_fit(x, y, deg=8)
        xs = jnp.asarray(np.linspace(-1, 1, 257), dtype=jnp.float32)
        terms = chebyshev.chebyshev_terms(xs, 8)
        got = np.asarray(chebyshev.chebyshev_eval(d, terms))
        want = 1.0 / (1.0 + np.exp(-5 * np.asarray(xs)))
        assert np.max(np.abs(got - want)) < 1.5e-2

    def test_eval_shape_follows_input(self):
        d = chebyshev.chebyshev_fit(
            np.linspace(-1, 1, 101), np.linspace(-1, 1, 101) ** 2, deg=4
        )
        x = jnp.zeros((3, 5), dtype=jnp.float32)
        terms = chebyshev.chebyshev_terms(x, 4)
        assert chebyshev.chebyshev_eval(d, terms).shape == (3, 5)


class TestNormalize:
    def test_voltage_domain_mapping(self):
        v = jnp.asarray([-90.0, -30.0, 30.0])
        x = np.asarray(chebyshev.normalize_voltage(v, -90.0, 30.0))
        np.testing.assert_allclose(x, [-1.0, 0.0, 1.0], atol=1e-6)

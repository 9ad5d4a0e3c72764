"""Unit tests of the integrator helpers."""

import jax.numpy as jnp
import numpy as np
import pytest

from fib_tf_tpu.ops import integrators


class TestRushLarsen:
    def test_matches_closed_form(self):
        g = jnp.float32(0.4)
        g_inf, tau, dt = 0.9, 5.0, 0.1
        got = float(integrators.rush_larsen(g, g_inf, tau, dt))
        want = 0.9 - (0.9 - 0.4) * np.exp(-0.1 / 5.0)
        assert got == pytest.approx(want, rel=1e-6)

    def test_converges_to_g_inf(self):
        g = jnp.float32(0.2)
        for _ in range(2000):
            g = integrators.rush_larsen(g, 0.7, 3.0, 0.5)
        assert float(g) == pytest.approx(0.7, abs=1e-4)

    def test_clipping(self):
        # reference ionic.py:122-123 clips to [1e-5, 0.99999]
        lo = float(integrators.rush_larsen(jnp.float32(0.0), 0.0, 1.0, 0.1))
        hi = float(integrators.rush_larsen(jnp.float32(1.0), 1.0, 1.0, 0.1))
        assert lo == pytest.approx(1e-5)
        assert hi == pytest.approx(0.99999)

    def test_large_dt_stable(self):
        # Rush-Larsen is unconditionally stable: even dt >> tau lands on
        # g_inf instead of oscillating (the whole point vs explicit Euler).
        got = float(integrators.rush_larsen(jnp.float32(0.1), 0.8, 0.01, 10.0))
        assert got == pytest.approx(0.8, abs=1e-4)


class TestEuler:
    def test_basic(self):
        assert float(integrators.euler(jnp.float32(1.0), 2.0, 0.1)) == (
            pytest.approx(1.2)
        )


class TestStepFunctions:
    def test_heaviside(self):
        x = jnp.asarray([-1.0, 0.0, 2.0])
        np.testing.assert_allclose(
            np.asarray(integrators.heaviside(x)), [0.0, 0.5, 1.0]
        )

    def test_heaviside_neg(self):
        x = jnp.asarray([-1.0, 0.0, 2.0])
        np.testing.assert_allclose(
            np.asarray(integrators.heaviside_neg(x)), [1.0, 0.5, 0.0]
        )

"""Unit tests of the grid operators against hand-computed references."""

import jax.numpy as jnp
import numpy as np
import pytest

from fib_tf_tpu.ops import stencil


def np_laplace_reference(x):
    """Straightforward numpy transcription of reference ionic.py:44-60."""
    xp = np.pad(x, 1, mode="reflect")
    return (
        xp[:-2, 1:-1] + xp[2:, 1:-1] + xp[1:-1, :-2] + xp[1:-1, 2:]
        + 0.5 * (xp[:-2, :-2] + xp[2:, :-2] + xp[:-2, 2:] + xp[2:, 2:])
        - 6.0 * xp[1:-1, 1:-1]
    )


class TestLaplace:
    def test_constant_field_is_zero(self):
        x = jnp.full((16, 16), 3.7, dtype=jnp.float32)
        np.testing.assert_allclose(stencil.laplace(x), 0.0, atol=1e-5)

    def test_matches_numpy_reference(self):
        rng = np.random.RandomState(0)
        x = rng.rand(12, 20).astype(np.float32)
        got = np.asarray(stencil.laplace(jnp.asarray(x)))
        want = np_laplace_reference(x)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_single_hot_interior_cell(self):
        # center -6, edges 1, diagonals 0.5 (reference ionic.py:51-53)
        x = np.zeros((7, 7), dtype=np.float32)
        x[3, 3] = 1.0
        l = np.asarray(stencil.laplace(jnp.asarray(x)))
        assert l[3, 3] == -6.0
        assert l[2, 3] == l[4, 3] == l[3, 2] == l[3, 4] == 1.0
        assert l[2, 2] == l[2, 4] == l[4, 2] == l[4, 4] == 0.5

    def test_quadratic_has_constant_laplacian(self):
        # For f = x^2 this stencil gives 4 in the interior: the axial pair
        # contributes 2 and the half-weighted diagonal pairs another 2
        # (i.e. the stencil equals 2x the usual 5-point weighting).
        h, w = 16, 16
        xx = np.arange(w, dtype=np.float32)
        x = np.tile(xx**2, (h, 1))
        l = np.asarray(stencil.laplace(jnp.asarray(x)))
        np.testing.assert_allclose(l[1:-1, 2:-2], 4.0, atol=1e-3)

    def test_phase_field_correction_zero_for_flat_phase(self):
        rng = np.random.RandomState(1)
        x = rng.rand(10, 10).astype(np.float32)
        phase = np.ones((10, 10), dtype=np.float32)
        with_phase = np.asarray(
            stencil.laplace(jnp.asarray(x), phase=jnp.asarray(phase))
        )
        without = np.asarray(stencil.laplace(jnp.asarray(x)))
        np.testing.assert_allclose(with_phase, without, atol=1e-6)

    def test_phase_padded_matches_phase(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.rand(10, 10).astype(np.float32))
        phase = stencil.add_hole_to_phase_field(None, 10, 10, 5, 5, 2)
        a = stencil.laplace(x, phase=jnp.asarray(phase))
        padded = jnp.pad(jnp.asarray(phase), 1, mode="reflect")
        b = stencil.laplace(x, phase_padded=padded)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestAnisotropicLaplace:
    def test_exact_on_quadratic(self):
        """For V = a x^2 + b x y + c y^2 the operator must return
        2a dxx + 2b dxy + 2c dyy exactly (interior; second-order stencils
        are exact on quadratics)."""
        import jax.numpy as jnp

        from fib_tf_tpu.ops.stencil import anisotropic_laplace

        a, b, c = 0.7, -0.3, 1.1
        dxx, dxy, dyy = 0.9, 0.2, 0.4
        yy, xx = np.mgrid[0:16, 0:16].astype(np.float32)
        v = a * xx**2 + b * xx * yy + c * yy**2
        got = np.asarray(anisotropic_laplace(jnp.asarray(v), dxx, dxy, dyy))
        # x2 normalization matching the reference 9-point stencil
        want = 2.0 * (2 * a * dxx + 2 * b * dxy + 2 * c * dyy)
        np.testing.assert_allclose(
            got[2:-2, 2:-2], want, rtol=1e-4, atol=1e-3
        )

    def test_isotropic_reduction(self):
        """ratio=1 at any angle gives the 5-point Laplacian Vxx + Vyy."""
        import jax.numpy as jnp

        from fib_tf_tpu.ops.stencil import anisotropic_laplace, fiber_tensor

        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.standard_normal((12, 12)).astype(np.float32))
        dxx, dxy, dyy = fiber_tensor(0.61, 1.0)
        assert dxy == pytest.approx(0.0)
        got = np.asarray(anisotropic_laplace(v, dxx, dxy, dyy))
        want = np.asarray(anisotropic_laplace(v, 1.0, 0.0, 1.0))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_phase_correction_isotropic_reduction(self):
        """At D = I the tensor no-flux correction equals the reference
        isotropic phase_field_correction exactly."""
        import jax.numpy as jnp

        from fib_tf_tpu.ops.stencil import (
            add_hole_to_phase_field,
            anisotropic_phase_correction,
            phase_field_correction,
        )

        rng = np.random.default_rng(1)
        v = rng.standard_normal((16, 16)).astype(np.float32)
        phase = add_hole_to_phase_field(None, 16, 16, 8, 8, 4)
        xp = jnp.pad(jnp.asarray(v), 1, mode="reflect")
        pp = jnp.pad(jnp.asarray(phase), 1, mode="reflect")
        got = np.asarray(
            anisotropic_phase_correction(xp, pp, 1.0, 0.0, 1.0))
        want = np.asarray(phase_field_correction(xp, pp))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_aniso_with_hole_runs(self):
        """Fiber anisotropy + phase-field obstacle: the wave must
        propagate around the hole without NaNs."""
        from fib_tf_tpu.config import SimConfig
        from fib_tf_tpu.engine import Simulation
        from fib_tf_tpu.models import Fenton4v

        cfg = SimConfig(width=64, height=64, dt=0.1, duration=40,
                        diff=1.5, fiber_angle=np.pi / 4, fiber_ratio=0.4)
        sim = Simulation(Fenton4v(cfg))
        sim.add_hole_to_phase_field(32, 32, 8)
        sim.define()
        res = sim.simulate()
        assert np.isfinite(res.state["u"]).all()
        assert res.state["u"][32, -2] > 0.5  # crossed the grid

    def test_fiber_tensor_spd(self):
        from fib_tf_tpu.ops.stencil import fiber_tensor

        for ang in (0.0, 0.5, 1.2):
            dxx, dxy, dyy = fiber_tensor(ang, 0.25)
            assert dxx > 0 and dyy > 0
            assert dxx * dyy - dxy**2 == pytest.approx(0.25, rel=1e-6)

    def test_cv_anisotropy_physics(self):
        """A fenton planar wave along x conducts ~1/sqrt(ratio) faster
        with fibers along x (ratio=0.25) than across them (angle 90°)."""
        import sys

        sys.path.insert(0, "tests")
        from test_physics import measure_cv_cells_per_ms

        from fib_tf_tpu.config import SimConfig
        from fib_tf_tpu.models import Fenton4v, grid_geometry

        cvs = {}
        for name, ang in (("along", 0.0), ("across", np.pi / 2)):
            cfg = SimConfig(width=128, height=16, dt=0.1, duration=1,
                            diff=1.5, fiber_angle=ang, fiber_ratio=0.25)
            model = Fenton4v(cfg)
            # measure through the aniso geometry
            import jax
            import jax.numpy as jnp

            geom = grid_geometry(None, ang, 0.25)
            state = {k: jnp.asarray(v)
                     for k, v in model.initial_state(s1=True).items()}

            def body(s, _):
                s = model.step(s, geom)
                return s, jnp.stack([s["u"][8, 30], s["u"][8, 90]])

            _, probes = jax.jit(lambda s: jax.lax.scan(
                body, s, None, length=120))(state)
            probes = np.asarray(probes)
            t = [np.where(probes[:, j] > 0.5)[0][0] for j in (0, 1)]
            cvs[name] = 60.0 / (t[1] - t[0])
        # fibers along the propagation axis must conduct clearly faster;
        # the published affine CV law (29 + 50*diff) at D=1.5 vs 0.375
        # predicts ~2.2x, and lattice discreteness near the low-D end
        # pushes it slightly higher (measured 2.52)
        ratio = cvs["along"] / cvs["across"]
        assert 2.0 < ratio < 3.0, ratio


class TestEnforceBoundary:
    def test_borders_copied_from_interior(self):
        rng = np.random.RandomState(3)
        x = rng.rand(8, 9).astype(np.float32)
        b = np.asarray(stencil.enforce_boundary(jnp.asarray(x)))
        # interior unchanged
        np.testing.assert_array_equal(b[1:-1, 1:-1], x[1:-1, 1:-1])
        # borders mirror the interior ring (SYMMETRIC pad of interior)
        np.testing.assert_array_equal(b[0, 1:-1], x[1, 1:-1])
        np.testing.assert_array_equal(b[-1, 1:-1], x[-2, 1:-1])
        np.testing.assert_array_equal(b[1:-1, 0], x[1:-1, 1])
        np.testing.assert_array_equal(b[1:-1, -1], x[1:-1, -2])
        # corners come from the diagonal interior neighbor
        assert b[0, 0] == x[1, 1]
        assert b[-1, -1] == x[-2, -2]


class TestPhaseField:
    def test_hole_profile(self):
        phase = stencil.add_hole_to_phase_field(None, 64, 64, 32, 32, 10)
        # far away ~1, center ~1e-5 floor
        assert phase[0, 0] == pytest.approx(1.0, abs=1e-5)
        assert phase[32, 32] == pytest.approx(1e-5, abs=1e-6)
        # at the radius the tanh profile crosses 0.5
        assert phase[32, 42] == pytest.approx(0.5, abs=0.02)

    def test_neg_hole_keeps_inside(self):
        phase = stencil.add_hole_to_phase_field(
            None, 64, 64, 32, 32, 20, neg=True
        )
        # neg profile uses the gentler 0.1 tanh scale (reference ionic.py:101):
        # at the center tanh(0.1*20) = 0.964, so phi = 0.982, not ~1.
        assert phase[32, 32] == pytest.approx(0.982, abs=1e-3)
        # the 0.1 tanh scale decays slowly: at the far corner (dist 45.25)
        # phi = 0.5*(tanh(-2.5)+1) = 0.0067 — small but above the 1e-5 floor
        assert phase[0, 0] < 0.01

    def test_floor(self):
        phase = stencil.add_hole_to_phase_field(None, 32, 32, 16, 16, 8)
        assert phase.min() >= 1e-5


class TestPacing:
    def test_all_locations_have_expected_extent(self):
        h, w = 16, 20
        for loc in stencil.PACE_LOCATIONS:
            m = stencil.pace_mask(h, w, loc, 1.0, -90.0)
            assert (m == 1.0).any(), loc
            assert (m == -90.0).any(), loc

    def test_luq_geometry(self):
        m = stencil.pace_mask(16, 16, "luq", 5.0, 0.0)
        assert m[1, 1] == 5.0 and m[7, 7] == 5.0
        assert m[0, 0] == 0.0 and m[8, 8] == 0.0  # reference ionic.py:154

    def test_unknown_location_raises(self):
        with pytest.raises(ValueError):
            stencil.pace_mask(8, 8, "center", 1.0, 0.0)

    def test_apply_pace_is_max(self):
        pot = jnp.asarray(np.full((8, 8), -80.0, dtype=np.float32))
        mask = jnp.asarray(stencil.pace_mask(8, 8, "left", 10.0, -90.0))
        out = np.asarray(stencil.apply_pace(pot, mask))
        assert (out[:, :5] == 10.0).all()
        assert (out[:, 5:] == -80.0).all()


class TestElectrode:
    def test_gaussian_mask(self):
        m = stencil.gaussian_mask(32, 32, 16, 16, 5)
        assert m[16, 16] == pytest.approx(1.0)
        assert m[16, 21] == pytest.approx(np.exp(-1.0), rel=1e-5)

    def test_sample_is_masked_mean(self):
        img = jnp.ones((16, 16), dtype=jnp.float32)
        mask = jnp.asarray(stencil.gaussian_mask(16, 16, 8, 8, 3))
        got = float(stencil.electrogram_sample(img, mask))
        assert got == pytest.approx(float(np.mean(np.asarray(mask))), rel=1e-6)

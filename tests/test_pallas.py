"""Validate the fused Pallas step against the reference XLA path (on CPU
the kernel runs in interpreter mode; the same code compiles with Mosaic on
TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fib_tf_tpu.config import SimConfig
from fib_tf_tpu.models import (
    BeelerReuter,
    Courtemanche,
    Fenton4v,
    LuoRudy91,
    MitchellSchaeffer,
    TenTusscher06,
    grid_geometry,
)
from fib_tf_tpu.ops import stencil
from fib_tf_tpu.ops.pallas_step import (
    make_pallas_step,
    vmem_enforce_boundary,
    vmem_laplace,
)
from fib_tf_tpu.ops.pallas_tiled import make_tiled_pallas_step


def cfg(**kw):
    base = dict(width=32, height=32, dt=0.1, diff=1.5, duration=1)
    base.update(kw)
    return SimConfig(**base)


class TestVmemOps:
    def test_laplace_matches_pad_version(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(16, 24).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(vmem_laplace(x)),
            np.asarray(stencil.laplace(x)),
            rtol=1e-6, atol=1e-6,
        )

    def test_laplace_with_phase_matches(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(16, 16).astype(np.float32))
        phase = stencil.add_hole_to_phase_field(None, 16, 16, 8, 8, 3)
        np.testing.assert_allclose(
            np.asarray(vmem_laplace(x, jnp.asarray(phase))),
            np.asarray(stencil.laplace(x, phase=jnp.asarray(phase))),
            rtol=1e-5, atol=1e-5,
        )

    def test_boundary_matches_pad_version(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.rand(12, 20).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(vmem_enforce_boundary(x)),
            np.asarray(stencil.enforce_boundary(x)),
        )


class TestPallasStep:
    @pytest.mark.parametrize("model_cls,extra", [
        (Fenton4v, {}),
        (BeelerReuter, dict(diff=0.809, cheby=True, skip=True)),
        (Courtemanche, dict(diff=0.809)),
        (MitchellSchaeffer, {}),
        (LuoRudy91, dict(dt=0.02, diff=0.809)),
        (LuoRudy91, dict(dt=0.02, diff=0.809, skip=True)),
        (TenTusscher06, dict(dt=0.02, diff=0.809)),
        (TenTusscher06, dict(dt=0.02, diff=0.809, skip=True)),
    ])
    def test_matches_xla_step(self, model_cls, extra):
        c = cfg(**extra)
        model = model_cls(c)
        geom = grid_geometry()
        state = {k: jnp.asarray(v) for k, v in model.initial_state().items()}

        want = state
        for _ in range(2):
            want = model.step(want, geom)

        pstep = make_pallas_step(model)
        got = state
        for _ in range(2):
            got = pstep(got)

        for k in want:
            # interpret-mode transcendentals round slightly differently
            # from the XLA path near the steep S1 stripe; 1e-3 relative is
            # far below physical significance
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]),
                rtol=1e-3, atol=1e-5, err_msg=k,
            )

    def test_with_phase_field(self):
        c = cfg()
        model = Fenton4v(c)
        phase = stencil.add_hole_to_phase_field(None, 32, 32, 16, 16, 6)
        geom = grid_geometry(phase)
        state = {k: jnp.asarray(v) for k, v in model.initial_state().items()}

        want = model.step(state, geom)
        got = make_pallas_step(model, phase=phase)(state)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]),
                rtol=1e-5, atol=1e-6, err_msg=k,
            )

    def test_anisotropic_matches_xla_step(self):
        """Whole-grid kernel with a fiber tensor == the XLA anisotropic
        path, with and without a phase field."""
        fiber = stencil.fiber_tensor(0.5, 0.3)
        for phase in (None,
                      stencil.add_hole_to_phase_field(None, 32, 32, 16,
                                                      16, 6)):
            c = cfg(fiber_angle=0.5, fiber_ratio=0.3)
            model = Fenton4v(c)
            geom = grid_geometry(phase, 0.5, 0.3)
            state = {k: jnp.asarray(v)
                     for k, v in model.initial_state().items()}
            want = model.step(state, geom)
            got = make_pallas_step(model, phase=phase, fiber=fiber)(state)
            for k in want:
                np.testing.assert_allclose(
                    np.asarray(got[k]), np.asarray(want[k]),
                    rtol=1e-5, atol=1e-6,
                    err_msg=f"phase={phase is not None}/{k}",
                )

    def test_tiled_anisotropic_matches_xla_step(self):
        fiber = stencil.fiber_tensor(1.1, 0.25)
        phase = stencil.add_hole_to_phase_field(None, 64, 64, 32, 32, 10)
        c = cfg(width=64, height=64, fiber_angle=1.1, fiber_ratio=0.25)
        model = Fenton4v(c)
        geom = grid_geometry(phase, 1.1, 0.25)
        state = {k: jnp.asarray(v) for k, v in model.initial_state().items()}
        want = model.step(state, geom)
        got = make_tiled_pallas_step(
            model, tile_rows=16, phase=phase, fiber=fiber)(state)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]),
                rtol=1e-3, atol=1e-5, err_msg=k,
            )

    def test_tiled_matches_xla_step(self):
        """Row-tiled temporal-blocking kernel == XLA path, for every model
        family, including the edge tiles' global boundary handling."""
        from fib_tf_tpu.models import Courtemanche

        for model_cls, extra in [
            (Fenton4v, {}),
            (BeelerReuter, dict(diff=0.809, cheby=True, skip=True)),
            (Courtemanche, dict(diff=0.809)),
        ]:
            c = cfg(width=64, height=64, **extra)
            model = model_cls(c)
            geom = grid_geometry()
            state = {k: jnp.asarray(v)
                     for k, v in model.initial_state().items()}
            want = model.step(model.step(state, geom), geom)
            tstep = make_tiled_pallas_step(model, tile_rows=16)
            got = tstep(tstep(state))
            for k in want:
                np.testing.assert_allclose(
                    np.asarray(got[k]), np.asarray(want[k]),
                    rtol=2e-3, atol=1e-5,
                    err_msg=f"{model.name}/{k}",
                )

    def test_tiled_with_phase_field(self):
        c = cfg(width=64, height=64)
        model = Fenton4v(c)
        phase = stencil.add_hole_to_phase_field(None, 64, 64, 32, 32, 10)
        geom = grid_geometry(phase)
        state = {k: jnp.asarray(v) for k, v in model.initial_state().items()}
        want = model.step(state, geom)
        got = make_tiled_pallas_step(model, tile_rows=16, phase=phase)(state)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]),
                rtol=1e-3, atol=1e-5, err_msg=k,
            )

    def test_inside_scan(self):
        c = cfg()
        model = Fenton4v(c)
        pstep = make_pallas_step(model)
        state = {k: jnp.asarray(v) for k, v in model.initial_state().items()}

        out = jax.jit(
            lambda s: jax.lax.scan(
                lambda st, _: (pstep(st), None), s, None, length=3
            )[0]
        )(state)

        geom = grid_geometry()
        want = state
        for _ in range(3):
            want = model.step(want, geom)
        np.testing.assert_allclose(
            np.asarray(out["u"]), np.asarray(want["u"]),
            rtol=1e-5, atol=1e-6,
        )


class TestPaddedWholeGrid:
    """Unaligned grids run the whole-grid kernel on (8,128)-padded planes
    with global-index edge masks (VERDICT r2 #3: the reference's fast
    path was size-agnostic, fenton.py:126)."""

    def test_padded_shape(self):
        from fib_tf_tpu.ops.pallas_step import padded_shape

        assert padded_shape(512, 512) is None
        assert padded_shape(500, 500) == (504, 512)
        assert padded_shape(300, 200) == (304, 256)
        assert padded_shape(33, 50) == (40, 128)

    @pytest.mark.parametrize(
        "model_cls,extra,h,w",
        [
            (Fenton4v, {}, 33, 50),
            (BeelerReuter, {"cheby": True, "skip": True}, 30, 40),
            (Courtemanche, {}, 20, 36),
        ],
    )
    def test_padded_matches_xla(self, model_cls, extra, h, w):
        from fib_tf_tpu.ops.pallas_step import (
            crop_state, pad_state, padded_shape,
        )

        c = cfg(width=w, height=h, **extra)
        model = model_cls(c)
        geom = grid_geometry()
        state = {k: jnp.asarray(v) for k, v in model.initial_state().items()}

        hp, wp = padded_shape(h, w)
        kstep = make_pallas_step(model, interpret=True, pad=True)
        sp = pad_state(state, h, w, hp, wp)
        ref = state
        for _ in range(3):
            sp = kstep(sp)
            ref = model.step(ref, geom)
        out = crop_state(sp, h, w)
        for k in ref:
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]),
                rtol=1e-3, atol=1e-5, err_msg=k,
            )

    def test_padded_with_phase_field(self):
        from fib_tf_tpu.ops.pallas_step import (
            crop_state, pad_state, padded_shape,
        )

        h, w = 26, 44
        c = cfg(width=w, height=h)
        phase = stencil.add_hole_to_phase_field(None, h, w, w // 2, h // 2, 5)
        model = Fenton4v(c)
        geom = grid_geometry(phase)
        state = {k: jnp.asarray(v) for k, v in model.initial_state().items()}

        hp, wp = padded_shape(h, w)
        kstep = make_pallas_step(model, phase=phase, interpret=True, pad=True)
        sp = pad_state(state, h, w, hp, wp)
        ref = state
        for _ in range(2):
            sp = kstep(sp)
            ref = model.step(ref, geom)
        out = crop_state(sp, h, w)
        for k in ref:
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]),
                rtol=1e-3, atol=1e-5, err_msg=k,
            )

    def test_engine_unaligned_pallas_matches_xla(self):
        """End-to-end: simulate() on an unaligned grid, kernel='pallas'
        (interpret on CPU) == kernel='xla', incl. pacing + phase."""
        from fib_tf_tpu.engine import Simulation

        results = {}
        for kern in ("xla", "pallas"):
            c = SimConfig(width=33, height=50, dt=0.1, diff=0.809,
                          duration=10, kernel=kern)
            sim = Simulation(Fenton4v(c))
            sim.add_hole_to_phase_field(16, 25, 4)
            sim.add_ecg_electrode(16, 25, z=6.0)
            sim.define()
            sim.add_pace_op("s2", "luq", 1.0)
            results[kern] = sim.simulate(schedule=[(3.0, "s2")])
        a, b = results["xla"], results["pallas"]
        np.testing.assert_allclose(a.probes["v"], b.probes["v"],
                                   rtol=1e-4, atol=1e-5)
        # the pseudo-ECG samples the true-size crop of the padded planes
        np.testing.assert_allclose(a.probes["ecg"], b.probes["ecg"],
                                   rtol=1e-3, atol=1e-5)
        for k in a.state:
            assert b.state[k].shape == (50, 33)
            np.testing.assert_allclose(a.state[k], b.state[k],
                                       rtol=1e-3, atol=1e-5, err_msg=k)


class TestKernelStepFori:
    """kernel_step (fori_loop substeps) is value-identical to the
    unrolled step at f32 ULP level (VERDICT r2 #2)."""

    @pytest.mark.parametrize(
        "model_cls,extra",
        [
            (Fenton4v, {}),
            (BeelerReuter, {"cheby": True, "skip": True}),
            (BeelerReuter, {"cheby": False, "skip": False}),
            (Courtemanche, {}),
        ],
    )
    def test_matches_unrolled(self, model_cls, extra):
        c = cfg(**extra)
        model = model_cls(c)
        geom = grid_geometry()
        state = {k: jnp.asarray(v) for k, v in model.initial_state().items()}
        a = b = state
        for _ in range(3):
            a = jax.jit(lambda s: model.step(s, geom))(a)
            b = jax.jit(lambda s: model.step(s, geom, unroll=False))(b)
        for k in a:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]),
                rtol=1e-5, atol=1e-7, err_msg=k,
            )

    def test_kernel_step_fallback_for_legacy_signature(self):
        """User models whose step() predates the unroll kwarg still work
        through kernel_step."""
        from fib_tf_tpu.models.base import IonicModel

        class Legacy(Fenton4v):
            def step(self, state, geom):  # no unroll kwarg
                return super().step(state, geom)

        model = Legacy(cfg())
        geom = grid_geometry()
        state = {k: jnp.asarray(v) for k, v in model.initial_state().items()}
        out = model.kernel_step(state, geom)
        ref = model.step(state, geom)
        for k in ref:
            np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                       rtol=1e-6, atol=1e-7)


class TestSubstepFns:
    """models/base.substep_fns contract: composing the per-substep
    callables in order is value-identical to step(state, geom) — the
    precondition of the substeps_per_launch kernel split."""

    @pytest.mark.parametrize("model_cls,extra", [
        (Fenton4v, {}),
        (BeelerReuter, dict(diff=0.809, cheby=True, skip=True)),
        (BeelerReuter, dict(diff=0.809, cheby=False, skip=False)),
        (Courtemanche, dict(diff=0.809)),
        (MitchellSchaeffer, {}),
        (LuoRudy91, dict(dt=0.02, diff=0.809, skip=True)),
        (TenTusscher06, dict(dt=0.02, diff=0.809)),
        (TenTusscher06, dict(dt=0.02, diff=0.809, skip=True)),
    ])
    def test_composition_matches_step(self, model_cls, extra):
        c = cfg(**extra)
        model = model_cls(c)
        geom = grid_geometry()
        state = {k: jnp.asarray(v) for k, v in model.initial_state().items()}
        fns, labels = model.substep_fns(geom)
        assert len(fns) == model.dt_per_step == len(labels)

        want = jax.jit(lambda s: model.step(s, geom))(state)

        def composed(s):
            for f in fns:
                s = f(s)
            return s

        got = jax.jit(composed)(state)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]),
                rtol=1e-6, atol=1e-7, err_msg=k,
            )

    def test_court_ultra_single_rate(self):
        from fib_tf_tpu.models import CourtemancheUltra

        model = CourtemancheUltra(cfg(diff=0.809))
        geom = grid_geometry()
        state = {k: jnp.asarray(v) for k, v in model.initial_state().items()}
        fns, labels = model.substep_fns(geom)
        assert labels == ("solve",) * 10  # NOT the parent's fast/slow pair
        want = jax.jit(lambda s: model.step(s, geom))(state)
        got = state
        for f in fns:
            got = jax.jit(f)(got)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]),
                rtol=1e-5, atol=1e-6, err_msg=k,
            )

    def test_adaptive_refuses_split(self):
        model = Fenton4v(cfg(adaptive_dv=5.0))
        with pytest.raises(ValueError, match="adaptive_dv"):
            model.substep_fns(grid_geometry())

    def test_plan_launch_groups(self):
        from fib_tf_tpu.ops.pallas_step import plan_launch_groups

        labels = ("n10",) + ("n0",) * 9
        groups = plan_launch_groups(labels, 3)
        assert [(a, b) for a, b, _ in groups] == [
            (0, 3), (3, 6), (6, 9), (9, 10)]
        # the two interior all-n0 groups share one key (one compile)
        assert groups[1][2] == groups[2][2] == ("n0",) * 3
        assert len({g[2] for g in groups}) == 3

    def test_plan_launch_groups_rejects_nonpositive(self):
        # direct builder callers bypass SimConfig validation; 0 used to
        # loop forever appending empty groups
        from fib_tf_tpu.ops.pallas_step import plan_launch_groups

        for bad in (0, -1):
            with pytest.raises(ValueError, match="per_launch"):
                plan_launch_groups(("n0",) * 5, bad)


class TestLaunchSplit:
    """substeps_per_launch: the split whole-grid kernel composes to the
    monolith (interpret mode on CPU; on TPU the same code is the Mosaic
    compile-cliff mitigation measured in docs/OPTIMIZATIONS.md)."""

    @pytest.mark.parametrize("model_cls,extra,spl", [
        (BeelerReuter, dict(diff=0.809, cheby=True, skip=True), 1),
        (BeelerReuter, dict(diff=0.809, cheby=True, skip=True), 3),
        (TenTusscher06, dict(dt=0.02, diff=0.809, skip=True), 2),
        (TenTusscher06, dict(dt=0.02, diff=0.809), 5),
        (Courtemanche, dict(diff=0.809), 4),
    ])
    def test_split_matches_monolith(self, model_cls, extra, spl):
        c = cfg(**extra)
        model = model_cls(c)
        state = {k: jnp.asarray(v) for k, v in model.initial_state().items()}
        whole = make_pallas_step(model)(state)
        split = make_pallas_step(model, substeps_per_launch=spl)(state)
        for k in whole:
            np.testing.assert_allclose(
                np.asarray(split[k]), np.asarray(whole[k]),
                rtol=1e-5, atol=1e-6, err_msg=k,
            )

    def test_split_with_phase_and_pad(self):
        """Split + unaligned grid (padded planes) + phase field compose."""
        from fib_tf_tpu.ops.pallas_step import (
            crop_state, pad_state, padded_shape,
        )

        c = cfg(width=30, height=30, diff=0.809, cheby=True, skip=True)
        model = BeelerReuter(c)
        phase = stencil.add_hole_to_phase_field(None, 30, 30, 15, 15, 5)
        geom = grid_geometry(phase)
        state = {k: jnp.asarray(v) for k, v in model.initial_state().items()}
        want = model.step(model.step(state, geom), geom)

        hp, wp = padded_shape(30, 30)
        pstep = make_pallas_step(model, phase=phase, pad=True,
                                 substeps_per_launch=2)
        sp = pad_state(state, 30, 30, hp, wp)
        sp = pstep(pstep(sp))
        got = crop_state(sp, 30, 30)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]),
                rtol=1e-4, atol=1e-5, err_msg=k,
            )

    def test_engine_plumbs_spl(self):
        """SimConfig.substeps_per_launch reaches the kernel path and the
        result matches the XLA path."""
        from fib_tf_tpu.engine import Simulation

        base = dict(width=32, height=32, dt=0.1, diff=0.809, duration=2,
                    dt_per_plot=10, cheby=True, skip=True)
        r_x = Simulation(
            BeelerReuter(SimConfig(kernel="xla", **base))
        ).define().simulate()
        r_p = Simulation(
            BeelerReuter(SimConfig(kernel="pallas", substeps_per_launch=2,
                                   **base))
        ).define().simulate()
        np.testing.assert_allclose(r_p.probes["v"], r_x.probes["v"],
                                   rtol=1e-4, atol=1e-5)

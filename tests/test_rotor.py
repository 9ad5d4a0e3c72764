"""Live rotor census (SimConfig.rotor_probe / ops/stencil.rotor_metrics).

Ground truth: the host-side detector (utils/tips.py, itself pinned by
synthetic known-charge fields in test_tips.py).  The on-device metric
must agree with it frame-by-frame on the same embedding.
"""

import numpy as np
import pytest

from fib_tf_tpu.config import SimConfig
from fib_tf_tpu.engine import Simulation
from fib_tf_tpu.models import Fenton4v
from fib_tf_tpu.ops import stencil
from fib_tf_tpu.utils.tips import phase_singularities



# long tail: excluded from the smoke tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

def synth_spiral(t, omega=np.pi / 8, h=32, w=32, cy=15.5, cx=15.5):
    y, x = np.mgrid[0:h, 0:w]
    th0 = np.arctan2(y - cy, x - cx)
    # normalized [0, 1] like model.image output
    return (0.5 + 0.5 * np.cos(th0 - omega * t)).astype(np.float32)


class TestRotorMetrics:
    def test_matches_host_detector(self):
        now, old = synth_spiral(6), synth_spiral(4)
        count, net = np.asarray(
            stencil.rotor_metrics(now, old, v_star=0.5)
        )
        host = phase_singularities(
            np.arctan2(now - 0.5, old - 0.5)
        )
        assert count == len(host)
        assert net == host[:, 2].sum()
        assert (count, net) == (1.0, 1.0)

    def test_mirrored_charge(self):
        now, old = synth_spiral(6), synth_spiral(4)
        count, net = np.asarray(
            stencil.rotor_metrics(old, now, v_star=0.5)  # reversed lag
        )
        assert (count, net) == (1.0, -1.0)

    def test_quiescent_zero(self):
        flat = np.zeros((32, 32), np.float32)
        count, net = np.asarray(stencil.rotor_metrics(flat, flat))
        assert (count, net) == (0.0, 0.0)

    def test_phase_field_masks_core(self):
        now, old = synth_spiral(6), synth_spiral(4)
        hole = np.ones((32, 32), np.float32)
        hole[12:20, 12:20] = 0.0
        count, net = np.asarray(
            stencil.rotor_metrics(now, old, phase=hole)
        )
        assert (count, net) == (0.0, 0.0)


class TestRotorProbe:
    def make_sim(self, **kw):
        cfg = SimConfig(width=32, height=32, dt=0.1, duration=20,
                        diff=1.5, rotor_probe=True, **kw)
        return Simulation(Fenton4v(cfg))

    def test_stream_shape_and_quiescence(self):
        sim = self.make_sim()
        sim.define(s1=False)  # fully quiescent sheet
        res = sim.simulate()
        assert "rotors" in res.probes
        assert res.probes["rotors"].shape == (res.steps, 2)
        assert (res.probes["rotors"] == 0.0).all()

    def test_plane_wave_no_rotors(self):
        sim = self.make_sim()
        sim.define(s1=True)  # S1 stripe: plane wave, no singularity
        res = sim.simulate()
        assert (res.probes["rotors"] == 0.0).all()

    def test_reserved_keys_stripped_from_result(self):
        sim = self.make_sim()
        sim.define(s1=False)
        res = sim.simulate()
        assert Simulation.ROTOR_BUF not in res.state
        assert Simulation.ROTOR_IDX not in res.state
        # the result state must be resumable as-is
        sim2 = self.make_sim()
        sim2.define(state=res.state)
        res2 = sim2.simulate()
        assert np.isfinite(res2.state["u"]).all()

    def test_probe_equals_posthoc_tips_on_frames(self):
        # engine stream vs host detector on the engine's own movie:
        # with rotor_tau_ms == the frame interval, the probe at each
        # frame step must equal the host count on (frame_k, frame_{k-1})
        cfg = SimConfig(width=32, height=32, dt=0.1, duration=40,
                        diff=1.5, rotor_probe=True, rotor_tau_ms=1.0)
        sim = Simulation(Fenton4v(cfg))
        sim.define(s1=True)
        res = sim.simulate(record_frames_every_ms=1.0)
        # frames[k] is the image after outer step k+1; probes[k] is
        # emitted after outer step k+1; at tau=1 the delayed sample at
        # probe k is exactly frames[k-1]
        for k in range(1, res.frames.shape[0]):
            count, _ = np.asarray(
                stencil.rotor_metrics(res.frames[k], res.frames[k - 1])
            )
            assert res.probes["rotors"][k, 0] == count

    def test_events_preserve_buffer(self):
        # an S2 event between chunks must not break the stream
        sim = self.make_sim()
        sim.define(s1=True)
        sim.add_pace_op("s2", "luq", 1.0)
        res = sim.simulate(schedule=[(10, "s2")])
        assert res.probes["rotors"].shape == (res.steps, 2)
        assert np.isfinite(res.probes["rotors"]).all()

    def test_ratio_model_raises(self):
        class Ratio(Fenton4v):
            fast_slow_ratio = 2

        cfg = SimConfig(width=32, height=32, duration=10, rotor_probe=True)
        sim = Simulation(Ratio(cfg))
        sim.define(s1=False)
        with pytest.raises(ValueError, match="fast_slow_ratio"):
            sim.simulate()

    def test_mesh_mode_contract_in_config(self):
        """r4: the rotor census shards with the plane on the shard_map
        mesh ('auto'/'spmd'); only the GSPMD path (no partitioned delay
        ring) still rejects."""
        cfg = SimConfig(rotor_probe=True, mesh_shape=(8,))
        assert cfg.mesh_mode == "auto"
        with pytest.raises(ValueError, match="GSPMD"):
            SimConfig(rotor_probe=True, mesh_shape=(8,),
                      mesh_mode="gspmd")

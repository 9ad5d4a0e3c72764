"""Smoke tests: every example script runs end-to-end at tiny size on the
CPU backend (the reference's de-facto test strategy was 'run the
script', SURVEY.md §4 — here each script is exercised as a subprocess
exactly as a user would invoke it)."""

import os
import subprocess
import sys

import numpy as np
import pytest


# long tail: excluded from the smoke tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")


def run_example(tmp_path, script, *args, timeout=420):
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
           "PYTHONPATH": REPO}
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script), *args],
        capture_output=True, text=True, timeout=timeout,
        cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stdout[-1500:] + proc.stderr[-1500:]
    return proc.stdout


class TestExamples:
    def test_fenton_spiral(self, tmp_path):
        run_example(tmp_path, "fenton_spiral.py",
                    "--size", "64", "--duration", "40")
        assert os.path.exists(tmp_path / "cube.npy")
        cube = np.load(tmp_path / "cube.npy")
        assert cube.shape[1:] == (64, 64)
        assert np.isfinite(cube).all()

    def test_br_spiral(self, tmp_path):
        run_example(tmp_path, "br_spiral.py",
                    "--size", "64", "--duration", "40")

    def test_lr1_spiral(self, tmp_path):
        out = run_example(tmp_path, "lr1_spiral.py",
                          "--size", "48", "--duration", "20")
        assert "cut@" in out
        assert os.path.exists(tmp_path / "cube.npy")
        cube = np.load(tmp_path / "cube.npy")
        assert cube.shape[1:] == (48, 48)
        assert np.isfinite(cube).all()

    def test_tp06_spiral(self, tmp_path):
        out = run_example(tmp_path, "tp06_spiral.py",
                          "--size", "48", "--duration", "10",
                          "--cut-at", "10")
        assert "cut@" in out
        assert os.path.exists(tmp_path / "cube.npy")
        cube = np.load(tmp_path / "cube.npy")
        assert cube.shape[1:] == (48, 48)
        assert np.isfinite(cube).all()

    def test_court_run_chained(self, tmp_path):
        out = run_example(tmp_path, "court_run.py",
                          "--size", "48", "--duration", "20")
        assert "saved trend data" in out
        assert os.path.exists(tmp_path / "vol_na_2.dat")

    def test_court_ultra_protocol(self, tmp_path):
        out = run_example(tmp_path, "court_ultra_run.py",
                          "--size", "48", "--duration", "20", "--rotor")
        assert "rho =" in out
        assert "rotors: mean" in out
        assert os.path.exists(tmp_path / "state_small.npz")
        assert os.path.exists(tmp_path / "state_large.npz")

    def test_egm(self, tmp_path):
        run_example(tmp_path, "egm_run.py",
                    "--size", "64", "--duration", "30")
        dat = np.loadtxt(tmp_path / "test.dat")
        assert np.isfinite(dat).all()

    def test_egm_sharded(self, tmp_path):
        # default = the measured-best wide-halo shard_map path
        run_example(tmp_path, "egm_sharded.py",
                    "--width", "64", "--height", "64", "--duration", "10")

    def test_egm_sharded_alt_paths(self, tmp_path):
        run_example(tmp_path, "egm_sharded.py", "--width", "64",
                    "--height", "64", "--duration", "5", "--narrow")
        run_example(tmp_path, "egm_sharded.py", "--width", "64",
                    "--height", "64", "--duration", "5", "--gspmd")

    def test_fenton_simple_and_jit(self, tmp_path):
        run_example(tmp_path, "fenton_simple.py",
                    "--size", "48", "--duration", "20")
        run_example(tmp_path, "fenton_simple.py",
                    "--size", "48", "--duration", "20", "--jit")

    def test_s2_scan(self, tmp_path):
        out = run_example(tmp_path, "s2_scan.py",
                          "--size", "48", "--members", "3",
                          "--s2-from", "30", "--s2-to", "60",
                          "--duration", "80")
        assert "S2 scan: 3 members" in out
        assert out.count("S2 @") == 3

    def test_restitution(self, tmp_path):
        out = run_example(tmp_path, "restitution.py",
                          "--size", "8", "--members", "3",
                          "--ci-from", "240", "--ci-to", "340",
                          "--bcl", "350", "--n-s1", "1",
                          "--save-plot", "rest.png")
        assert "restitution: 3 couplings" in out
        assert "S1 APD90" in out
        assert os.path.exists(tmp_path / "rest.png")

    def test_restitution_dynamic(self, tmp_path):
        out = run_example(tmp_path, "restitution.py",
                          "--dynamic", "--size", "8", "--members", "3",
                          "--ci-from", "240", "--ci-to", "360",
                          "--beats", "3", "--save-plot", "dyn.png")
        assert "dynamic restitution: 3 rates" in out
        assert "alternans" in out
        assert os.path.exists(tmp_path / "dyn.png")

    def test_drug_block(self, tmp_path):
        # br is the cheapest model with a real K current; the example's
        # directions themselves are pinned in tests/test_drug.py
        out = run_example(tmp_path, "drug_block.py",
                          "--model", "br", "--doses", "1.0,0.5",
                          "--save-plot", "drug.png")
        assert "g_x1 dose-response" in out
        assert os.path.exists(tmp_path / "drug.png")

    def test_drug_block_border(self, tmp_path):
        out = run_example(tmp_path, "drug_block.py",
                          "--border", "0.25", "--width", "48",
                          "--save-plot", "border.png")
        assert "step +" in out
        assert os.path.exists(tmp_path / "border.png")

    def test_alternans_map(self, tmp_path):
        # fenton exercises the plumbing quickly; its shallow restitution
        # paces concordantly (the discordant tp06 case is pinned in
        # tests/test_apdmap.py — too slow for a subprocess smoke)
        out = run_example(tmp_path, "alternans_map.py",
                          "--model", "fenton", "--width", "64",
                          "--height", "8", "--beats", "3",
                          "--save-plot", "alt.png")
        assert "one batched program" in out
        assert "capture:" in out
        assert os.path.exists(tmp_path / "alt.png")

    def test_tp06_transmural(self, tmp_path):
        # one beat on a short strip keeps the subprocess smoke cheap;
        # the full dispersion pins live in
        # tests/test_hetero.py::TestHetPlanePhysics
        out = run_example(tmp_path, "tp06_transmural.py",
                          "--width", "64", "--beats", "2",
                          "--bcl", "500", "--save-plot", "apd.png",
                          timeout=600)
        assert '"dispersion_ms"' in out
        assert '"truncated_fraction"' in out
        assert os.path.exists(tmp_path / "apd.png")

    def test_tip_trajectory(self, tmp_path):
        # synthetic one-rotor movie: cos(theta0 - omega t)
        y, x = np.mgrid[0:32, 0:32]
        th0 = np.arctan2(y - 15.5, x - 15.5)
        t = np.arange(30)[:, None, None]
        cube = np.cos(th0[None] - (np.pi / 4) * t).astype(np.float32)
        np.save(tmp_path / "cube.npy", cube)
        out = run_example(tmp_path, "tip_trajectory.py", "cube.npy",
                          "--save-plot", "tips.png")
        assert "tip 0: charge +1" in out
        assert os.path.exists(tmp_path / "tips.png")

    def test_fenton_simple_timeline(self, tmp_path):
        # the reference's per-stage Chrome-trace evidence
        # (fenton_simple.py:207-215 / fenton_jit.py:210-218)
        out = run_example(tmp_path, "fenton_simple.py",
                          "--size", "32", "--samples", "20", "--timeline",
                          "--jit")
        assert "timeline_jit_trace" in out
        trace_dir = tmp_path / "timeline_jit_trace"
        assert trace_dir.is_dir()
        assert any(trace_dir.rglob("*"))

    def test_fiber_anisotropy(self, tmp_path):
        out = run_example(tmp_path, "fiber_anisotropy.py",
                          "--size", "64", "--duration", "10")
        assert "long/short" in out
        assert os.path.exists(tmp_path / "anisotropy.png")

    def test_playcube(self, tmp_path):
        cube = np.random.rand(3, 16, 16).astype(np.float32)
        np.save(tmp_path / "cube.npy", cube)
        run_example(tmp_path, "playcube.py", "cube.npy")

    def test_scroll_wave(self, tmp_path):
        out = run_example(tmp_path, "scroll_wave.py",
                          "--size", "40", "--depth", "6",
                          "--duration", "60", "--s2-ms", "30",
                          "--save-cube", "scroll.npy")
        assert "activity fraction over time" in out
        cube = np.load(tmp_path / "scroll.npy")
        assert cube.ndim == 3 and cube.shape[1:] == (40, 40)
        assert np.isfinite(cube).all()

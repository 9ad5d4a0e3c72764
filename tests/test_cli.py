"""CLI smoke tests (tiny grids, CPU)."""

import json
import os

import numpy as np
import pytest

from fib_tf_tpu import cli


class TestRun:
    def test_fenton_run_with_everything(self, tmp_path, monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        rc = cli.main([
            "run", "--model", "fenton", "--width", "48", "--height", "48",
            "--duration", "10", "--hole", "24,24,6", "--s2", "5",
            "--frames", "5", "--save-cube", "cube.npy",
            "--save-state", "state.npz",
        ])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        rec = json.loads(out)
        assert rec["model"] == "fenton"
        assert rec["outer_steps"] == 10
        assert os.path.exists("cube.npy")
        assert os.path.exists("state.npz")

    def test_resume_from_state(self, tmp_path, monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        cli.main(["run", "--model", "fenton", "--width", "48", "--height",
                  "48", "--duration", "5", "--save-state", "s.npz"])
        rc = cli.main(["run", "--model", "fenton", "--width", "48",
                       "--height", "48", "--duration", "5",
                       "--load-state", "s.npz"])
        assert rc == 0

    def test_run_with_mesh(self, tmp_path, monkeypatch, capsys):
        """--mesh reaches the shard_map wide-halo path ('auto' routing,
        VERDICT r3 #1) on the 8 virtual devices."""
        monkeypatch.chdir(tmp_path)
        rc = cli.main([
            "run", "--model", "br", "--width", "64", "--height", "128",
            "--duration", "5", "--mesh", "8",
        ])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["outer_steps"] == 10

    def test_run_with_mesh_gspmd(self, tmp_path, monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        rc = cli.main([
            "run", "--model", "fenton", "--width", "64", "--height", "64",
            "--duration", "5", "--mesh", "4x2", "--gspmd",
        ])
        assert rc == 0

    def test_run_transmural_cell_type(self, tmp_path, monkeypatch,
                                      capsys):
        """--cell-type transmural reaches the per-pixel wedge planes
        from the CLI (VERDICT r4 #1: cell_type must be config
        -reachable)."""
        monkeypatch.chdir(tmp_path)
        rc = cli.main([
            "run", "--model", "tp06", "--width", "48", "--height", "8",
            "--duration", "2", "--cell-type", "transmural",
            "--cell-type-bands", "0.3,0.7", "--kernel", "xla",
        ])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["model"] == "tp06"

    def test_run_fibrosis(self, tmp_path, monkeypatch, capsys):
        """--fibrosis attaches the patchy diffusion map; conduction is
        measurably slower than the homogeneous run (the wavefront-probe
        cycle detector fires later)."""
        monkeypatch.chdir(tmp_path)
        args = ["run", "--model", "fenton", "--width", "64",
                "--height", "64", "--duration", "30", "--kernel", "xla"]
        cli.main(args)
        base = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        cli.main(args + ["--fibrosis", "0.3,0.7,1"])
        fib = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert fib["cycle_lengths"][0][0] > base["cycle_lengths"][0][0]

    def test_warmup(self, tmp_path, monkeypatch, capsys):
        """warmup compiles+runs the requested kernel families (interpret
        mode on CPU) and prints per-kernel timings (VERDICT r3 #6)."""
        monkeypatch.chdir(tmp_path)
        rc = cli.main(["warmup", "--model", "fenton", "--size", "32",
                       "--kernels", "whole,block"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "whole-grid kernel:" in out
        assert "spmd block kernel:" in out

    def test_warmup_bad_family(self):
        import pytest

        with pytest.raises(SystemExit):
            cli.main(["warmup", "--kernels", "tiled,nope"])

    def test_run_gscale(self, tmp_path, monkeypatch, capsys):
        """--gscale bakes channel-block factors into the run; the
        dose-free factor 1.0 stays bitwise (tests/test_drug.py) so a
        smoke check that the drugged path executes is enough here."""
        monkeypatch.chdir(tmp_path)
        rc = cli.main(["run", "--model", "fenton", "--width", "32",
                       "--height", "32", "--duration", "5",
                       "--gscale", "g_fi=0.8,g_so=0.9"])
        assert rc == 0
        rec = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["model"] == "fenton"

    def test_run_gscale_unknown_channel(self, tmp_path, monkeypatch):
        with pytest.raises(ValueError, match="no scalable channel"):
            cli.main(["run", "--model", "fenton", "--width", "32",
                      "--height", "32", "--duration", "5",
                      "--gscale", "g_Kr=0.5"])

    def test_warmup_gscale_skips_unsupported(self, tmp_path, monkeypatch,
                                             capsys):
        monkeypatch.chdir(tmp_path)
        rc = cli.main(["warmup", "--model", "fenton", "--size", "32",
                       "--kernels", "whole", "--gscale", "g_Kr=0.5"])
        assert rc == 0
        assert "skipped (no scalable channel" in capsys.readouterr().out

    def test_mesh_spec_rejected(self, tmp_path, monkeypatch):
        import pytest

        with pytest.raises(SystemExit):
            cli.main(["run", "--mesh", "8y2", "--duration", "1"])

    def test_br_with_electrode(self, tmp_path, monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        rc = cli.main([
            "run", "--model", "br", "--width", "48", "--height", "48",
            "--duration", "5", "--electrode", "30,24,4",
        ])
        assert rc == 0

    def test_fiber_flags(self, tmp_path, monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        rc = cli.main([
            "--cpu", "run", "--model", "fenton", "--width", "48",
            "--height", "48", "--duration", "5",
            "--fiber-angle", "30", "--fiber-ratio", "0.5",
        ])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["outer_steps"] == 5

    def test_fiber_angle_alone_rejected(self, tmp_path, monkeypatch):
        import pytest

        monkeypatch.chdir(tmp_path)
        with pytest.raises(ValueError, match="isotropic"):
            cli.main([
                "run", "--model", "fenton", "--width", "48",
                "--height", "48", "--duration", "5",
                "--fiber-angle", "30",
            ])


class TestTable:
    def test_golden_values(self, capsys):
        rc = cli.main(["table", "--golden", "-50"])
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert len(lines) == 30
        assert lines[0].startswith("d_infinity")

    def test_table_out(self, tmp_path, capsys):
        out = str(tmp_path / "tbl.npy")
        rc = cli.main(["table", "--out", out])
        assert rc == 0
        tbl = np.load(out)
        assert tbl.shape == (150, 30)


class TestReplay:
    def test_replay_headless(self, tmp_path, capsys):
        cube = np.random.rand(3, 16, 16).astype(np.float32)
        p = str(tmp_path / "cube.npy")
        np.save(p, cube)
        assert cli.main(["replay", p]) == 0


class TestRotorFlag:
    def test_run_rotor_summary(self, tmp_path, monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        rc = cli.main([
            "run", "--model", "fenton", "--width", "48", "--height", "48",
            "--duration", "10", "--rotor", "--rotor-tau", "2",
        ])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["rotors"]["mean_count"] == 0.0  # plane wave
        assert rec["rotors"]["final_net_charge"] == 0


class TestTips:
    def test_tips_json_synthetic_rotor(self, tmp_path, capsys):
        y, x = np.mgrid[0:32, 0:32]
        th0 = np.arctan2(y - 15.5, x - 15.5)
        t = np.arange(30)[:, None, None]
        cube = np.cos(th0[None] - (np.pi / 4) * t).astype(np.float32)
        p = str(tmp_path / "cube.npy")
        np.save(p, cube)
        rc = cli.main(["tips", p, "--json",
                       "--save-plot", str(tmp_path / "tips.png")])
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        rec = json.loads(next(l for l in lines if l.startswith("{")))
        assert rec["n_tracks"] == 1
        assert rec["tracks"][0]["charge"] == 1
        assert os.path.exists(tmp_path / "tips.png")

    def test_filaments_json_synthetic_scroll(self, tmp_path, capsys):
        # rotating spiral extruded over 6 z-slices: one transmural
        # filament per frame pair
        y, x = np.mgrid[0:32, 0:32]
        th0 = np.arctan2(y - 15.5, x - 15.5)
        t = np.arange(12)[:, None, None]
        sheet = np.cos(th0[None] - (np.pi / 4) * t).astype(np.float32)
        movie = np.repeat(sheet[:, None], 6, axis=1)  # [T, 6, 32, 32]
        p = str(tmp_path / "vol.npy")
        np.save(p, movie)
        rc = cli.main(["filaments", p, "--json"])
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        rec = json.loads(next(l for l in lines if l.startswith("{")))
        assert rec["depth"] == 6
        assert rec["max_filaments"] >= 1
        assert rec["mean_filaments"] >= 0.5


class TestDFMap:
    def test_dfmap_json(self, tmp_path, capsys):
        # 200 frames -> 0.5 Hz bins: the +-0.75 Hz OI band must span the
        # Hann-window leakage into adjacent bins
        t = np.arange(200) * 0.01
        cube = np.tile(
            np.sin(2 * np.pi * 8.0 * t)[:, None, None], (1, 16, 16)
        ).astype(np.float32)
        p = str(tmp_path / "cube.npy")
        np.save(p, cube)
        rc = cli.main(["dfmap", p, "--json",
                       "--save-plot", str(tmp_path / "df.png")])
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        rec = json.loads(next(l for l in lines if l.startswith("{")))
        assert abs(rec["median_df_hz"] - 8.0) <= 1.0
        assert rec["median_oi"] > 0.9
        assert os.path.exists(tmp_path / "df.png")


class TestS2Scan:
    def test_scan_json(self, capsys):
        rc = cli.main([
            "s2scan", "--model", "fenton", "--width", "48", "--height",
            "48", "--members", "3", "--s2-from", "30", "--s2-to", "60",
            "--duration", "80", "--json",
        ])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["model"] == "fenton"
        assert len(rec["s2_ms"]) == 3
        assert len(rec["sustained"]) == 3

    def test_scan_table_output(self, capsys):
        rc = cli.main([
            "s2scan", "--model", "fenton", "--width", "48", "--height",
            "48", "--members", "2", "--s2-from", "30", "--s2-to", "50",
            "--duration", "60",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert out.count("S2 @") == 2


class TestVolume:
    def test_volume_json_with_everything(self, tmp_path, capsys):
        cube = tmp_path / "vol_cube"
        vol = tmp_path / "vol_movie"
        ecg = tmp_path / "ecg.npy"
        rc = cli.main([
            "volume", "--model", "fenton", "--depth", "6", "--width",
            "24", "--height", "24", "--duration", "40", "--s2", "20",
            "--hole", "12,12,4", "--fiber-twist", "90", "--fiber-ratio",
            "0.4", "--dz-ratio", "0.8", "--rotor", "--frames", "20",
            "--ecg=-4,12,12", "--ecg", "10,12,12",
            "--save-ecg", str(ecg),
            "--save-cube", str(cube), "--save-volume", str(vol),
        ])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["shape"] == [6, 24, 24]
        assert rec["outer_steps"] == 80
        assert 0.0 <= rec["final_activity_fraction"] <= 1.0
        assert len(rec["rotors"]["final_per_slice"]) == 6
        assert len(rec["ecg_p2p"]) == 2 and rec["ecg_p2p"][0] > 0
        assert np.load(str(ecg)).shape == (80, 2)
        movie = np.load(str(vol) + ".npy")
        assert movie.ndim == 4 and movie.shape[1:] == (6, 24, 24)
        assert np.load(str(cube) + ".npy").shape[1:] == (24, 24)


class TestBenchMatrix:
    def test_bench_json_rows_carry_spread(self, capsys):
        """The Table-1 matrix reports median + [min, max] spread per row
        (VERDICT r4 #6), one JSON line per row, detector prints silenced."""
        rc = cli.main([
            "bench", "--size", "48", "--duration", "5", "--runs", "2",
            "--json",
        ])
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        rows = [json.loads(ln) for ln in lines]  # every line must parse
        assert len(rows) == 5  # BR 2x2 matrix + fenton
        for rec in rows:
            assert rec["samples"] == 2
            lo, hi = rec["spread"]
            assert lo <= rec["value"] <= hi
        assert {r["model"] for r in rows} == {"br", "fenton"}
        assert sum(r.get("cheby") is True for r in rows) == 2


class TestRestitution:
    def test_restitution_json(self, capsys):
        rc = cli.main([
            "restitution", "--model", "fenton", "--size", "8",
            "--members", "2", "--ci-from", "240", "--ci-to", "320",
            "--bcl", "350", "--n-s1", "1", "--json",
        ])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["model"] == "fenton"
        assert len(rec["apd_ms"]) == 2
        assert all(rec["captured"])
        assert 150.0 <= rec["apd_s1_ms"] <= 230.0

    def test_restitution_dynamic_json(self, capsys):
        rc = cli.main([
            "restitution", "--model", "fenton", "--size", "8",
            "--members", "2", "--ci-from", "260", "--ci-to", "360",
            "--dynamic", "--beats", "3", "--json",
        ])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["protocol"] == "dynamic"
        assert len(rec["apd_ms"]) == 2 and len(rec["alternans_ms"]) == 2
        assert all(rec["captured"])

    def test_restitution_cv_json(self, capsys):
        rc = cli.main([
            "restitution", "--model", "fenton", "--cv",
            "--members", "2", "--ci-from", "250", "--ci-to", "400",
            "--bcl", "400", "--n-s1", "1", "--json",
        ])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["protocol"] == "cv"
        assert rec["cv_s1"] is not None and rec["cv_s1"] > 0
        assert all(rec["captured"])
        assert all(v is not None for v in rec["cv"])

    def test_restitution_cv_dynamic_conflict(self):
        with pytest.raises(SystemExit):
            cli.main(["restitution", "--cv", "--dynamic"])

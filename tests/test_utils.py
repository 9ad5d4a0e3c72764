"""Tests for checkpointing, visualization, and profiling utilities."""

import os

import numpy as np
import pytest

from fib_tf_tpu.config import SimConfig
from fib_tf_tpu.utils import checkpoint, viz
from fib_tf_tpu.utils.sharedlib import find_shared_library


class TestCheckpoint:
    def test_roundtrip_with_config(self, tmp_path):
        state = {"V": np.random.rand(8, 8).astype(np.float32),
                 "m": np.zeros((8, 8), np.float32)}
        cfg = SimConfig(width=8, height=8, duration=10)
        p = str(tmp_path / "ckpt.npz")
        checkpoint.save_state(p, state, cfg)
        got, got_cfg = checkpoint.load_state(p)
        assert set(got) == {"V", "m"}
        np.testing.assert_array_equal(got["V"], state["V"])
        assert got_cfg == cfg

    def test_reference_style_npy_dict(self, tmp_path):
        # court_ultra.py:511-519 pattern: np.save of a dict, .item(0) load
        state = {"V": np.ones((4, 4), np.float32)}
        p = str(tmp_path / "state_small.npy")
        np.save(p, state)
        got, cfg = checkpoint.load_state(p)
        np.testing.assert_array_equal(got["V"], state["V"])
        assert cfg is None


class TestViz:
    def test_headless_screen_imshow_save(self, tmp_path):
        im = viz.Screen(16, 16, "test", backend="headless")
        im.imshow(np.linspace(0, 1, 256).reshape(16, 16))
        p = str(tmp_path / "frame.png")
        im.save(p)
        assert os.path.exists(p)

    def test_annotations(self):
        im = viz.Screen(32, 32, backend="headless")
        im.draw_text("hi", (1, 1))
        im.plot(np.sin(np.linspace(0, 6, 50)))
        im.imshow(np.zeros((32, 32)))
        assert im._backend.last_frame is not None
        # annotations consumed
        assert im._annotations == []

    def test_to_rgb_colormap(self):
        rgb = viz.to_rgb(np.zeros((4, 4)), cmap="viridis")
        assert rgb.shape == (4, 4, 3)
        assert rgb.dtype == np.uint8

    def test_play_cube(self, tmp_path):
        cube = np.random.rand(5, 8, 8).astype(np.float32)
        p = str(tmp_path / "cube.npy")
        viz.save_cube(p, cube)
        im = viz.Screen(8, 8, backend="headless", keep_all_frames=True)
        viz.play_cube(p, im=im)
        assert len(im._backend.frames) == 5

    def test_find_shared_library_missing(self):
        assert find_shared_library("definitely_not_a_real_lib_xyz") is None


class TestProfiling:
    def test_time_fn_and_throughput(self):
        import jax.numpy as jnp
        from fib_tf_tpu.utils import profiling

        f = lambda x: x * 2  # noqa: E731
        t = profiling.time_fn(f, jnp.ones((32, 32)), iters=2)
        assert t >= 0.0
        rep = profiling.throughput(512, 512, 10000, 1.0, 0.1)
        assert rep["wall_s_per_sim_s"] == pytest.approx(1.0)
        assert rep["cell_updates_per_sec"] == pytest.approx(512 * 512 * 1e4)

    def test_dump_hlo(self, tmp_path):
        import jax.numpy as jnp
        from fib_tf_tpu.utils import profiling

        p = profiling.dump_hlo(
            lambda x: x + 1, (jnp.ones((4, 4)),), str(tmp_path / "f.hlo")
        )
        assert os.path.getsize(p) > 0

"""Multi-process tests of the distributed runtime glue
(parallel/distributed.py): two OS processes, each with 2 virtual CPU
devices, join one jax.distributed job and advance over the 4-device
global mesh (VERDICT r1 #10):

  * a GSPMD-sharded Beeler-Reuter step (the XLA-inferred-collectives
    path), and
  * the FLAGSHIP sharded path (VERDICT r4 #2): the shard_map wide-halo
    chunk with the per-shard fused block kernel and the sharded ECG
    probe (parallel/spmd.make_spmd_chunk) — what `mesh_mode='auto'`
    routes every qualifying mesh run to — asserted equal to the
    unsharded single-process reference, probes included.

This is the DCN story's CPU stand-in: the same initialize() + global
mesh + sharded program that spans hosts on a real pod.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


# long tail: excluded from the smoke tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

WORKER = r"""
import os, sys
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
import jax.numpy as jnp
import numpy as np

from fib_tf_tpu.config import SimConfig
from fib_tf_tpu.models import BeelerReuter, grid_geometry
from fib_tf_tpu.parallel import distributed, shard_state_global

distributed.initialize(f"localhost:{port}", n, pid)
assert jax.process_count() == n

mesh = distributed.global_mesh()          # all 4 devices, both processes
assert mesh.devices.size == 2 * n

cfg = SimConfig(width=32, height=32, dt=0.1, duration=1, diff=0.809,
                cheby=True, skip=True)
model = BeelerReuter(cfg)
geom = grid_geometry()
state = shard_state_global(model.initial_state(), mesh)

@jax.jit
def steps(s):
    return jax.lax.scan(lambda st, _: (model.step(st, geom), None),
                        s, None, length=3)[0]

out = steps(state)
# fully-replicated reduction: identical on every process
checksum = float(jnp.sum(out["V"]))
assert np.isfinite(checksum)
print(f"DIST_OK pid={pid} ndev={len(jax.devices())} checksum={checksum:.6f}")
"""


SPMD_WORKER = r"""
import os, sys
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils

from fib_tf_tpu.config import SimConfig
from fib_tf_tpu.models import BeelerReuter, grid_geometry
from fib_tf_tpu.ops import stencil
from fib_tf_tpu.parallel import distributed, shard_state_global
from fib_tf_tpu.parallel.spmd import make_spmd_chunk

distributed.initialize(f"localhost:{port}", n, pid)
assert jax.process_count() == n

mesh = distributed.global_mesh()          # all 4 devices, both processes
assert mesh.devices.size == 2 * n

cfg = SimConfig(width=32, height=64, dt=0.1, duration=1, diff=0.809,
                cheby=True, skip=True)
model = BeelerReuter(cfg)
ecg_w = [stencil.ecg_weights(64, 32, 16, 32, 8.0)]

# the flagship path: shard_map wide-halo (one K-row ppermute exchange
# per outer step, here over DCN) + the per-shard fused block kernel
chunk = make_spmd_chunk(model, mesh, length=3, wide_halo=True,
                        use_kernel=True, ecg_weights=ecg_w)
state = shard_state_global(model.initial_state(), mesh)
got, probes = chunk(state)

# unsharded single-process reference, computed locally on each host
geom = grid_geometry()
ref = {k: jnp.asarray(v) for k, v in model.initial_state().items()}
step = jax.jit(lambda s: model.step(s, geom))
ref_ecg = []
for _ in range(3):
    ref = step(ref)
    lap = geom.laplace(geom.enforce_boundary(ref["V"]))
    ref_ecg.append(float(jnp.sum(lap * jnp.asarray(ecg_w[0]))))

for k in ref:
    g = multihost_utils.process_allgather(got[k], tiled=True)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref[k]),
                               rtol=1e-4, atol=1e-5, err_msg=k)
# the psum'd probe stream is replicated: directly fetchable everywhere
np.testing.assert_allclose(np.asarray(probes["ecg"][:, 0]), ref_ecg,
                           rtol=1e-3, atol=1e-4)
checksum = float(jnp.sum(got["V"]))
print(f"SPMD_OK pid={pid} ndev={len(jax.devices())} checksum={checksum:.6f}")
"""


def free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_gspmd_step(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = free_port()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": repo_root}
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo_root,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=280)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    sums = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("DIST_OK")]
        assert line, out[-2000:]
        sums.append(float(line[0].split("checksum=")[1]))
    # both processes see the same global array
    assert sums[0] == pytest.approx(sums[1], rel=1e-6)


def test_two_process_spmd_block_kernel(tmp_path):
    """The flagship shard_map wide-halo + block-kernel chunk runs
    across process boundaries and matches the unsharded reference,
    probes included (VERDICT r4 #2) — the worker itself asserts
    sharded == unsharded via process_allgather."""
    script = tmp_path / "worker.py"
    script.write_text(SPMD_WORKER)
    port = free_port()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": repo_root}
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo_root,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=280)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    sums = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("SPMD_OK")]
        assert line, out[-2000:]
        sums.append(float(line[0].split("checksum=")[1]))
    assert sums[0] == pytest.approx(sums[1], rel=1e-6)

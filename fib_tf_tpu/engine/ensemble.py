"""Batched (ensemble) simulation — the data-parallel axis.

No reference equivalent (it ran one sheet per process); on TPU an
ensemble of independent simulations — parameter sweeps, S2-timing scans,
initial-condition perturbations — is just `vmap` over a leading axis, and
sharding that axis over the mesh is embarrassingly-parallel data
parallelism (no halos cross ensemble members).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fib_tf_tpu.models.base import IonicModel, grid_geometry


def stack_states(states) -> Dict[str, np.ndarray]:
    """List of state dicts -> one stacked pytree with leading ensemble
    axis."""
    keys = states[0].keys()
    return {k: np.stack([np.asarray(s[k]) for s in states]) for k in keys}


def run_ensemble(
    model: IonicModel,
    stacked_state: Dict[str, np.ndarray],
    n_outer: int,
    phase: Optional[np.ndarray] = None,
    mesh=None,
):
    """Advance every ensemble member `n_outer` outer steps.

    Returns (final stacked state, per-member probe streams [n, n_outer]).
    With `mesh`, the ensemble axis is sharded over the mesh's first axis
    (pure data parallelism over ICI-connected chips).
    """
    geom = grid_geometry(phase)
    vstep = jax.vmap(lambda s: model.step(s, geom))
    vprobe = jax.vmap(model.probe)

    def body(s, _):
        s = vstep(s)
        return s, vprobe(s)

    # not donated: donation forces the scan result back into the input
    # buffers, inserting a per-iteration state copy (engine/simulation.py
    # _chunk_fn has the v5e measurements); the batch stays live one extra
    # call, which is just HBM footprint
    @jax.jit
    def chunk(s):
        final, probes = jax.lax.scan(body, s, None, length=n_outer)
        return final, probes.T  # [n_members, n_outer]

    state = {k: jnp.asarray(v) for k, v in stacked_state.items()}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P(mesh.axis_names[0]))
        state = {k: jax.device_put(v, sh) for k, v in state.items()}
    final, probes = chunk(state)
    return (
        {k: np.asarray(v) for k, v in final.items()},
        np.asarray(probes),
    )

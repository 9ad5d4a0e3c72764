"""3D (volume) simulation — scroll waves, beyond reference parity.

The reference is strictly 2D; its spiral-reentry experiments
(fenton.py:155-187, br.py S2 protocols) have a 3D generalization — the
scroll wave — that this runner makes a one-call experiment.  The design
mirrors `engine/ensemble.py`: a standalone jitted-scan driver (the full
`Simulation` engine's events/observers/viz are sheet-shaped), with the
model zoo reused UNCHANGED — ionic math is elementwise, and the two
spatial operators come from the injected 3D `Geometry`
(models/base.volume_geometry, ops/stencil3d).

Kernels: volumes run the fused Pallas VOLUME kernel by default on TPU
(`_use_volume_kernel`; ops/pallas_volume.py — [D*H, W]-flattened with
slice-edge masks, measured 2.5-3.7x over XLA for fenton/br, with the
row-tiled variant past the whole-volume compile cap and court staying
XLA — docs/OPTIMIZATIONS.md §14).  Scaling: with a `mesh`, the z axis is
sharded — GSPMD (one ghost slice each way as XLA collectives) or the
wide-halo shard_map path feeding the per-shard volume kernel
(parallel/volume_spmd.py), with `halo_k` sub-cadence for shallow shards.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from fib_tf_tpu.models.base import IonicModel, volume_geometry
from fib_tf_tpu.ops import stencil3d

State = Dict[str, jnp.ndarray]


def volume_state(
    model: IonicModel, depth: int, s1: bool = True
) -> Dict[str, np.ndarray]:
    """Extrude the model's 2D initial state along z: `[D, H, W]` planes.
    The S1 stimulus becomes a full-depth slab, so the first wave is
    planar in 3D exactly as it is in 2D."""
    st = model.initial_state(s1=s1)
    return {
        k: np.repeat(np.asarray(v, np.float32)[None], depth, axis=0)
        for k, v in st.items()
    }


@dataclass
class VolumeEvent:
    """A stimulus fired at the END of outer step `step`: one of the 8
    named 2D pace locations extruded over z-slices `[z0:z1)` (the
    cross-field S2 that turns a planar wave into a scroll), or an
    explicit `[D, H, W]` mask with background model.min_v."""

    step: int
    loc: Optional[str] = None
    v: Optional[float] = None
    mask: Optional[np.ndarray] = None
    z0: int = 0
    z1: Optional[int] = None

    def resolve_mask(self, model: IonicModel, depth: int) -> np.ndarray:
        if (self.loc is None) == (self.mask is None):
            raise ValueError("VolumeEvent needs exactly one of loc/mask")
        if self.mask is not None:
            return np.asarray(self.mask, np.float32)
        v = model.max_v if self.v is None else self.v
        return stencil3d.pace_mask3d(
            depth, model.cfg.height, model.cfg.width, self.loc, v,
            model.min_v, self.z0, self.z1,
        )


# VMEM envelope for whole-volume kernel residency — same measured cutover
# as the 2D engine's whole-grid kernel (Simulation.WHOLE_GRID_STATE_MB_MAX)
VOLUME_KERNEL_STATE_MB_MAX = 32.0

# Mosaic compile time for the flat volume kernel grows ~quadratically in
# the (8, 128) tile count of the flattened [D*H, W] sheet (measured on
# v5e, fenton body: 512 tiles -> 158 s, 768 -> 399 s, 1024 -> >590 s,
# 2048 -> >1 h; shift distance and aspect ratio don't matter).  'auto'
# caps the kernel at 768 tiles (= 786k cells) so the one-time compile
# stays in the same few-minute band as the 2D kernels; kernel='pallas'
# overrides for users willing to pay a documented long compile once
# (.jax_cache makes reruns free).
VOLUME_KERNEL_CELLS_MAX = 768 * 8 * 128


# VMEM budget for the tiled volume kernel's per-tile blocks (scratch +
# blocked outputs).  Mosaic's scoped allocation adds ~3.5x the raw block
# bytes in temporaries (measured: BR 8x256x512 tile 128 = 34 MB raw ->
# 120.65 MB scoped, over the 110 MB limit; fenton tile 128 = 18 MB raw
# compiles and runs), so the raw budget stays ~24 MB
TILED_VOLUME_BLOCK_MB_MAX = 24.0


def pick_volume_tile_rows(model: IonicModel, depth: int) -> Optional[int]:
    """Largest valid `tile_rows` for ops.pallas_volume.
    make_tiled_volume_step, or None.  Valid = multiple of 8 dividing H
    with H >= tile_rows + 2K, the per-tile flattened block within the
    whole-volume compile band (VOLUME_KERNEL_CELLS_MAX — compile cost is
    set by the BLOCK program, the grid just repeats it), and the VMEM
    blocks within budget.  Largest wins: the temporal-halo redundancy is
    (tile_rows + 2K) / tile_rows of the HBM reads."""
    from fib_tf_tpu.ops.pallas_tiled import halo_rows

    cfg = model.cfg
    h, w = cfg.height, cfg.width
    if h % 8 != 0 or w % 128 != 0:
        return None
    k = halo_rows(model.dt_per_step)
    n = len(model.state_keys())
    for tile_rows in range(h - h % 8, 0, -8):
        if h % tile_rows != 0:
            continue
        ext_h = tile_rows + 2 * k
        if h < ext_h:
            continue
        if depth * ext_h * w > VOLUME_KERNEL_CELLS_MAX:
            continue
        block_mb = (
            n * depth * (ext_h + tile_rows) * w * 4 / 2 ** 20
        )
        if block_mb > TILED_VOLUME_BLOCK_MB_MAX:
            continue
        return tile_rows
    return None


def _use_volume_kernel(model: IonicModel, depth: int, mesh, kernel: str,
                       full_fiber: bool = False) -> Optional[str]:
    """Kernel selection for run_volume, mirroring Simulation._use_pallas:
    'pallas' forces the fused whole-volume kernel (rejecting un-lowerable
    combinations up front), 'auto' picks the profitable fused form on
    TPU — 'whole' (VMEM-resident whole volume) within the compile/VMEM
    caps, 'tiled' (row-tiled temporal blocking) past them for the
    HBM-bound families.  Returns 'whole' | 'tiled' | None."""
    if kernel not in ("auto", "pallas", "xla"):
        raise ValueError(f"kernel must be auto|pallas|xla, got {kernel!r}")
    if kernel == "xla":
        return None
    if full_fiber:
        if kernel == "pallas":
            raise ValueError(
                "full 3x3 fiber tensors (fiber_elevation) run on the "
                "XLA path — the fused volume kernel implements the "
                "separable in-plane-tensor + dz_ratio form only"
            )
        return None
    cfg = model.cfg
    if mesh is not None:
        if kernel == "pallas":
            raise ValueError(
                "the fused volume kernel is single-chip (GSPMD cannot "
                "partition pallas_call); drop mesh or kernel='pallas'"
            )
        return None
    if cfg.adaptive_dv is not None:
        if kernel == "pallas":
            raise ValueError(
                "adaptive_dv runs on the XLA path (the fused kernels "
                "trace fixed-dt substeps); drop kernel='pallas' or "
                "adaptive_dv"
            )
        return None
    on_tpu = jax.default_backend() == "tpu"
    table = bool(getattr(cfg, "table", False))
    if kernel == "pallas":
        if on_tpu and table and model.name in ("court", "court_ultra"):
            raise ValueError(
                "table-mode gathers don't lower in Mosaic; use "
                "kernel='xla' or drop table=True"
            )
        return "whole"
    # auto: measured profitable on TPU within the VMEM envelope (see
    # docs/OPTIMIZATIONS.md §14 for the volume measurements); unaligned
    # (H, W) run on padded planes, sized by the PADDED shape
    if not on_tpu or table:
        return None
    if model.name not in ("fenton", "br", "court", "court_ultra", "ms"):
        return None
    hp = -(-cfg.height // 8) * 8
    wp = -(-cfg.width // 128) * 128
    state_mb = len(model.state_keys()) * depth * hp * wp * 4 / 2 ** 20
    cells = depth * hp * wp
    if (state_mb <= VOLUME_KERNEL_STATE_MB_MAX
            and cells <= VOLUME_KERNEL_CELLS_MAX):
        return "whole"
    # past the whole-volume caps: row-tiled temporal blocking, for the
    # families where the 2D measurements show tiling beats XLA
    # (HBM-bound fenton/br/ms; compute-bound court loses the halo
    # recompute, OPTIMIZATIONS §8c — court stays XLA here too)
    if model.name not in ("fenton", "br", "ms"):
        return None
    if pick_volume_tile_rows(model, depth) is None:
        return None
    return "tiled"


def _use_shard_kernel(model: IonicModel, depth: int, n_shards: int,
                      kernel: str, halo_k: int) -> bool:
    """Kernel selection for the wide-halo shard_map volume path: does
    the per-shard substep group run in the fused volume block kernel
    (ops/pallas_volume.make_volume_block_kernel)?"""
    if kernel == "xla":
        return False
    cfg = model.cfg
    on_tpu = jax.default_backend() == "tpu"
    aligned = cfg.width % 128 == 0 and cfg.height % 8 == 0
    table = bool(getattr(cfg, "table", False))
    if kernel == "pallas":
        if on_tpu:
            if table and model.name in ("court", "court_ultra"):
                raise ValueError(
                    "table-mode gathers don't lower in Mosaic; use "
                    "kernel='xla' or drop table=True"
                )
            if not aligned:
                raise ValueError(
                    f"{cfg.width}x{cfg.height} is not (128, 8)-aligned; "
                    "the volume block kernel needs aligned (H, W)"
                )
        return True
    if not on_tpu or not aligned or table:
        return False
    if model.name not in ("fenton", "br", "court", "court_ultra", "ms"):
        return False
    ext_d = depth // n_shards + 2 * halo_k
    state_mb = (
        len(model.state_keys()) * ext_d * cfg.height * cfg.width * 4
        / 2 ** 20
    )
    cells = ext_d * cfg.height * cfg.width
    return (state_mb <= VOLUME_KERNEL_STATE_MB_MAX
            and cells <= VOLUME_KERNEL_CELLS_MAX)


def run_volume(
    model: IonicModel,
    depth: int,
    n_outer: int,
    state: Optional[Dict[str, np.ndarray]] = None,
    phase: Optional[np.ndarray] = None,
    dz_ratio: float = 1.0,
    fiber_twist: float = 0.0,
    fiber_angle0: float = 0.0,
    fiber_ratio: float = 1.0,
    fiber_elevation: float = 0.0,
    mesh=None,
    events: Sequence[VolumeEvent] = (),
    probe: Optional[Callable] = None,
    frames_every: Optional[int] = None,
    allow_unstable_dt: bool = False,
    rotor_probe: bool = False,
    rotor_tau_ms: float = 10.0,
    rotor_v_star: float = 0.5,
    electrodes: Sequence[tuple] = (),
    kernel: str = "auto",
    wide_halo: bool = False,
    halo_k: Optional[int] = None,
):
    """Advance a `[depth, H, W]` volume `n_outer` outer steps.

    - `state`: stacked `[D, H, W]` planes (default: `volume_state`).
    - `phase`: optional 2D `[H, W]` field extruded along z.
    - `dz_ratio`: transmural conduction fraction (1.0 = isotropic).
    - `fiber_twist` / `fiber_angle0` / `fiber_ratio`: rotational
      anisotropy — the in-plane fiber direction rotates linearly by
      `fiber_twist` radians across the depth around `fiber_angle0`,
      with cross-fiber conduction `fiber_ratio` (< 1) of along-fiber
      (the ventricular transmural fiber rotation of Fenton & Karma
      1998; ~2.1 rad across a human LV wall).  fiber_ratio = 1 is
      isotropic (the twist is then a no-op and skipped).
    - `fiber_elevation`: imbrication angle (radians) tilting the fiber
      axis OUT of the sheet plane — the full 3x3 tensor
      D = ratio*I + (1-ratio) f f^T with
      f = (cos e cos a, cos e sin a, sin e)
      (stencil3d.fiber_tensors3d / _laplace3d_full; the separable
      in-plane-tensor + dz_ratio model cannot represent the dxz/dyz
      coupling).  Needs fiber_ratio < 1 and leaves dz_ratio at 1.0
      (dzz comes from the tensor; at e = 0 it equals fiber_ratio).
      Runs on the XLA and GSPMD mesh paths (the fused kernels and
      wide_halo implement the separable form only).
    - `mesh`: shard the z axis over the mesh's first axis (GSPMD; the
      halo is one z-slice each way).
    - `wide_halo` (needs `mesh`): switch from GSPMD to the explicit
      shard_map schedule (parallel/volume_spmd.py) — K = dt_per_step
      ghost z-slices ride ICI ONCE per outer step (vs one slice per
      substep), and the fused substep group runs on the extended block;
      with `kernel` 'auto'/'pallas' the group runs VMEM-resident in the
      per-shard volume block kernel — the 3D analog of the 2D engine's
      best sharded configuration (OPTIMIZATIONS §10b).  Needs depth
      divisible by the mesh size and >= K slices per shard; the default
      probe only (custom `probe` callables see global state, which a
      shard_map body does not have).
    - `halo_k` (wide_halo only): exchange cadence.  Default one
      K = dt_per_step exchange per outer step; an explicit halo_k < K
      exchanges halo_k ghost slices dt_per_step/halo_k times per outer
      step instead — shards need only halo_k slices each (e.g. fenton's
      K = 10 needs depth >= 10 x n_shards, but halo_k=2 runs depth 16
      on 8 chips) and the fused blocks shrink, for more but smaller ICI
      messages (same total bytes).  Needs uniform substeps (fenton, ms,
      BR without skip — not BR skip / Courtemanche).
    - `events`: VolumeEvents fired inside the scan.
    - `probe`: state -> scalar sampled every outer step; default = the
      model's normalized potential at the mid-depth probe pixel (the 3D
      analog of the engine's probe stream).
    - `frames_every`: record the normalized `[D, H, W]` potential every
      this many outer steps (host-side chunking, like the engine's
      dt_per_plot frames).
    - `electrodes`: virtual unipolar electrode positions `(z, y, x)` in
      cell units (floats; typically OFF the tissue, e.g. z = -5 above
      the epicardial face).  Each outer step samples the pseudo-ECG
      Φ(e) ∝ ∫ (1/r) ∇·(D∇V) dv on-device — the discrete source term
      is the SAME `geom.laplace` (incl. anisotropy and phase-field
      correction) the model integrates, weighted by the 1/r lead field
      (stencil3d.ecg_weights).  This is the 3D generalization of the
      reference's 2D Gaussian-mask electrogram (egm.py:5-12): a true
      far-field potential rather than a local masked mean.  With
      electrodes, `probes` is a dict with an `'ecg'` stream of shape
      `[n_outer, n_electrodes]`.  Works on every path: XLA, fused-kernel
      (sampled on the true-size crop of padded planes), GSPMD mesh, and
      the z-sharded `wide_halo` shard_map path (each shard evaluates the
      source term over a one-ghost-slice extension and the electrode
      sums are psums of local partials — r4, parity with the 2D engine's
      sharded ECG).
    - `rotor_probe`: also emit a LIVE per-slice rotor census from inside
      the compiled scan — `[n_outer, D, 2]` of (count, net topological
      charge) per z-slice vs the sample `rotor_tau_ms` ago (the same
      delay-embedding ring buffer as the 2D engine's
      SimConfig.rotor_probe, stencil.rotor_metrics applied slice-wise).
      Unlike the 2D engine's census this one SHARDS with the volume:
      the per-slice winding is z-elementwise, so a z-sharded mesh needs
      no extra collectives.  With `rotor_probe`, `probes` is a dict
      {'v': [n_outer], 'rotors': [n_outer, D, 2]}.
    - `kernel`: 'auto' | 'pallas' | 'xla'.  'auto' picks the fused
      whole-volume Pallas kernel (ops/pallas_volume.py) on TPU when the
      volume is unsharded, the state fits the whole-grid VMEM envelope,
      and the volume is small enough that the one-time Mosaic compile
      stays in the 2D kernels' few-minute band (VOLUME_KERNEL_CELLS_MAX
      — compile grows ~quadratically in flattened tile count); 'pallas'
      forces it past the caps (CPU runs interpreter mode); 'xla' forces
      the plain path.  Unaligned (H, W) run on planes padded to the
      (8, 128) tile with true-edge masking (probes/frames/final state
      are cropped back; a CUSTOM probe on an unaligned grid stays on
      XLA under 'auto' since it would see the pad region).  The kernel
      path composes with phase fields, dz_ratio, fiber twist, events,
      and both probes (only `model.step` moves inside the kernel).

    Returns (final state, probes, frames `[n_frames, D, H, W]` or
    None).  `probes` is the `[n_outer]` potential stream, or — with
    `rotor_probe` and/or `electrodes` — a dict of streams
    {'v': [n_outer], 'rotors': [n_outer, D, 2], 'ecg': [n_outer, E]}.

    Stability: the symbol of the 3D operator bottoms out at
    −(8 + 8·dz_ratio) (in-plane 9-point: −8 at the checkerboard mode,
    ionic.py:49-53 normalization; z term: −8·dz_ratio), so explicit
    Euler needs dt ≤ 2 / ((8 + 8·dz_ratio)·diff) — TIGHTER than 2D's
    2/(8·diff): the reference's canonical dt=0.1 at diff=1.5 is fine on
    a sheet (limit 0.167) but unstable in an isotropic volume (limit
    0.083).  Violations raise up front unless `adaptive_dv` is set (the
    step-doubling integrator re-takes the unstable substeps) or
    `allow_unstable_dt=True` (e.g. a z-uniform volume never excites the
    z modes).
    """
    if depth < 3:
        raise ValueError(
            "run_volume needs depth >= 3 (the SYMMETRIC face rewrite "
            "replaces both boundary slices with interior neighbors, so "
            "a 1- or 2-slice volume has no interior); use the 2D engine "
            "for sheets"
        )
    if not 0.0 < fiber_ratio <= 1.0:
        raise ValueError("fiber_ratio must be in (0, 1]")
    full_fiber = fiber_elevation != 0.0
    if full_fiber:
        if fiber_ratio == 1.0:
            raise ValueError(
                "fiber_elevation needs fiber_ratio < 1 (an isotropic "
                "tensor has no fiber axis to tilt)"
            )
        if dz_ratio != 1.0:
            raise ValueError(
                "fiber_elevation builds a full 3x3 tensor with its own "
                "dzz (= fiber_ratio at zero tilt); leave dz_ratio at 1.0"
            )
        if wide_halo:
            raise ValueError(
                "full 3x3 fiber tensors (fiber_elevation) are not "
                "supported with wide_halo (its comm schedule carries "
                "the separable 3-component tensor); use the GSPMD "
                "mesh path"
            )
    fiber = None
    if fiber_ratio < 1.0:
        angles = stencil3d.twist_angles(depth, fiber_angle0, fiber_twist)
        if full_fiber:
            fiber = stencil3d.fiber_tensors3d(angles, fiber_ratio,
                                              fiber_elevation)
        else:
            fiber = stencil3d.fiber_tensors(angles, fiber_ratio)
    if full_fiber:
        # worst-case symbol of the full-tensor operator: 8 per unit of
        # trace (2x-scaled second differences at Nyquist) + 4 per unit
        # of |off-diagonal| (the 4-corner mixed stencils)
        dxx, dxy, dyy, dxz, dyz, dzz = (np.asarray(c) for c in fiber)
        lam = float(np.max(
            8.0 * (dxx + dyy + dzz)
            + 4.0 * (np.abs(dxy) + np.abs(dxz) + np.abs(dyz))
        )) * model.cfg.diff
        limit_doc = "the full-tensor symbol bound"
    else:
        lam = (8.0 + 8.0 * dz_ratio) * model.cfg.diff
        limit_doc = "2/((8 + 8*dz_ratio)*diff)"
    dt_limit = 2.0 / lam
    if (model.cfg.dt > dt_limit and model.cfg.adaptive_dv is None
            and not allow_unstable_dt):
        raise ValueError(
            f"dt={model.cfg.dt} exceeds the 3D explicit stability limit "
            f"{limit_doc} = {dt_limit:.4f}; lower dt or "
            f"dz_ratio, set adaptive_dv (step-doubling rescue), or pass "
            f"allow_unstable_dt=True (e.g. for z-uniform fields)"
        )
    if state is None:
        state = volume_state(model, depth)
    geom = volume_geometry(phase, dz_ratio=dz_ratio, fiber=fiber)
    spmd_kernel = False
    if wide_halo:
        if mesh is None:
            raise ValueError("wide_halo needs a mesh (z-sharded volume)")
        if model.cfg.adaptive_dv is not None:
            raise ValueError(
                "adaptive_dv is single-chip/XLA-path only; drop "
                "wide_halo or adaptive_dv"
            )
        if probe is not None:
            raise ValueError(
                "custom probe callables are not supported with "
                "wide_halo (the shard_map body sees z-local blocks); "
                "use the default probe or the GSPMD path"
            )
        from fib_tf_tpu.parallel.volume_spmd import (
            check_volume_shards, resolve_halo_k,
        )

        n_shards = int(mesh.devices.shape[0])
        k_resolved = resolve_halo_k(model, halo_k)
        check_volume_shards(depth, n_shards, k_resolved)
        spmd_kernel = _use_shard_kernel(model, depth, n_shards, kernel,
                                        k_resolved)
        step_fn = None
    elif (mode := _use_volume_kernel(model, depth, mesh, kernel,
                                     full_fiber=full_fiber)):
        from fib_tf_tpu.ops.pallas_step import padded_shape
        from fib_tf_tpu.ops.pallas_volume import (
            make_pallas_volume_step, make_tiled_volume_step,
        )

        if mode == "tiled":
            # past the whole-volume compile/VMEM caps: row-tiled
            # temporal blocking (aligned grids only — selection
            # guarantees it)
            step_fn = make_tiled_volume_step(
                model, depth, pick_volume_tile_rows(model, depth),
                phase=phase, dz_ratio=dz_ratio, fiber=fiber,
            )
        elif (probe is not None and kernel == "auto"
                and padded_shape(model.cfg.height, model.cfg.width)
                is not None):
            # custom probe callables would see the pad region's garbage;
            # under 'auto' an unaligned grid with a custom probe stays on
            # XLA (the 2D engine's rule) — kernel='pallas' overrides,
            # with the probe seeing padded planes
            step_fn = lambda s: model.step(s, geom)
        else:
            step_fn = make_pallas_volume_step(
                model, depth, phase=phase, dz_ratio=dz_ratio,
                fiber=fiber, pad=True,  # no-op on aligned grids
            )
    else:
        step_fn = lambda s: model.step(s, geom)
    padded_hw = getattr(step_fn, "padded_hw", None)
    h_true, w_true = model.cfg.height, model.cfg.width
    pot_key = model.pot_key

    if probe is None:
        r, c = model.probe_pixel
        # clamp to the true grid (JAX would clamp out-of-range indices
        # anyway on tiny grids, but on PADDED planes the implicit clamp
        # would land in the pad region's garbage instead)
        r, c = min(r, h_true - 1), min(c, w_true - 1)

        def probe(s):
            return (
                s[pot_key][depth // 2, r, c] - model.min_v
            ) / (model.max_v - model.min_v)

    def _pad_mask(m):
        if padded_hw is None:
            return m
        hp, wp = padded_hw
        return np.pad(
            np.asarray(m, np.float32),
            ((0, 0), (0, hp - h_true), (0, wp - w_true)),
            mode="constant", constant_values=model.min_v,
        )

    ev_masks = [jnp.asarray(_pad_mask(e.resolve_mask(model, depth)))
                for e in events]
    ev_steps = [int(e.step) for e in events]

    ew = None
    if electrodes:
        # [E, D, H, W] lead-field weights on the TRUE grid — the kernel
        # path's padded planes are cropped before sampling, so the pad
        # region never radiates
        ew = jnp.asarray(np.stack([
            stencil3d.ecg_weights(depth, h_true, w_true, pos)
            for pos in electrodes
        ]))

    tau_steps = 0
    if rotor_probe:
        tau_steps = max(1, int(round(
            rotor_tau_ms / (model.dt_per_step * model.cfg.dt)
        )))

    _cache: Dict[tuple, Callable] = {}

    def chunk_fn(length: int, start: int):
        fire = [
            (t - start, m)
            for t, m in zip(ev_steps, ev_masks)
            if start <= t < start + length
        ]
        key = (length, tuple((t, id(m)) for t, m in fire))
        if key in _cache:
            return _cache[key]

        if wide_halo:
            from fib_tf_tpu.parallel.volume_spmd import (
                make_volume_spmd_chunk,
            )

            chunk = make_volume_spmd_chunk(
                model, mesh, length, depth, fire=fire, phase=phase,
                dz_ratio=dz_ratio, fiber=fiber, use_kernel=spmd_kernel,
                rotor=rotor_probe, tau_steps=tau_steps,
                rotor_v_star=rotor_v_star, halo_k=halo_k,
                ecg_weights=ew,
            )
            _cache[key] = chunk
            return chunk

        def body(carry, _):
            s, i, buf, idx = carry
            s = step_fn(s)
            pot = s[pot_key]
            for t, m in fire:
                pot = jnp.where(i == t, jnp.maximum(pot, m), pot)
            s = {**s, pot_key: pot}
            out = {"v": probe(s)}
            if ew is not None:
                src = pot
                if padded_hw is not None:
                    src = src[:, :h_true, :w_true]
                # the same discrete source term the model integrates:
                # laplace of the boundary-enforced potential (e.g.
                # fenton.py step: diff * laplace(enforce_boundary(u)))
                lap = geom.laplace(geom.enforce_boundary(src))
                out["ecg"] = jnp.einsum("dhw,edhw->e", lap, ew)
            if rotor_probe:
                from fib_tf_tpu.ops import stencil

                img = model.image(s)
                if padded_hw is not None:
                    # the census must not see the pad region's garbage
                    img = img[:, :h_true, :w_true]
                old = jax.lax.dynamic_index_in_dim(
                    buf, idx, 0, keepdims=False
                )
                out["rotors"] = jax.vmap(
                    lambda a, b: stencil.rotor_metrics(
                        a, b, v_star=rotor_v_star
                    )
                )(img, old)
                buf = jax.lax.dynamic_update_index_in_dim(buf, img, idx, 0)
                idx = (idx + 1) % tau_steps
            return (s, i + 1, buf, idx), out

        @jax.jit
        def chunk(s, buf, idx):
            (s, _, buf, idx), p = jax.lax.scan(
                body, (s, jnp.int32(0), buf, idx), None, length=length
            )
            return s, buf, idx, p

        _cache[key] = chunk
        return chunk

    st = {k: jnp.asarray(v) for k, v in state.items()}
    if padded_hw is not None:
        from fib_tf_tpu.ops.pallas_volume import pad_volume_state

        st = pad_volume_state(st, h_true, w_true, *padded_hw)
    if rotor_probe:
        img0 = jnp.asarray(np.asarray(
            model.image({pot_key: np.asarray(state[pot_key], np.float32)}),
            np.float32,
        ))
        buf = jnp.tile(img0[None], (tau_steps, 1, 1, 1))
    else:
        buf = jnp.zeros((), jnp.float32)  # loop-invariant placeholder
    idx = jnp.int32(0)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ax = mesh.axis_names[0]
        sh = NamedSharding(mesh, P(ax, None, None))
        st = {k: jax.device_put(v, sh) for k, v in st.items()}
        if ew is not None:
            # lead fields shard along z with the volume; the reduction
            # becomes a GSPMD psum
            ew = jax.device_put(ew, NamedSharding(mesh, P(None, ax)))
        if rotor_probe:
            # the ring buffer shards along z too — the per-slice winding
            # is z-elementwise, so the census needs no collectives
            buf = jax.device_put(buf, NamedSharding(mesh, P(None, ax)))

    frames: Optional[List[np.ndarray]] = None
    probes: List[Dict[str, np.ndarray]] = []
    if frames_every is None:
        st, buf, idx, p = chunk_fn(n_outer, 0)(st, buf, idx)
        probes.append(jax.tree.map(np.asarray, p))
    else:
        frames = []
        done = 0
        while done < n_outer:
            length = min(frames_every, n_outer - done)
            st, buf, idx, p = chunk_fn(length, done)(st, buf, idx)
            probes.append(jax.tree.map(np.asarray, p))
            done += length
            img = np.asarray(model.image({pot_key: np.asarray(st[pot_key])}))
            if padded_hw is not None:
                img = img[:, :h_true, :w_true]
            frames.append(img.astype(np.float32))

    final = {k: np.asarray(v)[:, :h_true, :w_true] for k, v in st.items()}
    if not np.isfinite(final[pot_key]).all():
        raise FloatingPointError(
            "non-finite potential in run_volume (the reference's disabled "
            "NaN check, ionic.py:208-212, would have integrated on)"
        )
    streams = {
        k: np.concatenate([p[k] for p in probes]) for k in probes[0]
    }
    return (
        final,
        streams if (rotor_probe or ew is not None) else streams["v"],
        np.stack(frames) if frames is not None else None,
    )

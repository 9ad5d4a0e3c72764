"""Fused Pallas kernel for 3D volumes (beyond reference parity).

The 2D whole-grid kernel (ops/pallas_step.py) keeps the entire state in
VMEM across all `dt_per_step` substeps, cutting HBM traffic by
`dt_per_step`x — the dominant cost for these bandwidth-bound models.
This module lifts that design to `[D, H, W]` volumes (engine/volume.py):
the in-plane 9-point/tensor operator becomes z-elementwise arithmetic on
3D arrays (no vmap — the z axis is just the untiled leading dimension),
and the z coupling is a 2x-scaled second difference via leading-axis
concats, exactly mirroring ops/stencil3d.laplace3d (which itself mirrors
the reference's 2D stencil normalization, ionic.py:49-53).

Supported features match run_volume's XLA path: extruded 2D phase
fields (∂zϕ = 0, so the no-flux correction has no z component),
transmural conduction scaling `dz_ratio`, and rotational anisotropy
(per-slice fiber tensors, passed to the kernel as `[D, 1, 1]` inputs so
they broadcast against the state planes without baking vector constants
into the Mosaic program).

Whole-volume VMEM residency bounds the size (state planes x D x H x W x
4 B within the same ~32 MB envelope as the 2D whole-grid kernel); larger
volumes stay on the XLA path, which is already HBM-streaming-efficient
there (docs/OPTIMIZATIONS.md §8c).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fib_tf_tpu.models.base import Geometry, IonicModel
from fib_tf_tpu.ops.pallas_step import _shift as _shift2d


# -----------------------------------------------------------------------------
# Roll-free shift operators on [D, H, W] (REFLECT semantics, concat-based)
# -----------------------------------------------------------------------------

def _shift3(x: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """In-plane shift of a `[D, H, W]` volume: y[z, i, j] =
    x[z, reflect(i+dr), reflect(j+dc)] — the 3D broadcast of
    pallas_step._shift (axes -2/-1 instead of 0/1)."""
    y = x
    if dr == -1:
        y = jnp.concatenate([y[:, 1:2], y[:, :-1]], axis=1)
    elif dr == 1:
        y = jnp.concatenate([y[:, 1:], y[:, -2:-1]], axis=1)
    if dc == -1:
        y = jnp.concatenate([y[:, :, 1:2], y[:, :, :-1]], axis=2)
    elif dc == 1:
        y = jnp.concatenate([y[:, :, 1:], y[:, :, -2:-1]], axis=2)
    return y


def _zshift(x: jnp.ndarray, dz: int) -> jnp.ndarray:
    """y[z] = x[reflect(z+dz)] along the leading (z) axis."""
    if dz == -1:
        return jnp.concatenate([x[1:2], x[:-1]], axis=0)
    return jnp.concatenate([x[1:], x[-2:-1]], axis=0)


def vmem_laplace3d(
    x: jnp.ndarray,
    phase: Optional[jnp.ndarray] = None,
    dz_ratio: float = 1.0,
    fiber: Optional[tuple] = None,
) -> jnp.ndarray:
    """Value-identical to ops.stencil3d.laplace3d on a `[D, H, W]`
    volume: per-slice 9-point REFLECT stencil (or the anisotropic tensor
    operator when `fiber` = (dxx, dxy, dyy), scalars or `[D, 1, 1]`
    per-slice arrays) + phase-field correction from a shared 2D `[H, W]`
    phase + `2*dz_ratio`-scaled z second difference with REFLECT ends."""
    n = _shift3(x, -1, 0)
    s = _shift3(x, 1, 0)
    w = _shift3(x, 0, -1)
    e = _shift3(x, 0, 1)
    nw = _shift3(x, -1, -1)
    ne = _shift3(x, -1, 1)
    sw = _shift3(x, 1, -1)
    se = _shift3(x, 1, 1)
    if fiber is None:
        planar = n + s + w + e + 0.5 * (nw + ne + sw + se) - 6.0 * x
        if phase is not None:
            pn = _shift2d(phase, -1, 0)
            ps = _shift2d(phase, 1, 0)
            pw = _shift2d(phase, 0, -1)
            pe = _shift2d(phase, 0, 1)
            planar = planar + (
                (s - n) * (ps - pn) + (e - w) * (pe - pw)
            ) / (4.0 * phase)
    else:
        dxx, dxy, dyy = fiber
        vxx = w - 2.0 * x + e
        vyy = n - 2.0 * x + s
        vxy = 0.25 * (se + nw - sw - ne)
        planar = 2.0 * (dxx * vxx + 2.0 * dxy * vxy + dyy * vyy)
        if phase is not None:
            gx = e - w
            gy = s - n
            px = _shift2d(phase, 0, 1) - _shift2d(phase, 0, -1)
            py = _shift2d(phase, 1, 0) - _shift2d(phase, -1, 0)
            planar = planar + (
                gx * (dxx * px + dxy * py) + gy * (dxy * px + dyy * py)
            ) / (4.0 * phase)
    z = _zshift(x, -1) - 2.0 * x + _zshift(x, 1)
    return planar + (2.0 * dz_ratio) * z


def vmem_enforce_boundary3d(x: jnp.ndarray) -> jnp.ndarray:
    """SYMMETRIC interior rewrite on all three axes (value-identical to
    ops.stencil3d.enforce_boundary3d), scatter-free."""
    x = jnp.concatenate([x[1:2], x[1:-1], x[-2:-1]], axis=0)
    x = jnp.concatenate([x[:, 1:2], x[:, 1:-1], x[:, -2:-1]], axis=1)
    x = jnp.concatenate([x[:, :, 1:2], x[:, :, 1:-1], x[:, :, -2:-1]],
                        axis=2)
    return x


def vmem_volume_geometry(
    phase: Optional[jnp.ndarray] = None,
    dz_ratio: float = 1.0,
    fiber: Optional[tuple] = None,
) -> Geometry:
    """VMEM analog of models.base.volume_geometry."""
    return Geometry(
        laplace=lambda x: vmem_laplace3d(x, phase, dz_ratio, fiber),
        enforce_boundary=vmem_enforce_boundary3d,
    )


# -----------------------------------------------------------------------------
# z-halo block geometry (the wide-halo shard_map path, parallel/volume_spmd)
# -----------------------------------------------------------------------------

def _zup_raw(x: jnp.ndarray) -> jnp.ndarray:
    """y[z] = x[z-1]; slice 0 keeps itself (halo garbage, masked away)."""
    return jnp.concatenate([x[:1], x[:-1]], axis=0)


def _zdown_raw(x: jnp.ndarray) -> jnp.ndarray:
    """y[z] = x[z+1]; last slice keeps itself."""
    return jnp.concatenate([x[1:], x[-1:]], axis=0)


def zblock_geometry(
    zg: jnp.ndarray,
    d_total: int,
    phase: Optional[jnp.ndarray] = None,
    dz_ratio: float = 1.0,
    fiber: Optional[tuple] = None,
) -> Geometry:
    """Geometry over a volume block extended with K ghost z-slices — the
    3D analog of ops.pallas_tiled.block_geometry.

    `zg` is the `[ext_d, 1, 1]` int32 array of global z indices of the
    block's slices; slices outside [0, d_total) are halo garbage that
    shrinks away one ring per substep.  In-plane each shard owns the full
    `[H, W]` sheet, so the in-plane operators are the plain VMEM shift
    forms (vmem_laplace3d's planar part, REFLECT/SYMMETRIC at the true
    edges); only the z direction needs global-edge masking (REFLECT at
    global z = 0 / d_total-1, ghost slices elsewhere).  `fiber` entries
    must already be halo-EXTENDED `[ext_d, 1, 1]` per-slice tensors
    (static — the caller ppermutes them once per chunk)."""
    top = zg == 0
    bottom = zg == d_total - 1

    def zup(x):
        # reflect at the global top face: slice 0's z-neighbor is slice 1
        return jnp.where(top, _zdown_raw(x), _zup_raw(x))

    def zdown(x):
        return jnp.where(bottom, _zup_raw(x), _zdown_raw(x))

    def laplace(x):
        n = _shift3(x, -1, 0)
        s = _shift3(x, 1, 0)
        w = _shift3(x, 0, -1)
        e = _shift3(x, 0, 1)
        nw = _shift3(x, -1, -1)
        ne = _shift3(x, -1, 1)
        sw = _shift3(x, 1, -1)
        se = _shift3(x, 1, 1)
        if fiber is None:
            planar = n + s + w + e + 0.5 * (nw + ne + sw + se) - 6.0 * x
            if phase is not None:
                pn = _shift2d(phase, -1, 0)
                ps = _shift2d(phase, 1, 0)
                pw = _shift2d(phase, 0, -1)
                pe = _shift2d(phase, 0, 1)
                planar = planar + (
                    (s - n) * (ps - pn) + (e - w) * (pe - pw)
                ) / (4.0 * phase)
        else:
            dxx, dxy, dyy = fiber
            vxx = w - 2.0 * x + e
            vyy = n - 2.0 * x + s
            vxy = 0.25 * (se + nw - sw - ne)
            planar = 2.0 * (dxx * vxx + 2.0 * dxy * vxy + dyy * vyy)
            if phase is not None:
                gx = e - w
                gy = s - n
                px = _shift2d(phase, 0, 1) - _shift2d(phase, 0, -1)
                py = _shift2d(phase, 1, 0) - _shift2d(phase, -1, 0)
                planar = planar + (
                    gx * (dxx * px + dxy * py)
                    + gy * (dxy * px + dyy * py)
                ) / (4.0 * phase)
        z = zup(x) - 2.0 * x + zdown(x)
        return planar + (2.0 * dz_ratio) * z

    def enforce_boundary(x):
        # SYMMETRIC z faces only at the global edges (interior neighbor
        # replaces the face slice), in-plane faces everywhere
        x = jnp.where(top, _zdown_raw(x), x)
        x = jnp.where(bottom, _zup_raw(x), x)
        x = jnp.concatenate([x[:, 1:2], x[:, 1:-1], x[:, -2:-1]], axis=1)
        x = jnp.concatenate(
            [x[:, :, 1:2], x[:, :, 1:-1], x[:, :, -2:-1]], axis=2
        )
        return x

    return Geometry(laplace=laplace, enforce_boundary=enforce_boundary)


def make_volume_block_kernel(
    model: IonicModel,
    ext_d: int,
    d_total: int,
    has_phase: bool = False,
    dz_ratio: float = 1.0,
    has_fiber: bool = False,
    interpret: Optional[bool] = None,
):
    """Fused substep-group kernel over ONE z-halo-extended volume block —
    the per-shard compute of the wide-halo shard_map volume path
    (parallel/volume_spmd.py), mirroring ops.pallas_tiled.make_block_kernel.

    The caller exchanges K ghost z-slices via ppermute, then this kernel
    advances the whole fused substep group with the block VMEM-resident.
    `zstart` (the block's global z start, axis_index-dependent) enters as
    a runtime `[1]` int32 input; fiber tensors enter halo-extended as
    `[ext_d, 1, 1]` inputs.

    Returns `step(ext_state, zstart[, phase][, fiber]) -> ext_state`
    (halo slices of the output are garbage; the caller crops)."""
    names = model.state_keys()
    n = len(names)
    h, w = model.cfg.height, model.cfg.width
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def kernel(*refs):
        from fib_tf_tpu.ops import integrators

        ins = refs[:n]
        i = n
        zstart_ref = refs[i]
        i += 1
        phase_arr = refs[i][:] if has_phase else None
        i += 1 if has_phase else 0
        fib = None
        if has_fiber:
            fib = tuple(refs[i + j][:] for j in range(3))
            i += 3
        outs = refs[-n:]

        zg = zstart_ref[0] + jax.lax.broadcasted_iota(
            jnp.int32, (ext_d, 1, 1), 0
        )
        geom = zblock_geometry(zg, d_total, phase_arr, dz_ratio, fib)
        state = {kk: r[:] for kk, r in zip(names, ins)}
        integrators._IN_PALLAS_KERNEL = True
        try:
            state = model.kernel_step(state, geom)
        finally:
            integrators._IN_PALLAS_KERNEL = False
        for kk, r in zip(names, outs):
            r[:] = state[kk]

    plane = jax.ShapeDtypeStruct((ext_d, h, w), jnp.float32)
    vspec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.SMEM)
    in_specs = [vspec] * n + [sspec]
    if has_phase:
        in_specs.append(vspec)
    if has_fiber:
        in_specs.extend([vspec] * 3)
    call = pl.pallas_call(
        kernel,
        out_shape=[plane] * n,
        in_specs=in_specs,
        out_specs=[vspec] * n,
        input_output_aliases={i: i for i in range(n)},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    def step(ext_state, zstart, phase=None, fiber=None):
        args = [ext_state[k] for k in names]
        args.append(jnp.asarray(zstart, jnp.int32).reshape(1))
        if has_phase:
            args.append(phase)
        if has_fiber:
            args.extend(fiber)
        outs = call(*args)
        return dict(zip(names, outs))

    return step


# -----------------------------------------------------------------------------
# The fused volume kernel
# -----------------------------------------------------------------------------

def make_pallas_volume_step(
    model: IonicModel,
    depth: int,
    phase: Optional[np.ndarray] = None,
    dz_ratio: float = 1.0,
    fiber: Optional[tuple] = None,
    interpret: Optional[bool] = None,
):
    """Build `step(state) -> state` advancing a `[depth, H, W]` volume one
    outer step (`dt_per_step` substeps) as a single VMEM-resident Pallas
    kernel — run_volume's fused fast path.

    `phase` is the 2D `[H, W]` extruded field, `fiber` the per-slice
    (dxx, dxy, dyy) from stencil3d.fiber_tensors (or scalars); both are
    passed as extra kernel inputs.  On TPU the grid must be
    (8, 128)-aligned (H % 8 == 0, W % 128 == 0; depth is free — the
    leading axis is untiled)."""
    names = model.state_keys()
    n = len(names)
    h, w = model.cfg.height, model.cfg.width
    has_phase = phase is not None
    phase_f32 = np.asarray(phase, np.float32) if has_phase else None
    has_fiber = fiber is not None
    if has_fiber:
        fiber_f32 = [
            np.broadcast_to(np.asarray(c, np.float32), (depth,))
            .reshape(depth, 1, 1).copy()
            for c in fiber
        ]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def kernel(*refs):
        from fib_tf_tpu.ops import integrators

        k = n
        ins = refs[:n]
        phase_arr = refs[k][:] if has_phase else None
        k += 1 if has_phase else 0
        fib = None
        if has_fiber:
            fib = tuple(refs[k + i][:] for i in range(3))
            k += 3
        outs = refs[k:]
        state = {key: r[:] for key, r in zip(names, ins)}
        geom = vmem_volume_geometry(phase_arr, dz_ratio, fib)
        integrators._IN_PALLAS_KERNEL = True
        try:
            # substeps stay Python-unrolled: fori_loop measured a compile
            # -time negative on the 2D kernels (IonicModel.kernel_step)
            state = model.kernel_step(state, geom)
        finally:
            integrators._IN_PALLAS_KERNEL = False
        for key, r in zip(names, outs):
            r[:] = state[key]

    plane = jax.ShapeDtypeStruct((depth, h, w), jnp.float32)
    spec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)
    n_in = n + (1 if has_phase else 0) + (3 if has_fiber else 0)
    call = pl.pallas_call(
        kernel,
        out_shape=[plane] * n,
        in_specs=[spec] * n_in,
        out_specs=[spec] * n,
        input_output_aliases={i: i for i in range(n)},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    def step(state: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        args = [state[k] for k in names]
        if has_phase:
            args.append(jnp.asarray(phase_f32))
        if has_fiber:
            args.extend(jnp.asarray(f) for f in fiber_f32)
        outs = call(*args)
        return dict(zip(names, outs))

    return step

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
# Flattened [D*H, W] volume geometry — the Mosaic-fast layout
# -----------------------------------------------------------------------------
#
# A [D, H, W] state can also be laid out as one [D*H, W] sheet (slices
# stacked along rows).  Every operator then has exactly the 2D op shapes
# the whole-grid kernels already Mosaic-compile quickly (row/col concat
# shifts of a single big 2D array), at the cost of slice-edge masking:
# in-plane row shifts must REFLECT at every slice boundary, and the z
# coupling becomes a +/-H-row shift.  The masks come from two static
# [D*H, 1] int32 index planes (row-within-slice, slice index) passed as
# kernel inputs.

def _rup(x):   # y[i] = x[i-1]; row 0 keeps itself (fixed by masks)
    return jnp.concatenate([x[:1], x[:-1]], axis=0)


def _rdn(x):   # y[i] = x[i+1]; last row keeps itself
    return jnp.concatenate([x[1:], x[-1:]], axis=0)


def _rup_h(x, h):   # y[i] = x[i-h] (value from the slice above)
    return jnp.concatenate([x[:h], x[:-h]], axis=0)


def _rdn_h(x, h):   # y[i] = x[i+h] (value from the slice below)
    return jnp.concatenate([x[h:], x[-h:]], axis=0)


def flat_volume_geometry(
    depth: int,
    h: int,
    rrow: jnp.ndarray,
    zidx: jnp.ndarray,
    phase: Optional[jnp.ndarray] = None,
    dz_ratio: float = 1.0,
    fiber: Optional[tuple] = None,
    h_true: Optional[int] = None,
    w_true: Optional[int] = None,
) -> Geometry:
    """Volume geometry on the flattened `[D*H, W]` layout.

    `rrow` / `zidx` are `[D*H, 1]` int32 planes holding row-within-slice
    and slice index (static; kernel inputs).  `phase` is the z-tiled
    `[D*H, W]` extruded field; `fiber` entries are `[D*H, 1]` per-slice
    tensors (each slice's value repeated H times).  Value-identical to
    vmem_volume_geometry / stencil3d on the reshaped planes.

    Pad support: `h` is the slice STRIDE (the padded row count per
    slice); `h_true` / `w_true` are the true edge positions when the
    planes carry (8, 128)-alignment padding (rows/cols past them are
    garbage that no real cell ever reads — the REFLECT/SYMMETRIC masks
    fire at the TRUE edges, the same global-index trick as
    ops.pallas_tiled.block_geometry)."""
    if h_true is None:
        h_true = h
    top = rrow == 0
    bottom = rrow == h_true - 1
    first = zidx == 0
    last = zidx == depth - 1

    def north_south(x):
        # both raw row shifts computed once, shared by the two selects
        ru = _rup(x)
        rd = _rdn(x)
        return jnp.where(top, rd, ru), jnp.where(bottom, ru, rd)

    def west(x):
        # the true left edge is always column 0: structural reflect
        return jnp.concatenate([x[:, 1:2], x[:, :-1]], axis=1)

    if w_true is None:
        def east(x):
            return jnp.concatenate([x[:, 1:], x[:, -2:-1]], axis=1)

        def col_fix(x):
            return jnp.concatenate(
                [x[:, 1:2], x[:, 1:-1], x[:, -2:-1]], axis=1
            )
    else:
        def _right_edge(x):
            cg = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1]), 1)
            return cg == w_true - 1

        def east(x):
            # raw right shift (last col keeps itself), reflect at the
            # TRUE right edge; pad columns stay garbage
            raw = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
            left = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
            return jnp.where(_right_edge(x), left, raw)

        def col_fix(x):
            left = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
            x = jnp.where(_right_edge(x), left, x)
            return jnp.concatenate([x[:, 1:2], x[:, 1:]], axis=1)

    def z_term(x):
        # one raw +/-H shift each, REUSED by both edge selects — there is
        # no CSE at trace time, and each H-block concat costs real Mosaic
        # compile time at whole-volume tile counts
        zu = _rup_h(x, h)
        zd = _rdn_h(x, h)
        zup = jnp.where(first, zd, zu)
        zdown = jnp.where(last, zu, zd)
        return zup - 2.0 * x + zdown

    def laplace(x):
        n, s = north_south(x)
        w = west(x)
        e = east(x)
        nw = west(n)
        ne = east(n)
        sw = west(s)
        se = east(s)
        if fiber is None:
            planar = n + s + w + e + 0.5 * (nw + ne + sw + se) - 6.0 * x
            if phase is not None:
                pn, ps = north_south(phase)
                pw = west(phase)
                pe = east(phase)
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
                pn, ps = north_south(phase)
                gx = e - w
                gy = s - n
                px = east(phase) - west(phase)
                py = ps - pn
                planar = planar + (
                    gx * (dxx * px + dxy * py)
                    + gy * (dxy * px + dyy * py)
                ) / (4.0 * phase)
        return planar + (2.0 * dz_ratio) * z_term(x)

    def enforce_boundary(x):
        # same face-rewrite order as enforce_boundary3d: z, rows, cols.
        # Each raw shift is computed once from the pre-rewrite array —
        # equivalent for depth >= 3 / height >= 3 (the replaced faces
        # never source from each other at those sizes, which run_volume
        # enforces) and halves the H-block concat count
        zd = _rdn_h(x, h)
        zu = _rup_h(x, h)
        x = jnp.where(first, zd, x)
        x = jnp.where(last, zu, x)
        rd = _rdn(x)
        ru = _rup(x)
        x = jnp.where(top, rd, x)
        x = jnp.where(bottom, ru, x)
        return col_fix(x)

    return Geometry(laplace=laplace, enforce_boundary=enforce_boundary)


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

    def z_term(x):
        # raw shifts computed once and reused by both edge selects (no
        # CSE at trace time; leading-axis concats cost Mosaic compile
        # time).  Reflect at the global faces: slice 0's z-neighbor is
        # slice 1, etc.
        zu = _zup_raw(x)
        zd = _zdown_raw(x)
        zup = jnp.where(top, zd, zu)
        zdown = jnp.where(bottom, zu, zd)
        return zup - 2.0 * x + zdown

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
        return planar + (2.0 * dz_ratio) * z_term(x)

    def enforce_boundary(x):
        # SYMMETRIC z faces only at the global edges (interior neighbor
        # replaces the face slice), in-plane faces everywhere.  Raw
        # shifts from the pre-rewrite array, computed once — equivalent
        # for >= 3 slices between the global faces
        zd = _zdown_raw(x)
        zu = _zup_raw(x)
        x = jnp.where(top, zd, x)
        x = jnp.where(bottom, zu, x)
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
    substeps: Optional[int] = None,
):
    """Fused substep-group kernel over ONE z-halo-extended volume block —
    the per-shard compute of the wide-halo shard_map volume path
    (parallel/volume_spmd.py), mirroring ops.pallas_tiled.make_block_kernel.

    The caller exchanges K ghost z-slices via ppermute, then this kernel
    advances the whole fused substep group with the block VMEM-resident.
    Internally the block runs in the FLAT `[ext_d * H, W]` layout (the
    Mosaic-practical one — see flat_volume_geometry); the global-z edge
    masks come from a `[ext_d * H, 1]` GLOBAL slice-index plane the
    caller computes from `lax.axis_index` (so the same
    flat_volume_geometry serves both the whole-volume and the block
    kernel — halo slices have out-of-range indices and no mask fires on
    them).

    Returns `step(ext_state, rrow, zidx_g[, phase_flat][, fiber_flat])
    -> ext_state` where `rrow` is the static row-within-slice plane,
    `zidx_g` the traced global slice indices, `phase_flat` the
    `[ext_d*H, W]` tiled phase, and `fiber_flat` three `[ext_d*H, 1]`
    halo-extended per-slice tensors.  Halo slices of the output are
    garbage; the caller crops."""
    names = model.state_keys()
    n = len(names)
    h, w = model.cfg.height, model.cfg.width
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def kernel(*refs):
        from fib_tf_tpu.ops import integrators

        ins = refs[:n]
        i = n
        rrow = refs[i][:]
        zidx_g = refs[i + 1][:]
        i += 2
        phase_arr = refs[i][:] if has_phase else None
        i += 1 if has_phase else 0
        fib = None
        if has_fiber:
            fib = tuple(refs[i + j][:] for j in range(3))
            i += 3
        outs = refs[-n:]

        geom = flat_volume_geometry(
            d_total, h, rrow, zidx_g, phase_arr, dz_ratio, fib
        )
        state = {kk: r[:] for kk, r in zip(names, ins)}
        integrators._IN_PALLAS_KERNEL = True
        try:
            if substeps is None:
                state = model.kernel_step(state, geom)
            else:
                # a sub-group of the outer step (the wide-halo halo_k
                # cadence; requires model.has_uniform_substeps)
                state = model.substep_group(state, geom, substeps)
        finally:
            integrators._IN_PALLAS_KERNEL = False
        for kk, r in zip(names, outs):
            r[:] = state[kk]

    plane = jax.ShapeDtypeStruct((ext_d * h, w), jnp.float32)
    vspec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)
    n_in = n + 2 + (1 if has_phase else 0) + (3 if has_fiber else 0)
    call = pl.pallas_call(
        kernel,
        out_shape=[plane] * n,
        in_specs=[vspec] * n_in,
        out_specs=[vspec] * n,
        input_output_aliases={i: i for i in range(n)},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    def step(ext_state, rrow, zidx_g, phase_flat=None, fiber_flat=None):
        args = [ext_state[k].reshape(ext_d * h, w) for k in names]
        args.extend([rrow, zidx_g])
        if has_phase:
            args.append(phase_flat)
        if has_fiber:
            args.extend(fiber_flat)
        outs = call(*args)
        return {k: o.reshape(ext_d, h, w)
                for k, o in zip(names, outs)}

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
    layout: str = "flat",
    pad: bool = False,
):
    """Build `step(state) -> state` advancing a `[depth, H, W]` volume one
    outer step (`dt_per_step` substeps) as a single VMEM-resident Pallas
    kernel — run_volume's fused fast path.

    `phase` is the 2D `[H, W]` extruded field, `fiber` the per-slice
    (dxx, dxy, dyy) from stencil3d.fiber_tensors (or scalars); both are
    passed as extra kernel inputs.  On TPU each slice must be
    (8, 128)-aligned (H % 8 == 0, W % 128 == 0; depth is free) — OR pass
    `pad=True`: the step then operates on planes padded to the tile
    multiples, with REFLECT/SYMMETRIC applied at the TRUE edges via
    index masks (the pad region evolves garbage that no real cell reads;
    the caller pads once per chunk with `pad_volume_state` and crops
    with `crop_volume_state`, and `step.padded_hw` reports the padded
    (H, W) or None).

    `layout` picks the in-kernel data layout.  'flat' (default) stacks
    the slices into one `[D*H, W]` sheet so every operator has the 2D op
    shapes the whole-grid kernels compile quickly, with slice-edge
    masking from static index planes (flat_volume_geometry); '3d' keeps
    native `[D, H, W]` arrays (vmem_volume_geometry) — value-identical,
    but Mosaic compile time on the 3D layout was measured impractical
    (>90 min for fenton 16x256x512 vs minutes flat)."""
    if layout not in ("flat", "3d"):
        raise ValueError(f"layout must be flat|3d, got {layout!r}")
    names = model.state_keys()
    n = len(names)
    h, w = model.cfg.height, model.cfg.width
    flat = layout == "flat"
    if pad and not flat:
        raise ValueError("pad=True needs layout='flat'")
    kh, kw = (h, w)
    if pad:
        from fib_tf_tpu.ops.pallas_step import padded_shape

        pshape = padded_shape(h, w)
        if pshape is None:
            pad = False
        else:
            kh, kw = pshape
    has_phase = phase is not None
    if has_phase:
        phase_f32 = np.asarray(phase, np.float32)
        if pad:
            # pad value 1.0 keeps 1/(4*phase) finite in the (never read
            # by real cells) pad region, as in the 2D pad path
            phase_f32 = np.pad(
                phase_f32, ((0, kh - h), (0, kw - w)),
                mode="constant", constant_values=1.0,
            )
        if flat:
            phase_f32 = np.tile(phase_f32, (depth, 1))
    else:
        phase_f32 = None
    has_fiber = fiber is not None
    if has_fiber:
        per_slice = [
            np.broadcast_to(np.asarray(c, np.float32), (depth,))
            for c in fiber
        ]
        if flat:
            fiber_f32 = [
                np.repeat(c, kh).reshape(depth * kh, 1).copy()
                for c in per_slice
            ]
        else:
            fiber_f32 = [c.reshape(depth, 1, 1).copy() for c in per_slice]
    if flat:
        rrow_np = np.tile(np.arange(kh, dtype=np.int32), depth
                          ).reshape(depth * kh, 1)
        zidx_np = np.repeat(np.arange(depth, dtype=np.int32), kh
                            ).reshape(depth * kh, 1)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def kernel(*refs):
        from fib_tf_tpu.ops import integrators

        k = n
        ins = refs[:n]
        if flat:
            rrow = refs[k][:]
            zidx = refs[k + 1][:]
            k += 2
        phase_arr = refs[k][:] if has_phase else None
        k += 1 if has_phase else 0
        fib = None
        if has_fiber:
            fib = tuple(refs[k + i][:] for i in range(3))
            k += 3
        outs = refs[k:]
        state = {key: r[:] for key, r in zip(names, ins)}
        if flat:
            geom = flat_volume_geometry(
                depth, kh, rrow, zidx, phase_arr, dz_ratio, fib,
                h_true=h, w_true=(w if kw != w else None),
            )
        else:
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

    shape = (depth * kh, kw) if flat else (depth, h, w)
    plane = jax.ShapeDtypeStruct(shape, jnp.float32)
    spec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)
    n_in = (n + (2 if flat else 0) + (1 if has_phase else 0)
            + (3 if has_fiber else 0))
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
        """With `pad`, operates on PADDED `[depth, kh, kw]` planes (use
        pad_volume_state / crop_volume_state to convert)."""
        if flat:
            args = [state[k].reshape(depth * kh, kw) for k in names]
            args.extend([jnp.asarray(rrow_np), jnp.asarray(zidx_np)])
        else:
            args = [state[k] for k in names]
        if has_phase:
            args.append(jnp.asarray(phase_f32))
        if has_fiber:
            args.extend(jnp.asarray(f) for f in fiber_f32)
        outs = call(*args)
        if flat:
            outs = [o.reshape(depth, kh, kw) for o in outs]
        return dict(zip(names, outs))

    step.padded_hw = (kh, kw) if pad else None
    return step


# -----------------------------------------------------------------------------
# Row-tiled volume kernel — large volumes past the whole-volume compile cap
# -----------------------------------------------------------------------------

def make_tiled_volume_step(
    model: IonicModel,
    depth: int,
    tile_rows: int,
    phase: Optional[np.ndarray] = None,
    dz_ratio: float = 1.0,
    fiber: Optional[tuple] = None,
    interpret: Optional[bool] = None,
):
    """Build `step(state) -> state`: one outer step of a `[depth, H, W]`
    volume as a ROW-tiled, temporally-blocked Pallas kernel — the fused
    fast path for volumes past the whole-volume kernel's compile cap
    (engine.volume.VOLUME_KERNEL_CELLS_MAX; Mosaic compile grows
    ~quadratically in flattened tile count, docs/OPTIMIZATIONS.md §14).

    Design: the grid iterates over row tiles.  Each kernel instance DMAs
    `tile_rows + 2K` rows of EVERY z-slice of every plane (K =
    halo_rows(dt_per_step)), so the block holds the full z extent for
    its row window: z coupling is complete in-block (REFLECT at the
    global z faces via the static slice-index plane) and only the row
    direction is temporally blocked — halo rows turn to garbage one ring
    per substep exactly as in ops.pallas_tiled.  In-block the slices run
    in the FLAT `[depth * ext_h, W]` layout (the Mosaic-practical one,
    see flat_volume_geometry) with the slice stride = ext_h and TRACED
    global row indices, so the compiled program size is set by the BLOCK
    size, not the volume size.

    Requires (8, 128)-aligned (H, W), tile_rows % 8 == 0,
    H % tile_rows == 0, and H >= tile_rows + 2K (the same DMA-window
    clamp as the 2D tiled kernel).  Unaligned large volumes stay on the
    XLA path."""
    from fib_tf_tpu.ops.pallas_tiled import halo_rows

    names = model.state_keys()
    n = len(names)
    h, w = model.cfg.height, model.cfg.width
    if h % 8 != 0 or w % 128 != 0:
        raise ValueError(
            f"{h}x{w} is not (8, 128)-aligned; the tiled volume kernel "
            "needs aligned (H, W)"
        )
    if tile_rows % 8 != 0 or h % tile_rows != 0:
        raise ValueError(
            f"tile_rows {tile_rows} must be a multiple of 8 dividing "
            f"height {h}"
        )
    k = halo_rows(model.dt_per_step)
    ext_h = tile_rows + 2 * k
    if h < ext_h:
        raise ValueError(
            f"height {h} < tile_rows + 2*halo = {ext_h}; pick a smaller "
            f"tile_rows or use the whole-volume/XLA path"
        )
    n_tiles = h // tile_rows
    has_phase = phase is not None
    if has_phase:
        # z-tiled flat [D*H, W] so the phase windows DMA exactly like
        # the state planes
        phase_f32 = np.tile(np.asarray(phase, np.float32), (depth, 1))
    has_fiber = fiber is not None
    if has_fiber:
        per_slice = [
            np.broadcast_to(np.asarray(c, np.float32), (depth,))
            for c in fiber
        ]
        # value depends only on z: a static [depth * ext_h, 1] plane
        # (the same rows for every tile) needs no DMA windowing
        fiber_blk = [
            np.repeat(c, ext_h).reshape(depth * ext_h, 1).copy()
            for c in per_slice
        ]
    zidx_blk = np.repeat(
        np.arange(depth, dtype=np.int32), ext_h
    ).reshape(depth * ext_h, 1)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n_in = n + (1 if has_phase else 0)  # HBM flat planes with row windows

    def tile_start(tile_idx):
        return pl.multiple_of(
            jnp.clip(tile_idx * tile_rows - k, 0, h - ext_h), 8
        )

    def kernel(*refs):
        from fib_tf_tpu.ops import integrators

        ni = n_in + 1 + (3 if has_fiber else 0)      # total inputs
        in_refs = refs[:n_in]                        # HBM [D*H, W] planes
        zidx_ref = refs[n_in]                        # [D*ext_h, 1] static
        fib_refs = refs[n_in + 1 : ni]
        out_refs = refs[ni : ni + n]
        scratch = refs[ni + n : ni + n + n_in]       # VMEM ext blocks
        sem = refs[-1]

        t = pl.program_id(0)
        start = tile_start(t)
        offset = pl.multiple_of(t * tile_rows - start, 8)

        # gather each slice's row window into the flat [D*ext_h, W] block
        for i in range(n_in):
            for z in range(depth):
                pltpu.make_async_copy(
                    in_refs[i].at[pl.ds(z * h + start, ext_h)],
                    scratch[i].at[pl.ds(z * ext_h, ext_h)],
                    sem.at[i, z],
                ).start()
        for i in range(n_in):
            for z in range(depth):
                pltpu.make_async_copy(
                    in_refs[i].at[pl.ds(z * h + start, ext_h)],
                    scratch[i].at[pl.ds(z * ext_h, ext_h)],
                    sem.at[i, z],
                ).wait()

        zidx = zidx_ref[:]
        flat_iota = jax.lax.broadcasted_iota(
            jnp.int32, (depth * ext_h, 1), 0
        )
        rrow = start + flat_iota - ext_h * zidx  # traced global row index
        phase_arr = scratch[n][:] if has_phase else None
        fib = tuple(r[:] for r in fib_refs) if has_fiber else None
        geom = flat_volume_geometry(
            depth, ext_h, rrow, zidx, phase_arr, dz_ratio, fib, h_true=h
        )
        state = {kk: scratch[i][:] for i, kk in enumerate(names)}
        integrators._IN_PALLAS_KERNEL = True
        try:
            state = model.kernel_step(state, geom)
        finally:
            integrators._IN_PALLAS_KERNEL = False

        # Mosaic lowers dynamic slices on REFS but not values: round-trip
        # through the (now-consumed) input scratch to slice out the valid
        # center rows of each slice
        for i, kk in enumerate(names):
            scratch[i][:] = state[kk]
        for i in range(n):
            for z in range(depth):
                out_refs[i][z] = scratch[i][
                    pl.ds(z * ext_h + offset, tile_rows), :
                ]

    flat_plane = jax.ShapeDtypeStruct((depth * h, w), jnp.float32)
    vol_plane = jax.ShapeDtypeStruct((depth, h, w), jnp.float32)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    small_vspec = pl.BlockSpec(
        memory_space=pl.ANY if interpret else pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (depth, tile_rows, w), lambda t: (0, t, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM,
    )
    in_specs = ([any_spec] * n_in + [small_vspec]
                + [small_vspec] * (3 if has_fiber else 0))
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=[vol_plane] * n,
        in_specs=in_specs,
        out_specs=[out_spec] * n,
        scratch_shapes=(
            [pltpu.VMEM((depth * ext_h, w), jnp.float32)] * n_in
            + [pltpu.SemaphoreType.DMA((n_in, depth))]
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )

    def step(state: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        args = [state[kk].reshape(depth * h, w) for kk in names]
        if has_phase:
            args.append(jnp.asarray(phase_f32))
        args.append(jnp.asarray(zidx_blk))
        if has_fiber:
            args.extend(jnp.asarray(f) for f in fiber_blk)
        outs = call(*args)
        return dict(zip(names, outs))

    return step


def pad_volume_state(state: Dict[str, jnp.ndarray], h: int, w: int,
                     hp: int, wp: int) -> Dict[str, jnp.ndarray]:
    """Edge-replicate a `[D, h, w]` state into padded `[D, hp, wp]`
    planes (edge values keep the never-read pad region in physiological
    range, as in ops.pallas_step.pad_state)."""
    return {
        k: jnp.pad(v, ((0, 0), (0, hp - h), (0, wp - w)), mode="edge")
        for k, v in state.items()
    }


def crop_volume_state(state: Dict[str, jnp.ndarray], h: int, w: int
                      ) -> Dict[str, jnp.ndarray]:
    """Strip the pad region back off."""
    return {k: v[:, :h, :w] for k, v in state.items()}

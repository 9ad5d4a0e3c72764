"""Row-tiled, temporally-blocked Pallas step kernel.

The whole-grid kernel (pallas_step.py) needs every plane plus all
temporaries resident in VMEM at once — measured to win up to ~32 MB of
state (even Courtemanche's 21 planes at 512x512).  This variant restores
VMEM headroom beyond that with the classic overlapped temporal-blocking
scheme:

  * the grid iterates over row tiles; each kernel instance DMAs
    `tile_rows + 2K` rows of every plane from HBM into VMEM scratch
    (K = dt_per_step, one halo ring consumed per substep);
  * all K substeps run on the extended block — halo rows turn to garbage
    one ring per substep, by construction;
  * the still-valid center `tile_rows` rows are written out.

HBM traffic per outer step: (1 + 2K/tile_rows) reads + 1 write of the
state — versus K reads + K writes for the XLA scan path.  Global boundary
conditions (REFLECT / SYMMETRIC, reference ionic.py:44-60, 107-113) are
applied per substep via global-row-index masks, so only the tiles that
actually touch the domain edge pay them — the same trick the shard_map
halo path uses with axis_index (parallel/halo.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fib_tf_tpu.models.base import Geometry, IonicModel


def _col_reflect_west(x):
    return jnp.concatenate([x[:, 1:2], x[:, :-1]], axis=1)


def _col_reflect_east(x):
    return jnp.concatenate([x[:, 1:], x[:, -2:-1]], axis=1)


def _row_up(x):  # y[i] = x[i-1]; row 0 keeps itself (fixed by masks/halo)
    return jnp.concatenate([x[:1], x[:-1]], axis=0)


def _row_down(x):  # y[i] = x[i+1]; last row keeps itself
    return jnp.concatenate([x[1:], x[-1:]], axis=0)


def _col_left(x):   # y[:, j] = x[:, j-1]; col 0 keeps itself
    return jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)


def _col_right(x):  # y[:, j] = x[:, j+1]; last col keeps itself
    return jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)


def block_geometry(
    rg: jnp.ndarray,
    h_total: int,
    cg: Optional[jnp.ndarray] = None,
    w_total: Optional[int] = None,
    phase_ext: Optional[jnp.ndarray] = None,
    fiber: Optional[tuple] = None,
    dmap_ext: Optional[jnp.ndarray] = None,
) -> Geometry:
    """Geometry over a block extended with halo rows (and, when `cg` is
    given, halo columns).

    `rg` is the [ext_h, 1] int32 array of global row indices of the
    block's rows; rows outside [0, h_total) are halo garbage that shrinks
    away one ring per substep.  Without `cg`, columns span the full width
    and use plain REFLECT semantics; with `cg` ([1, ext_w] global column
    indices) the same global-edge masking applies along columns — the 2D
    wide-halo case.

    `dmap_ext` is the per-pixel relative diffusion map on the SAME
    extended block (fibrosis; stencil.conduction_correction convention),
    composable with both the phase field and the fiber tensor.
    """
    top = rg == 0
    bottom = rg == h_total - 1

    def north(x):
        # reflect at the global top edge: row 0's north neighbor is row 1
        return jnp.where(top, _row_down(x), _row_up(x))

    def south(x):
        return jnp.where(bottom, _row_up(x), _row_down(x))

    if cg is None:
        west, east = _col_reflect_west, _col_reflect_east

        def col_fix(x):
            return jnp.concatenate(
                [x[:, 1:2], x[:, 1:-1], x[:, -2:-1]], axis=1
            )
    else:
        left_edge = cg == 0
        right_edge = cg == w_total - 1

        def west(x):
            return jnp.where(left_edge, _col_right(x), _col_left(x))

        def east(x):
            return jnp.where(right_edge, _col_left(x), _col_right(x))

        def col_fix(x):
            x = jnp.where(left_edge, _col_right(x), x)
            x = jnp.where(right_edge, _col_left(x), x)
            return x

    def laplace(x):
        n = north(x)
        s = south(x)
        w = west(x)
        e = east(x)
        nw = west(n)
        ne = east(n)
        sw = west(s)
        se = east(s)
        if fiber is not None:
            # anisotropic tensor operator (value-identical to
            # stencil.anisotropic_laplace incl. the x2 normalization)
            dxx, dxy, dyy = fiber
            vxx = w - 2.0 * x + e
            vyy = n - 2.0 * x + s
            vxy = 0.25 * (se + nw - sw - ne)
            l = 2.0 * (dxx * vxx + 2.0 * dxy * vxy + dyy * vyy)
            if dmap_ext is not None:
                l = dmap_ext * l
                q = (dmap_ext * phase_ext if phase_ext is not None
                     else dmap_ext)
                phi = phase_ext if phase_ext is not None else 1.0
                gx = e - w
                gy = s - n
                qx = east(q) - west(q)
                qy = south(q) - north(q)
                return l + (
                    gx * (dxx * qx + dxy * qy)
                    + gy * (dxy * qx + dyy * qy)
                ) / (4.0 * phi)
            if phase_ext is not None:
                p = phase_ext
                gx = e - w
                gy = s - n
                px = east(p) - west(p)
                py = south(p) - north(p)
                l = l + (
                    gx * (dxx * px + dxy * py)
                    + gy * (dxy * px + dyy * py)
                ) / (4.0 * p)
            return l
        l = n + s + w + e + 0.5 * (nw + ne + sw + se) - 6.0 * x
        if dmap_ext is not None:
            l = dmap_ext * l
            q = (dmap_ext * phase_ext if phase_ext is not None
                 else dmap_ext)
            phi = phase_ext if phase_ext is not None else 1.0
            return l + (
                (s - n) * (south(q) - north(q))
                + (e - w) * (east(q) - west(q))
            ) / (4.0 * phi)
        if phase_ext is not None:
            p = phase_ext
            pn = north(p)
            ps = south(p)
            pw = west(p)
            pe = east(p)
            l = l + ((s - n) * (ps - pn) + (e - w) * (pe - pw)) / (4.0 * p)
        return l

    def enforce_boundary(x):
        x = jnp.where(top, _row_down(x), x)       # row 0 <- row 1
        x = jnp.where(bottom, _row_up(x), x)      # row H-1 <- row H-2
        return col_fix(x)

    return Geometry(laplace=laplace, enforce_boundary=enforce_boundary)


def tile_geometry(rg: jnp.ndarray, h_total: int,
                  phase_ext: Optional[jnp.ndarray] = None,
                  fiber: Optional[tuple] = None,
                  dmap_ext: Optional[jnp.ndarray] = None) -> Geometry:
    """Row-extended block geometry (full-width columns) — the tiled
    kernel's and 1D wide-halo's case."""
    return block_geometry(rg, h_total, phase_ext=phase_ext, fiber=fiber,
                          dmap_ext=dmap_ext)


def halo_rows(dt_per_step: int) -> int:
    """Temporal-halo rows per side of the tiled kernel: one ring per
    substep, padded to the f32 sublane multiple (8) so every dynamic DMA
    row offset is provably aligned.  The single source of truth — the
    engine's tile-size selection imports this."""
    return ((dt_per_step + 7) // 8) * 8


def make_block_kernel(
    model: IonicModel,
    ext_h: int,
    ext_w: int,
    h_total: int,
    w_total: Optional[int] = None,
    two_d: bool = False,
    has_phase: bool = False,
    interpret: Optional[bool] = None,
    fiber: Optional[tuple] = None,
    substeps_per_launch: Optional[int] = None,
    has_dmap: bool = False,
):
    """Fused substep-group kernel over ONE halo-extended block — the
    per-shard compute of the wide-halo shard_map path (parallel/spmd.py).

    The caller exchanges K ghost rows (and columns on a 2D mesh) via
    ppermute, then this kernel advances the whole fused group with the
    block VMEM-resident, exactly like the temporally-blocked tile kernel
    — except the "tile" is the shard's block and the halo came over ICI
    instead of from HBM.  `rstart` (and `cstart`) are the block's global
    start indices (they depend on `lax.axis_index`, so they enter as
    runtime scalars); global REFLECT/SYMMETRIC edge rules apply only on
    the shards that own a domain edge, via the same global-index masks as
    `block_geometry`.

    Returns `step(ext_state, rstart[, cstart][, phase_ext]) -> ext_state`
    (halo rings of the output are garbage; the caller crops the center).
    On TPU the lane dimension (ext_w) should be a multiple of 128.

    `substeps_per_launch=k` splits the group into ceil(K/k) chained
    launches of at most k substeps, one kernel per DISTINCT body (the
    Mosaic compile-cliff knob — see ops/pallas_step.make_pallas_step).
    All launches run on the SAME halo-extended block: the ghost rings
    keep shrinking one per substep across launch boundaries exactly as
    they do inside the monolith, so no extra exchange is needed and the
    composition is value-identical."""
    names = model.state_keys()
    n = len(names)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def build_call(body):
        def kernel(*refs):
            from fib_tf_tpu.ops import integrators

            ins = refs[:n]
            i = n
            rstart_ref = refs[i]
            i += 1
            cstart_ref = None
            if two_d:
                cstart_ref = refs[i]
                i += 1
            phase_ext = None
            if has_phase:
                phase_ext = refs[i][:]
                i += 1
            dmap_ext = refs[i][:] if has_dmap else None
            outs = refs[-n:]

            rg = rstart_ref[0] + jax.lax.broadcasted_iota(
                jnp.int32, (ext_h, 1), 0
            )
            cg = None
            if two_d:
                cg = cstart_ref[0] + jax.lax.broadcasted_iota(
                    jnp.int32, (1, ext_w), 1
                )
            geom = block_geometry(rg, h_total, cg, w_total, phase_ext,
                                  fiber, dmap_ext=dmap_ext)
            state = {kk: r[:] for kk, r in zip(names, ins)}
            integrators._IN_PALLAS_KERNEL = True
            try:
                state = body(state, geom)
            finally:
                integrators._IN_PALLAS_KERNEL = False
            for kk, r in zip(names, outs):
                r[:] = state[kk]

        plane = jax.ShapeDtypeStruct((ext_h, ext_w), jnp.float32)
        vspec = pl.BlockSpec(
            memory_space=pl.ANY if interpret else pltpu.VMEM)
        sspec = pl.BlockSpec(
            memory_space=pl.ANY if interpret else pltpu.SMEM)
        in_specs = [vspec] * n + [sspec] + ([sspec] if two_d else [])
        if has_phase:
            in_specs.append(vspec)
        if has_dmap:
            in_specs.append(vspec)
        return pl.pallas_call(
            kernel,
            out_shape=[plane] * n,
            in_specs=in_specs,
            out_specs=[vspec] * n,
            input_output_aliases={i: i for i in range(n)},
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )

    if (substeps_per_launch is not None
            and substeps_per_launch < model.dt_per_step):
        from fib_tf_tpu.models.base import cell_geometry
        from fib_tf_tpu.ops.pallas_step import plan_launch_groups

        _, labels = model.substep_fns(cell_geometry())
        groups = plan_launch_groups(labels, substeps_per_launch)
        calls = {}
        for i0, i1, key in groups:
            if key not in calls:
                def body(state, geom, _i0=i0, _i1=i1):
                    fns, _ = model.substep_fns(geom)
                    for f in fns[_i0:_i1]:
                        state = f(state)
                    return state

                calls[key] = build_call(body)
        seq = [calls[key] for _i0, _i1, key in groups]
    else:
        seq = [build_call(lambda s, g: model.kernel_step(s, g))]

    def step(ext_state, rstart, cstart=None, phase_ext=None,
             dmap_ext=None):
        args = [ext_state[kk] for kk in names]
        extras = [jnp.asarray(rstart, jnp.int32).reshape(1)]
        if two_d:
            extras.append(jnp.asarray(cstart, jnp.int32).reshape(1))
        if has_phase:
            extras.append(phase_ext)
        if has_dmap:
            extras.append(dmap_ext)
        for call in seq:
            args = list(call(*args, *extras))
        return dict(zip(names, args))

    return step


def make_tiled_pallas_step(
    model: IonicModel,
    tile_rows: int = 128,
    phase: Optional[np.ndarray] = None,
    interpret: Optional[bool] = None,
    double_buffer: Optional[bool] = None,
    fiber: Optional[tuple] = None,
    dmap: Optional[np.ndarray] = None,
):
    """Build `step(state) -> state`: one outer step (all dt_per_step
    substeps) as a row-tiled temporally-blocked Pallas kernel.

    `double_buffer` prefetches tile t+1's halo block while tile t
    computes.  Measured perf-neutral on v5e at 512x512 (the kernel is
    VPU-compute-bound, and Mosaic already overlaps enough of the DMA), and
    verified value-identical; kept as an option for larger grids or
    narrower-compute models.  Default off."""
    cfg = model.cfg
    h, w = cfg.height, cfg.width
    if h % tile_rows != 0:
        raise ValueError(f"height {h} not divisible by tile_rows {tile_rows}")
    k = halo_rows(model.dt_per_step)
    ext_h = tile_rows + 2 * k
    if h < ext_h:
        # tile_start clamps the DMA window to [0, h - ext_h]; a negative
        # upper bound would produce an out-of-bounds read (ADVICE r1 #1)
        raise ValueError(
            f"height {h} < tile_rows + 2*halo = {ext_h}; pick a smaller "
            f"tile_rows or use the whole-grid/XLA path"
        )
    n_tiles = h // tile_rows
    names = model.state_keys()
    n = len(names)
    has_phase = phase is not None
    phase_f32 = np.asarray(phase, np.float32) if has_phase else None
    has_dmap = dmap is not None
    dmap_f32 = np.asarray(dmap, np.float32) if has_dmap else None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if double_buffer is None:
        double_buffer = False

    n_in = n + (1 if has_phase else 0) + (1 if has_dmap else 0)

    def tile_start(tile_idx):
        # clamp the loaded window to the array; the tile's rows sit at a
        # varying offset inside it (k in the interior, 0 / 2k at the edges)
        return pl.multiple_of(
            jnp.clip(tile_idx * tile_rows - k, 0, h - ext_h), 8
        )

    def compute_and_emit(read, out_refs, work, start, offset):
        """Run the fused substep group on the extended blocks (`read(i)`
        yields plane i's [ext_h, w] block) and write the valid center rows
        to the outputs."""
        from fib_tf_tpu.ops import integrators

        rg = start + jax.lax.broadcasted_iota(jnp.int32, (ext_h, 1), 0)
        i_extra = n
        phase_ext = None
        if has_phase:
            phase_ext = read(i_extra)
            i_extra += 1
        dmap_ext = read(i_extra) if has_dmap else None
        geom = tile_geometry(rg, h, phase_ext, fiber, dmap_ext)

        state = {kk: read(i) for i, kk in enumerate(names)}
        integrators._IN_PALLAS_KERNEL = True
        try:
            state = model.kernel_step(state, geom)
        finally:
            integrators._IN_PALLAS_KERNEL = False

        # Mosaic lowers dynamic slices on REFS (pl.ds) but not on values:
        # round-trip the result through scratch to slice out the center.
        for i, kk in enumerate(names):
            work[i][:] = state[kk]
        for i in range(n):
            out_refs[i][:] = work[i][pl.ds(offset, tile_rows), :]

    def kernel_simple(*refs):
        in_refs = refs[:n_in]                      # HBM (ANY) full planes
        out_refs = refs[n_in : n_in + n]           # blocked VMEM outputs
        scratch = refs[n_in + n : n_in + n + n_in] # VMEM ext blocks
        sem = refs[-1]

        t = pl.program_id(0)
        start = tile_start(t)
        offset = pl.multiple_of(t * tile_rows - start, 8)

        for i in range(n_in):
            pltpu.make_async_copy(
                in_refs[i].at[pl.ds(start, ext_h)], scratch[i], sem.at[i]
            ).start()
        for i in range(n_in):
            pltpu.make_async_copy(
                in_refs[i].at[pl.ds(start, ext_h)], scratch[i], sem.at[i]
            ).wait()
        compute_and_emit(
            lambda i: scratch[i][:], out_refs, scratch, start, offset
        )

    def kernel_db(*refs):
        """Double-buffered variant: prefetch tile t+1 during tile t's
        compute.  Scratch persists across grid iterations; slot = t % 2."""
        in_refs = refs[:n_in]
        out_refs = refs[n_in : n_in + n]
        scratch = refs[n_in + n : n_in + n + n_in]  # [2, ext_h, w] each
        work = refs[n_in + n + n_in : n_in + n + n_in + n]
        sem = refs[-1]                               # (n_in, 2)

        t = pl.program_id(0)
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        def dma(tile_idx, s):
            start = tile_start(tile_idx)
            return [
                pltpu.make_async_copy(
                    in_refs[i].at[pl.ds(start, ext_h)],
                    scratch[i].at[s],
                    sem.at[i, s],
                )
                for i in range(n_in)
            ]

        @pl.when(t == 0)
        def _():
            for c in dma(0, slot):
                c.start()

        @pl.when(t + 1 < n_tiles)
        def _():
            for c in dma(t + 1, nxt):
                c.start()

        for c in dma(t, slot):
            c.wait()

        start = tile_start(t)
        offset = pl.multiple_of(t * tile_rows - start, 8)
        compute_and_emit(
            lambda i: scratch[i][slot], out_refs, work, start, offset
        )

    plane = jax.ShapeDtypeStruct((h, w), jnp.float32)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec(
        (tile_rows, w), lambda t: (t, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM,
    )

    if double_buffer:
        scratch_shapes = (
            [pltpu.VMEM((2, ext_h, w), jnp.float32)] * n_in
            + [pltpu.VMEM((ext_h, w), jnp.float32)] * n
            + [pltpu.SemaphoreType.DMA((n_in, 2))]
        )
        kernel = kernel_db
    else:
        scratch_shapes = (
            [pltpu.VMEM((ext_h, w), jnp.float32)] * n_in
            + [pltpu.SemaphoreType.DMA((n_in,))]
        )
        kernel = kernel_simple

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=[plane] * n,
        in_specs=[any_spec] * n_in,
        out_specs=[out_spec] * n,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )

    def step(state: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        args = [state[kk] for kk in names]
        if has_phase:
            args.append(jnp.asarray(phase_f32))
        if has_dmap:
            args.append(jnp.asarray(dmap_f32))
        outs = call(*args)
        return dict(zip(names, outs))

    return step

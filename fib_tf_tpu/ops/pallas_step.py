"""Fused Pallas stencil+reaction kernel (SURVEY.md §7 item 6).

The TPU-native analog of the reference's hand-written CUDA kernels: one
`pallas_call` holds the ENTIRE state in VMEM and advances a full outer step
(all `dt_per_step` substeps) before touching HBM again.  The pure-XLA scan
path reads+writes every state plane from HBM once per *substep*; this
kernel cuts that traffic by `dt_per_step`x, which is the dominant cost for
these bandwidth-bound models.

Design notes:
  * The models are untouched: `model.step(state, geom)` is traced inside
    the kernel with a VMEM `Geometry` whose shift operators use
    roll+edge-fix instead of `jnp.pad` (Mosaic-friendly, value-identical
    to the REFLECT/SYMMETRIC semantics of ops/stencil.py).
  * `input_output_aliases` maps every input plane to its output so the
    grid state lives in one set of buffers.
  * Whole-grid residency works up to VMEM capacity (e.g. 4 planes x
    512x512 f32 = 4 MB for Fenton, 8 MB for Beeler-Reuter); larger states
    (Courtemanche: 21 planes) stay on the XLA path or shard spatially.
  * On non-TPU backends the kernel runs in interpreter mode (slow but
    value-correct), which is how the CPU test suite validates it.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fib_tf_tpu.models.base import Geometry, IonicModel


# -----------------------------------------------------------------------------
# Roll-based shift operators with REFLECT edge semantics
# -----------------------------------------------------------------------------

def _shift(x: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """y[i, j] = x[reflect(i+dr), reflect(j+dc)] for dr, dc in {-1, 0, 1},
    where reflect maps -1 -> 1 and H -> H-2 (mirror excluding the edge),
    matching a 1-cell jnp.pad(..., 'reflect') + slice.

    Built from concatenated slices (no scatter/gather — Mosaic lowers
    concat + static slices natively)."""
    y = x
    if dr == -1:    # north neighbor; row 0 reflects to x[1]
        y = jnp.concatenate([y[1:2], y[:-1]], axis=0)
    elif dr == 1:   # south neighbor; row H-1 reflects to x[H-2]
        y = jnp.concatenate([y[1:], y[-2:-1]], axis=0)
    if dc == -1:    # west neighbor; col 0 reflects to col 1
        y = jnp.concatenate([y[:, 1:2], y[:, :-1]], axis=1)
    elif dc == 1:   # east neighbor; col W-1 reflects to col W-2
        y = jnp.concatenate([y[:, 1:], y[:, -2:-1]], axis=1)
    return y


def vmem_laplace(
    x: jnp.ndarray,
    phase: Optional[jnp.ndarray] = None,
    dmap: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """9-point REFLECT Laplacian via shifts (value-identical to
    ops.stencil.laplace), plus phase-field correction when `phase` given
    and the heterogeneous-conductivity form when `dmap` is (the q = ϕ·d
    correction of stencil.conduction_correction)."""
    n = _shift(x, -1, 0)
    s = _shift(x, 1, 0)
    w = _shift(x, 0, -1)
    e = _shift(x, 0, 1)
    nw = _shift(x, -1, -1)
    ne = _shift(x, -1, 1)
    sw = _shift(x, 1, -1)
    se = _shift(x, 1, 1)
    l = n + s + w + e + 0.5 * (nw + ne + sw + se) - 6.0 * x
    if dmap is not None:
        l = dmap * l
        q = dmap * phase if phase is not None else dmap
        phi = phase if phase is not None else 1.0
        qn = _shift(q, -1, 0)
        qs = _shift(q, 1, 0)
        qw = _shift(q, 0, -1)
        qe = _shift(q, 0, 1)
        return l + ((s - n) * (qs - qn) + (e - w) * (qe - qw)) / (4.0 * phi)
    if phase is not None:
        pn = _shift(phase, -1, 0)
        ps = _shift(phase, 1, 0)
        pw = _shift(phase, 0, -1)
        pe = _shift(phase, 0, 1)
        l = l + ((s - n) * (ps - pn) + (e - w) * (pe - pw)) / (4.0 * phase)
    return l


def vmem_anisotropic_laplace(
    x: jnp.ndarray,
    dxx: float,
    dxy: float,
    dyy: float,
    phase: Optional[jnp.ndarray] = None,
    dmap: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Anisotropic tensor operator via shifts (value-identical to
    ops.stencil.anisotropic_laplace incl. the x2 normalization, the
    tensor phase-field correction, and the heterogeneous diffusion-map
    composition)."""
    n = _shift(x, -1, 0)
    s = _shift(x, 1, 0)
    w = _shift(x, 0, -1)
    e = _shift(x, 0, 1)
    nw = _shift(x, -1, -1)
    ne = _shift(x, -1, 1)
    sw = _shift(x, 1, -1)
    se = _shift(x, 1, 1)
    vxx = w - 2.0 * x + e
    vyy = n - 2.0 * x + s
    vxy = 0.25 * (se + nw - sw - ne)
    l = 2.0 * (dxx * vxx + 2.0 * dxy * vxy + dyy * vyy)
    if dmap is not None:
        l = dmap * l
        q = dmap * phase if phase is not None else dmap
        phi = phase if phase is not None else 1.0
        gx = e - w
        gy = s - n
        qx = _shift(q, 0, 1) - _shift(q, 0, -1)
        qy = _shift(q, 1, 0) - _shift(q, -1, 0)
        return l + (
            gx * (dxx * qx + dxy * qy) + gy * (dxy * qx + dyy * qy)
        ) / (4.0 * phi)
    if phase is not None:
        gx = e - w
        gy = s - n
        px = _shift(phase, 0, 1) - _shift(phase, 0, -1)
        py = _shift(phase, 1, 0) - _shift(phase, -1, 0)
        l = l + (
            gx * (dxx * px + dxy * py) + gy * (dxy * px + dyy * py)
        ) / (4.0 * phase)
    return l


def vmem_enforce_boundary(x: jnp.ndarray) -> jnp.ndarray:
    """SYMMETRIC interior rewrite via row/col replacement (value-identical
    to ops.stencil.enforce_boundary), scatter-free."""
    x = jnp.concatenate([x[1:2], x[1:-1], x[-2:-1]], axis=0)
    x = jnp.concatenate([x[:, 1:2], x[:, 1:-1], x[:, -2:-1]], axis=1)
    return x


def vmem_geometry(
    phase: Optional[jnp.ndarray] = None,
    fiber: Optional[tuple] = None,
    dmap: Optional[jnp.ndarray] = None,
) -> Geometry:
    """`fiber` = (dxx, dxy, dyy) from stencil.fiber_tensor selects the
    anisotropic operator; `dmap` is the per-pixel relative diffusion map
    (fibrosis), composable with both."""
    if fiber is not None:
        dxx, dxy, dyy = fiber
        return Geometry(
            laplace=lambda x: vmem_anisotropic_laplace(
                x, dxx, dxy, dyy, phase, dmap),
            enforce_boundary=vmem_enforce_boundary,
        )
    return Geometry(
        laplace=lambda x: vmem_laplace(x, phase, dmap),
        enforce_boundary=vmem_enforce_boundary,
    )


# -----------------------------------------------------------------------------
# The fused kernel
# -----------------------------------------------------------------------------

def padded_shape(h: int, w: int) -> Optional[tuple]:
    """(hp, wp) the whole-grid kernel pads an unaligned grid to — rows to
    the f32 sublane multiple (8), columns to the lane width (128) — or
    None when the grid is already aligned.  The reference's fast path was
    size-agnostic (fenton.py:126); this is how the kernel path matches it
    (VERDICT r2 #3)."""
    hp, wp = -(-h // 8) * 8, -(-w // 128) * 128
    return None if (hp, wp) == (h, w) else (hp, wp)


def plan_launch_groups(labels, per_launch: int):
    """Cut a substep-label list into contiguous launch groups of at most
    `per_launch` substeps: [(i0, i1, key), ...] where `key` is the label
    tuple identifying the group's traced body — equal keys <=> identical
    traces, so builders compile ONE kernel per distinct key (the skip
    models' nine n=0 substeps at per_launch=3 compile a single 3-substep
    body reused three times)."""
    if per_launch < 1:
        # guard the builder API too: SimConfig validates its own field,
        # but direct callers passing 0/negatives would loop forever below
        raise ValueError(f"per_launch must be >= 1 (got {per_launch})")
    groups = []
    i = 0
    while i < len(labels):
        j = min(i + per_launch, len(labels))
        groups.append((i, j, tuple(labels[i:j])))
        i = j
    return groups


def make_pallas_step(
    model: IonicModel,
    phase: Optional[np.ndarray] = None,
    interpret: Optional[bool] = None,
    n_outer: int = 1,
    fiber: Optional[tuple] = None,
    pad: bool = False,
    substeps_per_launch: Optional[int] = None,
    dmap: Optional[np.ndarray] = None,
):
    """Build `step(state) -> state`: `n_outer` outer steps (each
    dt_per_step substeps) as a single VMEM-resident Pallas kernel.

    `n_outer > 1` amortizes the kernel's HBM round trip over more
    compute.  Measured NEUTRAL on v5e (BR 512x512: 10.8 us/substep at
    K=1, 11.75 at K=2, 10.87 at K=4) — Mosaic already overlaps the
    plane DMAs with compute and the kernel is VPU-bound, so there is no
    traffic left to save (docs/OPTIMIZATIONS.md §8b).  Kept as a knob
    for configurations where the DMA/compute ratio differs (more
    planes, smaller grids, narrower-VPU generations).

    `pad=True` (required when the grid is not (8,128)-aligned) makes the
    returned step operate on PADDED planes of `padded_shape(h, w)`;
    REFLECT/SYMMETRIC rules apply at the TRUE edges via global-index
    masks (ops/pallas_tiled.block_geometry), so the pad region is never
    read by real cells — it evolves as garbage and the caller crops it
    away (the engine pads once per chunk, not per step).  Use
    `pad_state`/`crop_state` to convert.

    `substeps_per_launch=k` splits the outer step into ceil(K/k) smaller
    pallas_calls of at most k substeps each (model.substep_fns), with
    one kernel compiled per DISTINCT group body — the Mosaic
    compile-cliff knob (VERDICT r4 #4): Mosaic compile time grows
    superlinearly in traced-body size (docs/OPTIMIZATIONS.md §8d), so a
    model like tp06 (~2000 s for the 10-substep monolith) trades a few
    extra HBM round trips per outer step for a far smaller one-time
    compile.  Whole-grid correctness is unaffected: every launch sees
    the full grid with the same global REFLECT/SYMMETRIC rules, so the
    composition is value-identical to the monolith (tests/test_pallas)."""
    names = model.state_keys()
    n = len(names)
    h, w = model.cfg.height, model.cfg.width
    pshape = padded_shape(h, w) if pad else None
    kh, kw = pshape if pshape is not None else (h, w)
    has_phase = phase is not None
    if has_phase:
        phase_f32 = np.asarray(phase, np.float32)
        if pshape is not None:
            # pad value 1.0 keeps the (never-read-by-real-cells) pad
            # region's 1/(4*phase) finite
            phase_f32 = np.pad(
                phase_f32, ((0, kh - h), (0, kw - w)),
                mode="constant", constant_values=1.0,
            )
    else:
        phase_f32 = None
    has_dmap = dmap is not None
    if has_dmap:
        dmap_f32 = np.asarray(dmap, np.float32)
        if pshape is not None:
            dmap_f32 = np.pad(
                dmap_f32, ((0, kh - h), (0, kw - w)),
                mode="constant", constant_values=1.0,
            )
    else:
        dmap_f32 = None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def build_call(body):
        """One pallas_call whose kernel reads the state, builds the VMEM
        geometry, applies `body(state, geom) -> state`, writes back."""

        def kernel(*refs):
            from fib_tf_tpu.ops import integrators

            ins = refs[:n]
            i = n
            phase_arr = None
            if has_phase:
                phase_arr = refs[i][:]
                i += 1
            dmap_arr = None
            if has_dmap:
                dmap_arr = refs[i][:]
                i += 1
            outs = refs[i:]
            state = {k: r[:] for k, r in zip(names, ins)}
            if pshape is not None:
                from fib_tf_tpu.ops.pallas_tiled import block_geometry

                rg = jax.lax.broadcasted_iota(jnp.int32, (kh, 1), 0)
                cg = (jax.lax.broadcasted_iota(jnp.int32, (1, kw), 1)
                      if kw != w else None)
                geom = block_geometry(
                    rg, h, cg, w if kw != w else None, phase_arr, fiber,
                    dmap_ext=dmap_arr,
                )
            else:
                geom = vmem_geometry(phase_arr, fiber, dmap_arr)
            # swap in the Mosaic-safe expm1 for the duration of the trace
            integrators._IN_PALLAS_KERNEL = True
            try:
                state = body(state, geom)
            finally:
                integrators._IN_PALLAS_KERNEL = False
            for k, r in zip(names, outs):
                r[:] = state[k]

        plane = jax.ShapeDtypeStruct((kh, kw), jnp.float32)
        spec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)

        n_in = n + (1 if has_phase else 0) + (1 if has_dmap else 0)
        return pl.pallas_call(
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

    if (substeps_per_launch is not None
            and substeps_per_launch < model.dt_per_step):
        # launch-split path: one small kernel per DISTINCT group body;
        # labels are geometry-independent, so plan with a null geometry
        from fib_tf_tpu.models.base import cell_geometry

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
        seq = [calls[key] for _i0, _i1, key in groups] * n_outer
    else:
        # monolith: the whole outer step (x n_outer) in one launch.
        # kernel_step = plain unrolled substeps: an in-kernel fori_loop
        # over the identical substeps was measured SLOWER to
        # Mosaic-compile than the unroll (see IonicModel.kernel_step),
        # so the bodies stay unrolled
        def body(state, geom):
            for _ in range(n_outer):
                state = model.kernel_step(state, geom)
            return state

        seq = [build_call(body)]

    def step(state: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        args = [state[k] for k in names]
        extras = []
        if has_phase:
            extras.append(jnp.asarray(phase_f32))
        if has_dmap:
            extras.append(jnp.asarray(dmap_f32))
        for call in seq:
            args = list(call(*args, *extras))
        return dict(zip(names, args))

    return step


def pad_state(state: Dict[str, jnp.ndarray], h: int, w: int,
              hp: int, wp: int) -> Dict[str, jnp.ndarray]:
    """Edge-replicate a true-size state into the padded planes a
    `make_pallas_step(..., pad=True)` step expects (edge values keep the
    never-read pad region in physiological range)."""
    return {
        k: jnp.pad(v, ((0, hp - h), (0, wp - w)), mode="edge")
        for k, v in state.items()
    }


def crop_state(state: Dict[str, jnp.ndarray], h: int, w: int
               ) -> Dict[str, jnp.ndarray]:
    """Strip the pad region back off."""
    return {k: v[:h, :w] for k, v in state.items()}

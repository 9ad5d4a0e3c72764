"""The ten Tusscher-Panfilov 2006 human ventricular model ("TP06").

ten Tusscher KHWJ, Panfilov AV. "Alternans and spiral breakup in a
human ventricular tissue model." Am J Physiol Heart Circ Physiol.
2006;291:H1088-H1100 (the update of ten Tusscher-Noble-Noble-Panfilov
2004 with the refined calcium subsystem and restitution fits).

A zoo extension beyond the reference (which ships Fenton 4v,
Beeler-Reuter, and Courtemanche — SURVEY.md §2 components 2-7; this
model has no reference counterpart).  Nineteen planes: V (diffusing),
four ionic pools (Na_i, K_i, Ca_i + the SR and dyadic-subspace calcium
pools CaSR / CaSS), the ryanodine-release adaptation variable Rq
("R-bar" in the paper), and twelve Hodgkin-Huxley gates, all integrated
with the zoo's expm1+clip Rush-Larsen form (ops/integrators.rush_larsen,
reference ionic.py:115-123 parity form) — including Rq, whose ODE is
linear in Rq and therefore has the exact same update shape.

Why it's in the zoo:

  * it is the de-facto standard MODERN human ventricular model — the
    zoo's ventricular members were 1977 mammalian (Beeler-Reuter) and
    1991 guinea pig (Luo-Rudy); TP06 adds the human AP with a
    physiological calcium subsystem (SR release/uptake, dyadic
    subspace, three instantaneous buffers) and the published spiral
    -breakup/alternans dynamics;
  * the dyadic CaSS pool and the Ca-gated fCass gate exercise a
    coupling the rest of the zoo never has: a Rush-Larsen gate whose
    inf/tau depend on a CONCENTRATION, not V;
  * three cell-type variants (epi / endo / M) from one parameter set —
    the `cell_type` instance attribute (a trace-time constant, like
    LuoRudy91.g_si).

Model contract matches the rest of the zoo (models/base.py): pure
`solve`/`step` over injected Geometry, so 0D cell tests, 2D tissue
(phase fields, anisotropy), 3D volumes, ensembles, GSPMD/shard_map
sharding, and adaptive-dt all work unchanged.  Rates are evaluated
DIRECTLY (no Chebyshev variant) for the same measured reason as
Courtemanche and Luo-Rudy: transcendentals are cheap on the VPU and the
h/j branches fit polynomials poorly (docs/OPTIMIZATIONS.md §6).

`skip` (the reference's flagship Beeler-Reuter multi-rate technique,
br.py:96-107) advances the SLOW_GATES once per outer step at 10 dt =
0.2 ms; the Na-current gates m/h/j, the Ito/ICaL activation gates
r/d/xr2 (taus reach ~0.7-3 ms at the upstroke), and the Ca-coupled
fCass/Rq stay per-substep.  Accuracy measured in tests/test_tp06.py
(skip vs full 0D trace).

Constants are the TP06 paper's Table 1 / published CellML-C source
values at T = 310 K; the integration scheme (forward Euler on V and
the pools, Rush-Larsen on gates at dt = 0.02 ms) is the paper's own
("forward Euler ... Δt = 0.02 ms").
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from fib_tf_tpu.config import SimConfig
from fib_tf_tpu.models.base import Geometry, IonicModel, State
from fib_tf_tpu.ops.integrators import expm1, rush_larsen

# -- physical constants -------------------------------------------------------
R_GAS = 8314.472      # J / (kmol K)
TEMP = 310.0          # K
FARADAY = 96485.3415  # C / mol
RTF = R_GAS * TEMP / FARADAY      # 26.7138 mV
F_RT = 1.0 / RTF

# -- external / internal milieu ----------------------------------------------
K_O = 5.4     # mM
NA_O = 140.0
CA_O = 2.0
PK_NA = 0.03  # Na permeability of I_Ks

# -- cell geometry (volumes in the paper's units) -----------------------------
CM = 0.185        # membrane capacitance factor of the pool updates
V_C = 0.016404    # cytoplasm
V_SR = 0.001094   # sarcoplasmic reticulum
V_SS = 0.00005468  # dyadic subspace

# -- maximal conductances / fluxes --------------------------------------------
G_NA = 14.838
G_K1 = 5.405
G_KR = 0.153
G_CAL = 3.980e-5
G_B_NA = 0.00029
G_B_CA = 0.000592
G_P_CA = 0.1238
K_P_CA = 0.0005
G_P_K = 0.0146
P_NAK = 2.724
KM_K = 1.0
KM_NA = 40.0
K_NACA = 1000.0
GAMMA = 0.35
KM_NAI = 87.5
KM_CA = 1.38
K_SAT = 0.1
ALPHA_NACA = 2.5

# cell-type dependent: (G_to, G_Ks) — the s-gate tau/inf shape of 'endo'
# also differs (see gate_rates)
CELL_TYPES = {
    "epi": (0.294, 0.392),
    "endo": (0.073, 0.392),
    "m": (0.294, 0.098),
}

# -- calcium subsystem ---------------------------------------------------------
V_REL = 0.102     # mM/ms
K1_PRIME = 0.15
K2_PRIME = 0.045
K3_REL = 0.060
K4_REL = 0.005
MAX_SR = 2.5
MIN_SR = 1.0
EC_SR = 1.5
V_LEAK = 0.00036
V_XFER = 0.0038
VMAX_UP = 0.006375
K_UP = 0.00025
BUF_C, KBUF_C = 0.2, 0.001
BUF_SR, KBUF_SR = 10.0, 0.3
BUF_SS, KBUF_SS = 0.4, 0.00025

GATES_V = ("m", "h", "j", "d", "f", "f2", "r", "s", "xr1", "xr2", "xs")
# multi-rate split for cfg.skip: gates whose tau never drops below
# ~3 ms (xr1 >= ~3, xs >= ~80, f >= ~20, f2 >= ~30, s >= ~3 for epi/m,
# >= ~8 endo) advance once per outer step at 10 dt = 0.2 ms; m/h/j
# (sub-ms at the upstroke) and r/d/xr2 (~0.7-3 ms there) stay
# per-substep, as do the Ca-coupled fCass/Rq
FAST_GATES = ("m", "h", "j", "r", "d", "xr2")
SLOW_GATES = ("f", "f2", "s", "xr1", "xs")

# explicit-Euler stability/accuracy bound: the paper integrates at
# dt = 0.02 ms (~290 V/s upstrokes); past ~0.05 the V overshoot feeds
# exp(0.3485 V) in beta_h and the Na subsystem blows up, exactly like
# Luo-Rudy 1991
DT_MAX = 0.05


def gate_rates(v, xp=jnp, which=GATES_V, cell_type="epi", endo_w=None):
    """(inf, tau) pairs of the voltage gates (TP06 appendix forms).

    `xp` is jnp (traced path) or np (definition-time steady-state
    initialization).  h/j branch at V = -40 mV via where() with both
    branches evaluated — every sub-expression is finite in float32 over
    V in [-110, +70].  `which` lets the multi-rate step skip the slow
    -gate transcendentals on the substeps that freeze them; `cell_type`
    selects the endocardial s-gate shape.

    `endo_w` (per-pixel heterogeneity, VERDICT r4 #1a) is an optional
    [H, W] blend plane in [0, 1]: the s-gate inf/tau become the linear
    blend endo_w * endo-form + (1 - endo_w) * epi/M-form, so a
    transmural wedge carries the endocardial repolarization shape where
    the cell-type map says so (binary planes are exact per pixel;
    endo_w = 0/1 reproduce the uniform forms bitwise).  Overrides
    `cell_type` for the s gate only."""
    out = {}
    if "m" in which:
        m_inf = 1.0 / (1.0 + xp.exp((-56.86 - v) / 9.03)) ** 2
        a = 1.0 / (1.0 + xp.exp((-60.0 - v) / 5.0))
        b = (0.1 / (1.0 + xp.exp((v + 35.0) / 5.0))
             + 0.1 / (1.0 + xp.exp((v - 50.0) / 200.0)))
        out["m"] = (m_inf, a * b)

    if "h" in which or "j" in which:
        lo = v < -40.0
        hj_inf = 1.0 / (1.0 + xp.exp((v + 71.55) / 7.43)) ** 2
    if "h" in which:
        a_h = xp.where(lo, 0.057 * xp.exp(-(v + 80.0) / 6.8), 0.0)
        b_h = xp.where(
            lo,
            2.7 * xp.exp(0.079 * v) + 3.1e5 * xp.exp(0.3485 * v),
            0.77 / (0.13 * (1.0 + xp.exp(-(v + 10.66) / 11.1))),
        )
        out["h"] = (hj_inf, 1.0 / (a_h + b_h))
    if "j" in which:
        a_j = xp.where(
            lo,
            (-2.5428e4 * xp.exp(0.2444 * v)
             - 6.948e-6 * xp.exp(-0.04391 * v))
            * (v + 37.78) / (1.0 + xp.exp(0.311 * (v + 79.23))),
            0.0,
        )
        b_j = xp.where(
            lo,
            0.02424 * xp.exp(-0.01052 * v)
            / (1.0 + xp.exp(-0.1378 * (v + 40.14))),
            0.6 * xp.exp(0.057 * v) / (1.0 + xp.exp(-0.1 * (v + 32.0))),
        )
        out["j"] = (hj_inf, 1.0 / (a_j + b_j))

    if "xr1" in which:
        inf = 1.0 / (1.0 + xp.exp((-26.0 - v) / 7.0))
        a = 450.0 / (1.0 + xp.exp((-45.0 - v) / 10.0))
        b = 6.0 / (1.0 + xp.exp((v + 30.0) / 11.5))
        out["xr1"] = (inf, a * b)
    if "xr2" in which:
        inf = 1.0 / (1.0 + xp.exp((v + 88.0) / 24.0))
        a = 3.0 / (1.0 + xp.exp((-60.0 - v) / 20.0))
        b = 1.12 / (1.0 + xp.exp((v - 60.0) / 20.0))
        out["xr2"] = (inf, a * b)
    if "xs" in which:
        inf = 1.0 / (1.0 + xp.exp((-5.0 - v) / 14.0))
        a = 1400.0 / xp.sqrt(1.0 + xp.exp((5.0 - v) / 6.0))
        b = 1.0 / (1.0 + xp.exp((v - 35.0) / 15.0))
        out["xs"] = (inf, a * b + 80.0)

    if "r" in which:
        inf = 1.0 / (1.0 + xp.exp((20.0 - v) / 6.0))
        tau = 9.5 * xp.exp(-((v + 40.0) ** 2) / 1800.0) + 0.8
        out["r"] = (inf, tau)
    if "s" in which:
        want_endo = endo_w is not None or cell_type == "endo"
        want_other = endo_w is not None or cell_type != "endo"
        if want_endo:
            inf_e = 1.0 / (1.0 + xp.exp((v + 28.0) / 5.0))
            tau_e = 1000.0 * xp.exp(-((v + 67.0) ** 2) / 1000.0) + 8.0
        if want_other:
            inf_o = 1.0 / (1.0 + xp.exp((v + 20.0) / 5.0))
            tau_o = (85.0 * xp.exp(-((v + 45.0) ** 2) / 320.0)
                     + 5.0 / (1.0 + xp.exp((v - 20.0) / 5.0)) + 3.0)
        if endo_w is not None:
            out["s"] = (endo_w * inf_e + (1.0 - endo_w) * inf_o,
                        endo_w * tau_e + (1.0 - endo_w) * tau_o)
        elif cell_type == "endo":
            out["s"] = (inf_e, tau_e)
        else:
            out["s"] = (inf_o, tau_o)

    if "d" in which:
        inf = 1.0 / (1.0 + xp.exp((-8.0 - v) / 7.5))
        a = 1.4 / (1.0 + xp.exp((-35.0 - v) / 13.0)) + 0.25
        b = 1.4 / (1.0 + xp.exp((v + 5.0) / 5.0))
        g = 1.0 / (1.0 + xp.exp((50.0 - v) / 20.0))
        out["d"] = (inf, a * b + g)
    if "f" in which:
        inf = 1.0 / (1.0 + xp.exp((v + 20.0) / 7.0))
        tau = (1102.5 * xp.exp(-((v + 27.0) ** 2) / 225.0)
               + 200.0 / (1.0 + xp.exp((13.0 - v) / 10.0))
               + 180.0 / (1.0 + xp.exp((v + 30.0) / 10.0)) + 20.0)
        out["f"] = (inf, tau)
    if "f2" in which:
        inf = 0.67 / (1.0 + xp.exp((v + 35.0) / 7.0)) + 0.33
        tau = (562.0 * xp.exp(-((v + 27.0) ** 2) / 240.0)
               + 31.0 / (1.0 + xp.exp((25.0 - v) / 10.0))
               + 80.0 / (1.0 + xp.exp((v + 30.0) / 10.0)))
        out["f2"] = (inf, tau)
    return out


def fcass_rates(ca_ss, xp=jnp):
    """The Ca-gated ICaL inactivation gate: inf/tau depend on the dyadic
    subspace calcium, not V."""
    sq = (ca_ss / 0.05) ** 2
    return 0.6 / (1.0 + sq) + 0.4, 80.0 / (1.0 + sq) + 2.0


def k1_inf(v, e_k, xp=jnp):
    """Steady-state rectification of I_K1 (instantaneous gate)."""
    dv = v - e_k
    a = 0.1 / (1.0 + xp.exp(0.06 * (dv - 200.0)))
    b = (3.0 * xp.exp(0.0002 * (dv + 100.0)) + xp.exp(0.1 * (dv - 10.0))
         ) / (1.0 + xp.exp(-0.5 * dv))
    return a / (a + b)


def blended_s_rest(w, v_rest: float = -86.2):
    """Rest steady state of the transmurally blended s gate for an endo
    -weight plane `w` (any shape): endo pixels take the endo s_inf,
    others the epi/M shape — the s gate is the only type-switched GATE
    in TP06 (Table 1 of the 2006 paper), so it is the one plane whose
    rest value must re-blend wherever the wedge geometry is built."""
    endo_inf = float(gate_rates(np.float64(v_rest), xp=np,
                                cell_type="endo")["s"][0])
    other_inf = float(gate_rates(np.float64(v_rest), xp=np,
                                 cell_type="epi")["s"][0])
    return (w * endo_inf + (1.0 - w) * other_inf).astype(np.float32)


def transmural_planes(cfg: SimConfig):
    """Per-pixel (g_to, g_ks, endo) planes of the canonical transmural
    wedge: endo / M / epi bands along x at the `cfg.cell_type_bands`
    column fractions (endo at the paced left edge, epi at the right —
    the standard endo->epi activation sequence of a wedge preparation).
    Returns float32 [H, W] arrays for IonicModel.set_het."""
    b0, b1 = cfg.cell_type_bands
    x = np.arange(cfg.width, dtype=np.float32) / float(cfg.width)
    # 0 = endo, 1 = M, 2 = epi
    band = np.where(x < b0, 0, np.where(x < b1, 1, 2))
    g_to = np.choose(band, [CELL_TYPES["endo"][0], CELL_TYPES["m"][0],
                            CELL_TYPES["epi"][0]]).astype(np.float32)
    g_ks = np.choose(band, [CELL_TYPES["endo"][1], CELL_TYPES["m"][1],
                            CELL_TYPES["epi"][1]]).astype(np.float32)
    endo = (band == 0).astype(np.float32)
    full = np.ones((cfg.height, 1), np.float32)
    return full * g_to[None, :], full * g_ks[None, :], full * endo[None, :]


def transmural_volume_state(model, depth: int, s1: bool = True):
    """Depth-banded 3D wedge: `engine.volume.volume_state` with the
    endo / M / epi bands running along z (endo at slice 0, epi at slice
    depth-1 — the through-wall direction of a ventricular free wall)
    instead of x.  The model must be constructed with
    cell_type='transmural'; the x-banded `[H, W]` het planes it carries
    are replaced by z-banded `[D, H, W]` ones at the SAME
    `cfg.cell_type_bands` fractions, and the s gate's per-voxel rest
    steady state is re-blended to match.  Everything downstream is
    untouched: the planes ride the state dict, so run_volume's XLA path,
    GSPMD z-sharding, and the wide-halo shard_map path carry them like
    any other plane (the z-halo exchange delivers the ghost slices)."""
    from fib_tf_tpu.engine.volume import volume_state

    if "endo" not in model.het:
        raise ValueError(
            "transmural_volume_state needs cell_type='transmural' "
            "(the 2D constructor attaches the het planes it re-bands)"
        )
    vs = volume_state(model, depth, s1=s1)
    cfg = model.cfg
    b0, b1 = cfg.cell_type_bands
    z = np.arange(depth, dtype=np.float32) / float(depth)
    band = np.where(z < b0, 0, np.where(z < b1, 1, 2))
    g_to = np.choose(band, [CELL_TYPES["endo"][0], CELL_TYPES["m"][0],
                            CELL_TYPES["epi"][0]]).astype(np.float32)
    g_ks = np.choose(band, [CELL_TYPES["endo"][1], CELL_TYPES["m"][1],
                            CELL_TYPES["epi"][1]]).astype(np.float32)
    endo = (band == 0).astype(np.float32)
    full = np.ones((1, cfg.height, cfg.width), np.float32)
    pre = model.HET_PREFIX
    vs[pre + "g_to"] = g_to[:, None, None] * full
    vs[pre + "g_ks"] = g_ks[:, None, None] * full
    vs[pre + "endo"] = endo[:, None, None] * full
    # per-voxel rest steady state of the blended s gate (the extruded
    # plane carried the x-banded blend)
    vs["s"] = blended_s_rest(vs[pre + "endo"])
    return vs


class TenTusscher06(IonicModel):
    name = "tp06"
    min_v = -90.0
    max_v = 50.0
    depol = -86.2
    dt_per_step = 10
    pot_key = "V"
    default_dt = 0.02
    # 'epi' (default) | 'endo' | 'm' — a trace-time constant like
    # LuoRudy91.g_si: selects (G_to, G_Ks) and the endo s-gate shape.
    # SimConfig.cell_type sets it per-run; 'transmural' instead attaches
    # per-pixel g_to/g_ks/endo planes (HET_PARAMS below) for the banded
    # wedge.
    cell_type = "epi"
    # per-pixel heterogeneity (VERDICT r4 #1a): g_to / g_ks conductance
    # planes (ABSOLUTE values) and the endo s-gate blend plane, riding
    # the state dict as _p_* planes (models/base.set_het); g_kr is a
    # RELATIVE IKr dose-factor plane (1.0 = baseline) for spatially
    # heterogeneous pharmacology (border zones, washout gradients)
    HET_PARAMS = ("g_to", "g_ks", "endo", "g_kr")
    # channel-block (drug) interface (models/base.set_scale /
    # SimConfig.g_scale): the CiPA-style panel — every sarcolemmal
    # current's maximal conductance/flux is scalable as a trace-time
    # constant.  g_to/g_Ks compose multiplicatively with the transmural
    # het planes (substrate x dose).
    SCALE_PARAMS = ("g_Na", "g_CaL", "g_Kr", "g_Ks", "g_to", "g_K1",
                    "g_NaK", "g_NaCa", "g_pCa", "g_pK", "g_bNa", "g_bCa")
    # concentrations feed Nernst logs / squared ratios — the adaptive-dt
    # acceptance keeps them strictly positive (ops/adaptive.py)
    positive_states = ("Cai", "CaSR", "CaSS", "Nai", "Ki")

    def __init__(self, cfg: SimConfig):
        super().__init__(cfg)
        if cfg.dt > DT_MAX and cfg.adaptive_dv is None:
            raise ValueError(
                f"TenTusscher06 is explicit-Euler unstable at dt={cfg.dt} "
                f"(the paper integrates at 0.02 ms); use dt <= {DT_MAX} "
                "(0.02 recommended) or enable adaptive_dv step-doubling"
            )
        if cfg.cell_type == "transmural":
            g_to, g_ks, endo = transmural_planes(cfg)
            self.set_het(g_to=g_to, g_ks=g_ks, endo=endo)
        else:
            self.cell_type = cfg.cell_type

    # -- state ------------------------------------------------------------------

    def state_keys(self):
        return tuple(sorted(
            ("CaSR", "CaSS", "Cai", "Ki", "Nai", "Rq", "V", "d", "f",
             "f2", "fcass", "h", "j", "m", "r", "s", "xr1", "xr2",
             "xs") + self.het_keys()
        ))

    def initial_state(self, s1: bool = True) -> Dict[str, np.ndarray]:
        """Rest at the paper's initial conditions (V = -86.2 mV,
        [Ca]i = [Ca]ss = 7e-5, [Ca]SR = 1.3, [Na]i = 7.67,
        [K]i = 138.3 mM, Rq = 1), voltage gates at their V-rest steady
        states and fcass at its CaSS-rest steady state (computed from
        the rate functions, so they stay consistent with any rate
        edit).  S1 is the zoo's 1-column suprathreshold stripe
        (reference br.py:81-82 pattern)."""
        v_rest = -86.2
        v = self._full(v_rest)
        if s1:
            v[:, 1] = 20.0
        st = {
            "V": v,
            "Cai": self._full(7e-5),
            "CaSS": self._full(7e-5),
            "CaSR": self._full(1.3),
            "Nai": self._full(7.67),
            "Ki": self._full(138.3),
            "Rq": self._full(1.0),
        }
        rates = gate_rates(np.float64(v_rest), xp=np,
                           cell_type=self.cell_type)
        for g, (inf, _tau) in rates.items():
            st[g] = self._full(float(inf))
        if "endo" in self.het:
            # per-pixel rest steady state of the blended s gate (the
            # non-endo shape equals the epi/M one the base fill used —
            # self.cell_type stays 'epi' when the het planes are attached)
            st["s"] = blended_s_rest(self.het["endo"], v_rest)
        fc_inf, _ = fcass_rates(np.float64(7e-5), xp=np)
        st["fcass"] = self._full(float(fc_inf))
        return self.attach_het(st)

    # -- dynamics ---------------------------------------------------------------

    def currents(self, v0, s):
        """The twelve membrane currents (TP06 appendix).  Gates and pools
        are the PRE-update planes (the zoo's Beeler-Reuter ordering
        convention, br.py:160-168).  g_to / g_Ks come from the per-pixel
        heterogeneity planes when attached (transmural wedges,
        models/base.set_het), else the uniform cell-type constants."""
        g_to, g_ks = CELL_TYPES[self.cell_type]
        g_to = self.gscale("g_to", self.het_param(s, "g_to", g_to))
        g_ks = self.gscale("g_Ks", self.het_param(s, "g_ks", g_ks))
        cai, ca_ss = s["Cai"], s["CaSS"]
        nai, ki = s["Nai"], s["Ki"]

        e_na = RTF * jnp.log(NA_O / nai)
        e_k = RTF * jnp.log(K_O / ki)
        e_ks = RTF * jnp.log((K_O + PK_NA * NA_O) / (ki + PK_NA * nai))
        e_ca = 0.5 * RTF * jnp.log(CA_O / cai)

        i_na = (self.gscale("g_Na", G_NA)
                * s["m"] ** 3 * s["h"] * s["j"] * (v0 - e_na))
        i_b_na = self.gscale("g_bNa", G_B_NA) * (v0 - e_na)

        # L-type Ca current: GHK-like driving term with the removable
        # singularity at V = 15 mV handled by its exact limit
        x = 2.0 * (v0 - 15.0) * F_RT
        num = 0.25 * ca_ss * jnp.exp(x) - CA_O
        # integrators.expm1, not jnp.expm1: Mosaic has no expm1 lowering,
        # so inside Pallas kernels this becomes the value-equivalent
        # Taylor/exp-1 branch-free form (ops/integrators.py)
        drive = jnp.where(
            jnp.abs(x) < 1e-4,
            # lim (V-15)·num/(e^x - 1) = (RT/2F)·(0.25 CaSS - Ca_o)
            0.5 * RTF * (0.25 * ca_ss - CA_O),
            (v0 - 15.0) * num / expm1(x),
        )
        i_cal = (self.gscale("g_CaL", G_CAL)
                 * s["d"] * s["f"] * s["f2"] * s["fcass"]
                 * 4.0 * FARADAY * F_RT * drive)
        i_b_ca = self.gscale("g_bCa", G_B_CA) * (v0 - e_ca)

        i_to = g_to * s["r"] * s["s"] * (v0 - e_k)
        g_kr = self.gscale("g_Kr", G_KR * float(np.sqrt(K_O / 5.4)))
        # per-pixel IKr dose map (set_het(g_kr=...), a RELATIVE factor
        # unlike the absolute g_to/g_ks planes): regional drug washout /
        # border-zone substrates; composes with the global g_Kr dose
        kr_dose = self.het_param(s, "g_kr", None)
        if kr_dose is not None:
            g_kr = kr_dose * g_kr
        i_kr = g_kr * s["xr1"] * s["xr2"] * (v0 - e_k)
        i_ks = g_ks * s["xs"] ** 2 * (v0 - e_ks)
        i_k1 = (self.gscale("g_K1", G_K1 * float(np.sqrt(K_O / 5.4)))
                * k1_inf(v0, e_k) * (v0 - e_k))

        evf = jnp.exp(GAMMA * v0 * F_RT)
        evf1 = jnp.exp((GAMMA - 1.0) * v0 * F_RT)
        i_naca = (
            self.gscale("g_NaCa", K_NACA)
            * (evf * nai ** 3 * CA_O - evf1 * NA_O ** 3 * cai * ALPHA_NACA)
            / ((KM_NAI ** 3 + NA_O ** 3) * (KM_CA + CA_O)
               * (1.0 + K_SAT * evf1))
        )
        i_nak = (
            self.gscale("g_NaK", P_NAK) * K_O * nai
            / ((K_O + KM_K) * (nai + KM_NA)
               * (1.0 + 0.1245 * jnp.exp(-0.1 * v0 * F_RT)
                  + 0.0353 * jnp.exp(-v0 * F_RT)))
        )
        i_p_ca = self.gscale("g_pCa", G_P_CA) * cai / (K_P_CA + cai)
        i_p_k = (self.gscale("g_pK", G_P_K)
                 * (v0 - e_k) / (1.0 + jnp.exp((25.0 - v0) / 5.98)))

        return {
            "i_na": i_na, "i_b_na": i_b_na, "i_cal": i_cal,
            "i_b_ca": i_b_ca, "i_to": i_to, "i_kr": i_kr, "i_ks": i_ks,
            "i_k1": i_k1, "i_naca": i_naca, "i_nak": i_nak,
            "i_p_ca": i_p_ca, "i_p_k": i_p_k,
        }

    def solve(self, state: State, geom: Geometry, n: int = 1) -> State:
        """One substep: Rush-Larsen on the 12 gates + Rq, explicit Euler
        on V (reaction + diffusion) and on the four ionic pools with the
        paper's instantaneous-buffer scaling.

        `n` is how many dt the SLOW_GATES advance (0 = frozen — the
        multi-rate trick, reference br.py:125-173 form); everything else
        always advances one dt."""
        dt = self.cfg.dt
        v0 = geom.enforce_boundary(state["V"])
        cai, ca_sr, ca_ss = state["Cai"], state["CaSR"], state["CaSS"]
        endo_w = state.get(self.HET_PREFIX + "endo")

        out = {}
        for g, (inf, tau) in gate_rates(
            v0, which=FAST_GATES, cell_type=self.cell_type
        ).items():
            out[g] = rush_larsen(state[g], inf, tau, dt)
        if n > 0:
            for g, (inf, tau) in gate_rates(
                v0, which=SLOW_GATES, cell_type=self.cell_type,
                endo_w=endo_w,
            ).items():
                out[g] = rush_larsen(state[g], inf, tau, dt * n)
        else:
            for g in SLOW_GATES:
                out[g] = state[g]
        fc_inf, fc_tau = fcass_rates(ca_ss)
        out["fcass"] = rush_larsen(state["fcass"], fc_inf, fc_tau, dt)

        cur = self.currents(v0, state)
        i_sum = sum(cur.values())

        # SR release with CaSR-gated rates; dRq/dt = -k2 CaSS Rq
        # + k4 (1 - Rq) is linear in Rq -> the exact Rush-Larsen update
        kcasr = MAX_SR - (MAX_SR - MIN_SR) / (1.0 + (EC_SR / ca_sr) ** 2)
        k1 = K1_PRIME / kcasr
        k2 = K2_PRIME * kcasr
        rq_tau = 1.0 / (k2 * ca_ss + K4_REL)
        out["Rq"] = rush_larsen(state["Rq"], K4_REL * rq_tau, rq_tau, dt)
        o_gate = k1 * ca_ss ** 2 * state["Rq"] / (
            K3_REL + k1 * ca_ss ** 2
        )
        i_rel = V_REL * o_gate * (ca_sr - ca_ss)
        i_leak = V_LEAK * (ca_sr - cai)
        i_up = VMAX_UP / (1.0 + (K_UP / cai) ** 2)
        i_xfer = V_XFER * (ca_ss - cai)

        buf_c = 1.0 / (1.0 + BUF_C * KBUF_C / (cai + KBUF_C) ** 2)
        buf_sr = 1.0 / (1.0 + BUF_SR * KBUF_SR / (ca_sr + KBUF_SR) ** 2)
        buf_ss = 1.0 / (1.0 + BUF_SS * KBUF_SS / (ca_ss + KBUF_SS) ** 2)

        cm_2vcf = CM / (2.0 * V_C * FARADAY)
        out["Cai"] = cai + dt * buf_c * (
            (i_leak - i_up) * V_SR / V_C + i_xfer
            - (cur["i_b_ca"] + cur["i_p_ca"] - 2.0 * cur["i_naca"])
            * cm_2vcf
        )
        out["CaSR"] = ca_sr + dt * buf_sr * (i_up - i_rel - i_leak)
        out["CaSS"] = ca_ss + dt * buf_ss * (
            -cur["i_cal"] * CM / (2.0 * V_SS * FARADAY)
            + i_rel * V_SR / V_SS - i_xfer * V_C / V_SS
        )
        out["Nai"] = state["Nai"] + dt * (
            -(cur["i_na"] + cur["i_b_na"]
              + 3.0 * cur["i_nak"] + 3.0 * cur["i_naca"])
            * CM / (V_C * FARADAY)
        )
        out["Ki"] = state["Ki"] + dt * (
            -(cur["i_k1"] + cur["i_to"] + cur["i_kr"] + cur["i_ks"]
              + cur["i_p_k"] - 2.0 * cur["i_nak"])
            * CM / (V_C * FARADAY)
        )

        out["V"] = v0 + self.cfg.diff * dt * geom.laplace(v0) - dt * i_sum
        return self.carry_het(state, out)

    @property
    def has_uniform_substeps(self) -> bool:
        """Without `skip` the 10 substeps are identical solve(n=1) calls;
        the skip schedule (one n=10 + nine n=0) is not splittable at
        arbitrary boundaries."""
        return not self.cfg.skip and self.cfg.adaptive_dv is None

    def substep_fns(self, geom: Geometry):
        """Launch-split schedule (models/base.substep_fns contract):
        without skip, ten identical n=1 bodies — the case where
        substeps_per_launch pays most (one small kernel compiled instead
        of the ~2000 s whole-step Mosaic monolith); with skip, the n=10
        slow advance leads and the nine n=0 bodies share one kernel."""
        self._check_splittable()
        k = self.dt_per_step
        if not self.cfg.skip:
            fn = lambda s: self.solve(s, geom, n=1)
            return [fn] * k, ("n1",) * k
        first = lambda s: self.solve(s, geom, n=k)
        rest = lambda s: self.solve(s, geom, n=0)
        return [first] + [rest] * (k - 1), ("n10",) + ("n0",) * (k - 1)

    def step(self, state: State, geom: Geometry,
             unroll: bool = True) -> State:
        """One outer step = 10 substeps; with `skip`, the first substep
        advances the slow f/f2/s/xr1/xs gates 10 dt and the rest freeze
        them (the reference's BR multi-rate schedule, br.py:96-107)."""
        from fib_tf_tpu.models.base import repeat_substeps

        k = self.dt_per_step
        if self.cfg.adaptive_dv is not None:
            def sub(n):
                return self.adaptive_substep(
                    geom, lambda m, s: m.solve(s, geom, n=n)
                )

            if self.cfg.skip:
                state = sub(k)(state)
                return repeat_substeps(sub(0), state, k - 1, unroll)
            return repeat_substeps(sub(1), state, k, unroll)
        if self.cfg.skip:
            state = self.solve(state, geom, n=k)
            return repeat_substeps(
                lambda s: self.solve(s, geom, n=0), state, k - 1, unroll
            )
        return repeat_substeps(
            lambda s: self.solve(s, geom, n=1), state, k, unroll
        )

"""GfsRiver: Saint-Venant (shallow-water) solver, single layer.

TPU-native rebuild of the reference's GfsRiver simulation class
(reference: src/river.c — riemann_kinetic:325-365, riemann_hllc:268-303,
face_fluxes:385-516, cell_gradients:821-845, advance:758-799,
river_run:903-982, minimum_cfl:1000-1021; scheme of Audusse et al. 2004/
2011 with hydrostatic reconstruction, kinetic fluxes and MUSCL-Hancock
two-stage time stepping).

State is a dict of dense (nx, ny) arrays: ``P`` fluid depth h, ``U``/``V``
depth-integrated fluxes hu/hv, ``Zb`` bed elevation.  The step is one
fused jittable function — slopes, two flux passes (predictor/corrector)
and the implicit Coriolis/drag update all stay on device; wetting/drying
is handled with `jnp.where` masks instead of the reference's per-cell
branches.

Well-balanced property: the interface reconstruction of Audusse (zb+eta
reconstructed rather than zb, face depth h* = max(0, eta + zb - max(zbL,
zbR)), slope sources Sb) keeps a lake at rest exactly still, including
around wet/dry transitions — gated in tests/test_river.py.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

SQRT3 = 1.7320508075688772

# generic_limiter beta values (reference: src/river.c:64-85)
LIMITER_BETA = {"minmod": 1.0, "sweby": 1.5, "superbee": 2.0}


@dataclasses.dataclass(frozen=True)
class RiverConfig:
    """Static solver parameters (jit static arg).

    Mirrors GfsRiver's defaults (reference: river_init src/river.c:1303):
    minmod gradient, cfl 0.5, kinetic scheme, dry 1e-6, 2nd-order time.
    ``bcs``: per axis (lo, hi) of 'symmetry' | 'outflow' | 'periodic' |
    ("subcritical", hb) — imposed-depth open boundary (GfsBcSubcritical).
    ``coriolis``: (f, drag, beta) — Crank-Nicolson split as in
    gfs_source_coriolis_implicit (src/source.c:1902-1925, beta=0.5)."""
    shape: tuple
    L: float = 1.0
    g: float = 1.0
    dry: float = 1e-6
    cfl: float = 0.5
    time_order: int = 2
    limiter: str = "minmod"
    scheme: str = "kinetic"           # "kinetic" | "hllc"
    bcs: tuple = (("symmetry", "symmetry"), ("symmetry", "symmetry"))
    coriolis: tuple = None            # (f, drag, beta)
    tracers: tuple = ()               # names of h-weighted tracer fields

    @property
    def dx(self):
        return self.L / self.shape[0]


def _pad1(v, cfg: RiverConfig, axis: int, odd: bool = False,
          width: int = 1, h=None):
    """``width`` ghost cells on each side along ``axis``.

    symmetry: true mirror of the ``width`` interior cells (odd=True
    flips sign — wall-normal momentum; the second ghost mirrors cell 1,
    NOT the first ghost: reconstruction antisymmetry at walls — and with
    it exact wall-flux cancellation/mass conservation — depends on it);
    outflow: edge replicate; periodic: wrap;
    ("subcritical", hb): open boundary with imposed depth hb — the
    wall-normal discharge ghost comes from the outgoing Riemann
    invariant, q_g = q_i -/+ 2 h_i (sqrt(g h_i) - sqrt(g hb)) (lo/hi
    side; reference: GfsBcSubcritical src/river.c:1495-1504), every
    other field replicates.  ``h`` = the depth array for that formula
    (pass it when padding the wall-normal momentum).
    Reference: the default GfsBoundary symmetry BCs (src/boundary.c) that
    river_run relies on, incl. the gradient evaluation in boundary cells
    (domain_traverse_all_leaves, src/river.c:859-874)."""
    lo, hi = cfg.bcs[axis]

    def take(a, sl):
        idx = [slice(None)] * a.ndim
        idx[axis] = sl
        return a[tuple(idx)]

    def ghost(kind, first):
        hb = None
        if isinstance(kind, tuple):
            kind, hb = kind
        if kind == "periodic":
            return take(v, slice(-width, None)) if first \
                else take(v, slice(0, width))
        if kind == "symmetry":
            g = take(v, slice(0, width)) if first \
                else take(v, slice(v.shape[axis] - width, None))
            g = jnp.flip(g, axis)
            return -g if odd else g
        if kind in ("outflow", "subcritical"):
            edge = take(v, slice(0, 1)) if first else take(v, slice(-1, None))
            if kind == "subcritical" and odd and h is not None:
                hi_ = take(h, slice(0, 1)) if first \
                    else take(h, slice(-1, None))
                s = -1.0 if first else 1.0
                edge = edge + s * 2.0 * hi_ * (
                    jnp.sqrt(cfg.g * hi_)
                    - jnp.sqrt(cfg.g * max(float(hb), 0.0)))
            reps = [1] * v.ndim
            reps[axis] = width
            return jnp.tile(edge, reps)
        raise ValueError(kind)

    return jnp.concatenate([ghost(lo, True), v, ghost(hi, False)], axis)


def _limited_halfslope(v3, cfg: RiverConfig, axis: int):
    """Half-slope dv/2 per cell of a twice-ghosted array (output shrinks
    by 2 along ``axis``): generic_limiter((v2-v0)/(v0-v1)) * (v0-v1) / 2.
    Reference: center_limited_gradient_full src/river.c:86-115 and
    cell_gradients' /2 (src/river.c:843)."""
    n = v3.shape[axis]

    def take(s0, s1):
        idx = [slice(None)] * v3.ndim
        idx[axis] = slice(s0, n + s1)
        return v3[tuple(idx)]

    v0, vm, vp = take(1, -1), take(0, -2), take(2, 0)
    s0 = v0 - vm
    s1 = vp - v0
    beta = LIMITER_BETA[cfg.limiter]
    r = s1 / jnp.where(s0 == 0.0, 1.0, s0)
    phi = jnp.maximum(jnp.maximum(0.0, jnp.minimum(r, beta)),
                      jnp.minimum(beta * r, 1.0))
    return jnp.where(s0 == 0.0, 0.0, 0.5 * phi * s0)


def _slopes(state: dict, cfg: RiverConfig):
    """Limited half-slopes of (P, U, V, tracers) and the hydrostatically
    reconstructed bed slope dZb = grad(Zb+P)/2 - dP (Audusse 2004 thm 3.1;
    reference: cell_gradients src/river.c:821-845).  Dry cells get zero
    slopes.  Output per axis: dict of arrays on the 1-ghost layout along
    that axis (slopes are needed in boundary ghost cells too)."""
    out = []
    names = ("P", "U", "V") + cfg.tracers
    odd = {"U": 0, "V": 1}
    for axis in range(2):
        d = {}
        P2 = _pad1(state["P"], cfg, axis, width=2)
        wet1 = _pad1(state["P"], cfg, axis) > cfg.dry
        for nm in names:
            v2 = _pad1(state[nm], cfg, axis,
                       odd=odd.get(nm) == axis, width=2, h=state["P"])
            d[nm] = jnp.where(wet1, _limited_halfslope(v2, cfg, axis), 0.0)
        H2 = _pad1(state["Zb"] + state["P"], cfg, axis, width=2)
        d["Zb"] = jnp.where(wet1,
                            _limited_halfslope(H2, cfg, axis) - d["P"], 0.0)
        out.append(d)
    return out


def _riemann_kinetic(hL, uL, vL, hR, uR, vR, g):
    """Kinetic flux of Audusse & Bristeau (2005), single layer.
    Reference: riemann_kinetic src/river.c:325-365 (dz=1)."""
    cL = jnp.sqrt(g * hL / 2.0)
    Mp = jnp.maximum(uL + cL * SQRT3, 0.0)
    Mm = jnp.maximum(uL - cL * SQRT3, 0.0)
    cig = cL / (6.0 * g * SQRT3)
    fH = cig * 3.0 * (Mp * Mp - Mm * Mm)
    fU = cig * 2.0 * (Mp ** 3 - Mm ** 3)
    cR = jnp.sqrt(g * hR / 2.0)
    Mp = jnp.minimum(uR + cR * SQRT3, 0.0)
    Mm = jnp.minimum(uR - cR * SQRT3, 0.0)
    cig = cR / (6.0 * g * SQRT3)
    fH = fH + cig * 3.0 * (Mp * Mp - Mm * Mm)
    fU = fU + cig * 2.0 * (Mp ** 3 - Mm ** 3)
    fV = jnp.where(fH > 0.0, vL, vR) * fH
    return fH, fU, fV


def _riemann_hllc(hL, uL, vL, hR, uR, vR, g):
    """HLLC approximate Riemann solver (Liang et al. 2004).
    Reference: riemann_hllc src/river.c:268-303 — vectorized with masks
    instead of branches; dry sides use the 2c wave-speed estimates."""
    cL = jnp.sqrt(g * hL)
    cR = jnp.sqrt(g * hR)
    ustar = 0.5 * (uL + uR) + cL - cR
    cstar = 0.5 * (cL + cR) + 0.25 * (uL - uR)
    SL = jnp.where(hL == 0.0, uR - 2.0 * cR,
                   jnp.minimum(uL - cL, ustar - cstar))
    SR = jnp.where(hR == 0.0, uL + 2.0 * cL,
                   jnp.maximum(uR + cR, ustar + cstar))

    fHL, fUL = hL * uL, hL * (uL * uL + g * hL / 2.0)
    fHR, fUR = hR * uR, hR * (uR * uR + g * hR / 2.0)
    dSnz = jnp.where(SR == SL, 1.0, SR - SL)
    fH_m = (SR * fHL - SL * fHR + SL * SR * (hR - hL)) / dSnz
    fU_m = (SR * fUL - SL * fUR + SL * SR * (hR * uR - hL * uL)) / dSnz
    fH = jnp.where(SL >= 0.0, fHL, jnp.where(SR <= 0.0, fHR, fH_m))
    fU = jnp.where(SL >= 0.0, fUL, jnp.where(SR <= 0.0, fUR, fU_m))
    fV = jnp.where(fH > 0.0, vL, vR) * fH
    return fH, fU, fV


_RIEMANN = {"kinetic": _riemann_kinetic, "hllc": _riemann_hllc}


def _advance(base: dict, recon: dict, slopes, dt, cfg: RiverConfig):
    """One Euler stage: fluxes from the ``recon`` states with the (fixed)
    ``slopes``, update applied to ``base`` (reference: advance
    src/river.c:758-799 with v1=recon, v=base via gfs_variables_swap)."""
    g, dry, dx = cfg.g, cfg.dry, cfg.dx
    riemann = _RIEMANN[cfg.scheme]
    dP = jnp.zeros_like(base["P"])
    dU = jnp.zeros_like(base["P"])
    dV = jnp.zeros_like(base["P"])
    dT = {nm: jnp.zeros_like(base["P"]) for nm in cfg.tracers}
    umax = cfg.cfl * dx / dt

    for axis in range(2):
        nrm, tan = ("U", "V") if axis == 0 else ("V", "U")
        sl = slopes[axis]

        def faces(arr1):
            """(left cell, right cell) of each of the n+1 faces from a
            1-ghost padded array."""
            n = arr1.shape[axis]
            lo = [slice(None)] * arr1.ndim
            lo[axis] = slice(0, n - 1)
            hi = [slice(None)] * arr1.ndim
            hi[axis] = slice(1, n)
            return arr1[tuple(lo)], arr1[tuple(hi)]

        P1 = _pad1(recon["P"], cfg, axis)
        Zb1 = _pad1(recon["Zb"], cfg, axis)
        N1 = _pad1(recon[nrm], cfg, axis, odd=True, h=recon["P"])
        T1 = _pad1(recon[tan], cfg, axis)

        PL, PR = faces(P1)
        ZbL0, ZbR0 = faces(Zb1)
        NL, NR = faces(N1)
        TL, TR = faces(T1)
        dPL, dPR = faces(sl["P"])
        dZL, dZR = faces(sl["Zb"])
        dNL, dNR = faces(sl[nrm])
        dTL, dTR = faces(sl[tan])

        etaL = jnp.where(PL <= dry, 0.0, PL + dPL)
        etaR = jnp.where(PR <= dry, 0.0, PR - dPR)
        zbL = ZbL0 + dZL
        zbR = ZbR0 - dZR
        zbF = jnp.maximum(zbL, zbR)
        wetL = etaL > dry
        wetR = etaR > dry
        safeL = jnp.where(wetL, etaL, 1.0)
        safeR = jnp.where(wetR, etaR, 1.0)
        clamp = lambda u: jnp.clip(u, -umax, umax)
        uL = jnp.where(wetL, clamp((NL + dNL) / safeL), 0.0)
        vL = jnp.where(wetL, clamp((TL + dTL) / safeL), 0.0)
        uR = jnp.where(wetR, clamp((NR - dNR) / safeR), 0.0)
        vR = jnp.where(wetR, clamp((TR - dTR) / safeR), 0.0)
        hL = jnp.maximum(0.0, etaL + zbL - zbF)
        hR = jnp.maximum(0.0, etaR + zbR - zbF)

        fH, fU, fV = riemann(hL, uL, vL, hR, uR, vR, g)
        # both sides dry: no flux (face_fluxes early return, river.c:391)
        both_dry = (PL <= dry) & (PR <= dry)
        fH = jnp.where(both_dry, 0.0, fH)
        fU = jnp.where(both_dry, 0.0, fU)
        fV = jnp.where(both_dry, 0.0, fV)

        # topographic source terms (Audusse 2005 / An 2012 eq. 11-12;
        # reference: src/river.c:489-493): SbL applies to the left cell's
        # update at this face, SbR to the right cell's.
        eta0L = jnp.where(PL <= dry, 0.0, PL)
        eta0R = jnp.where(PR <= dry, 0.0, PR)
        SbL = g / 2.0 * (hL * hL - etaL * etaL
                         - (etaL + eta0L) * (zbL - ZbL0))
        SbR = g / 2.0 * (hR * hR - etaR * etaR
                         - (etaR + eta0R) * (zbR - ZbR0))
        SbL = jnp.where(both_dry, 0.0, SbL)
        SbR = jnp.where(both_dry, 0.0, SbR)

        def diff(right_faces, left_faces):
            """cell update -(dt/dx)(outgoing right - incoming left)."""
            n = right_faces.shape[axis]
            r = [slice(None)] * right_faces.ndim
            r[axis] = slice(1, n)
            l = [slice(None)] * right_faces.ndim
            l[axis] = slice(0, n - 1)
            return -(dt / dx) * (right_faces[tuple(r)]
                                 - left_faces[tuple(l)])

        dP = dP + diff(fH, fH)
        dNrm = diff(fU - SbL, fU - SbR)
        dTan = diff(fV, fV)
        if axis == 0:
            dU = dU + dNrm
            dV = dV + dTan
        else:
            dV = dV + dNrm
            dU = dU + dTan
        for nm in cfg.tracers:
            Tq1 = _pad1(recon[nm], cfg, axis)
            TqL, TqR = faces(Tq1)
            dTqL, dTqR = faces(sl[nm])
            cl = jnp.where(wetL, (TqL + dTqL) / safeL, 0.0)
            cr = jnp.where(wetR, (TqR - dTqR) / safeR, 0.0)
            fT = jnp.where(fH > 0.0, cl, cr) * fH
            dT[nm] = dT[nm] + diff(fT, fT)

    out = dict(base)
    out["P"] = jnp.maximum(base["P"] + dP, 0.0)
    out["U"] = base["U"] + dU
    out["V"] = base["V"] + dV
    for nm in cfg.tracers:
        out[nm] = base[nm] + dT[nm]

    if cfg.coriolis is not None:
        # Crank-Nicolson Coriolis/linear-drag on the momentum variables
        # (reference: src/source.c:1785-1795 explicit part +
        # implicit_coriolis_2D:1902-1925)
        f, e, beta = cfg.coriolis
        U0, V0 = out["U"], out["V"]
        U = U0 + dt * (1.0 - beta) * (f * V0 - e * U0)
        V = V0 + dt * (1.0 - beta) * (-e * V0 - f * U0)
        bdt = beta * dt
        det = (1.0 + e * bdt) ** 2 + (f * bdt) ** 2
        out["U"] = ((1.0 + e * bdt) * U + f * bdt * V) / det
        out["V"] = (-f * bdt * U + (1.0 + e * bdt) * V) / det
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def river_step(state: dict, dt, cfg: RiverConfig) -> dict:
    """One MUSCL-Hancock step: slopes once, predictor at dt/2 (states
    advanced, slopes frozen), corrector at dt from the half-step states
    (reference: river_run's predictor/corrector swaps,
    src/river.c:945-960)."""
    slopes = _slopes(state, cfg)
    if cfg.time_order == 2:
        half = _advance(state, state, slopes, dt / 2.0, cfg)
        return _advance(state, half, slopes, dt, cfg)
    return _advance(state, state, slopes, dt, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def timescale(state: dict, cfg: RiverConfig):
    """max dt/cfl: min over wet cells and components of dx/(|u| + c)
    (reference: minimum_cfl src/river.c:1000-1021)."""
    P = state["P"]
    wet = P > cfg.dry
    safe = jnp.where(wet, P, 1.0)
    c = jnp.sqrt(cfg.g * jnp.maximum(P, 0.0))
    big = jnp.asarray(jnp.finfo(P.dtype).max, P.dtype)
    ts = big
    for nm in ("U", "V"):
        u = jnp.abs(state[nm]) / safe
        ts = jnp.minimum(ts, jnp.min(
            jnp.where(wet, cfg.dx / (u + c + 1e-30), big)))
    return ts


class RiverSimulation:
    """Simulation-style driver for GfsRiver runs: CFL-limited stepping
    with the shared Event machinery (events fire as ev.fire(sim, t, i)
    and read sim.state / sim.time like the NS driver)."""

    def __init__(self, cfg: RiverConfig, time=None, events=()):
        from .simulation import Time
        self.cfg = cfg
        self.time = time or Time()
        self.events = list(events)
        z = jnp.zeros(cfg.shape)
        self.state = {"P": z, "U": z, "V": z, "Zb": z}
        self.dt = 0.0

    def init(self, **fields):
        for k, v in fields.items():
            self.state[k] = jnp.asarray(v)
        return self

    def run(self, max_steps=None):
        import math as _m
        n = 0
        while (self.time.t < self.time.end
               and self.time.i < self.time.iend):
            dt = float(self.cfg.cfl * timescale(self.state, self.cfg))
            if _m.isfinite(self.time.dtmax):
                dt = min(dt, self.time.dtmax)
            dt = min(dt, self.time.end - self.time.t) \
                if _m.isfinite(self.time.end) else dt
            self.state = river_step(
                self.state, jnp.asarray(dt, self.state["P"].dtype),
                self.cfg)
            self.time.t += dt
            self.time.i += 1
            self.dt = dt
            for ev in self.events:
                if ev.should_fire(self.time.t, self.time.i):
                    ev.fire(self, self.time.t, self.time.i)
            n += 1
            if max_steps is not None and n >= max_steps:
                break
        return self


def run(state: dict, cfg: RiverConfig, t_end: float, dtmax: float = None,
        on_step=None):
    """Host-side driver: CFL-limited explicit loop to ``t_end``
    (reference: river_run src/river.c:903-982 with river_cfl)."""
    t = 0.0
    i = 0
    while t < t_end:
        dt = float(cfg.cfl * timescale(state, cfg))
        if dtmax is not None:
            dt = min(dt, dtmax)
        dt = min(dt, t_end - t)
        state = river_step(state, jnp.asarray(dt, state["P"].dtype), cfg)
        t += dt
        i += 1
        if on_step is not None:
            on_step(state, t, i)
    return state, t, i

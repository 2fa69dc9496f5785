"""GfsLayers: multilayer Saint-Venant (hydrostatic multilayer river).

TPU-native rebuild of the reference's multilayer extension
(reference: src/river.c — per-layer state T(i,l)/U+2l indices:236-241,
riemann_kinetic layer loop:325-365, face_fluxes layer fluxes + interface
mass flux G:467-516, vertical_advection:539-561, vertical_diffusion
tridiagonal:663-740, GfsLayers read:1401-1460; the Audusse et al. 2011
multilayer scheme).

State: ``P`` total depth (nx, ny); ``U``/``V`` per-layer depth-integrated
momenta (nl, nx, ny); ``Zb`` bed.  Layer thicknesses h_l = dz_l * P.
The vertical diffusion is a batched Thomas solve: the (small, static)
layer count loops in Python while every cell solves in parallel — the
TPU replacement for the reference's per-cell tridiagonal traversal.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import river as rv

SQRT3 = rv.SQRT3


@dataclasses.dataclass(frozen=True)
class LayersConfig:
    """Multilayer parameters.  ``dz``: layer fractions (sum 1; default
    uniform); ``nu`` vertical viscosity; ``dut`` surface (wind) stress
    du/dz at the top; ``kbot`` Navier bottom-friction coefficient
    (reference: GfsLayers / river_read, src/river.c:1401-1460)."""
    shape: tuple
    nlayers: int = 2
    L: float = 1.0
    g: float = 1.0
    dry: float = 1e-6
    cfl: float = 0.5
    time_order: int = 2
    limiter: str = "minmod"
    bcs: tuple = (("symmetry", "symmetry"), ("symmetry", "symmetry"))
    dz: tuple = None
    nu: float = 0.0
    dut: float = 0.0
    kbot: float = 0.0

    def __post_init__(self):
        if self.dz is None:
            object.__setattr__(
                self, "dz", tuple([1.0 / self.nlayers] * self.nlayers))

    @property
    def dx(self):
        return self.L / self.shape[0]


def _r(cfg: LayersConfig) -> rv.RiverConfig:
    return rv.RiverConfig(shape=cfg.shape, L=cfg.L, g=cfg.g, dry=cfg.dry,
                          cfl=cfg.cfl, limiter=cfg.limiter, bcs=cfg.bcs)


def _pad(v, cfg, axis, odd=False):
    """Ghost pad along a SPATIAL axis of a (possibly layered) array."""
    return rv._pad1(_A(v), _r(cfg), axis + (v.ndim - 2), odd=odd)


def _A(v):
    return v


def _slopes(state, cfg: LayersConfig):
    """Limited half-slopes per spatial axis: P, Zb reconstruction as in
    the single-layer solver; U/V per layer (vmapped)."""
    rcfg = _r(cfg)
    out = []
    for axis in range(2):
        d = {}
        wet1 = rv._pad1(state["P"], rcfg, axis) > cfg.dry
        P2 = rv._pad1(state["P"], rcfg, axis, width=2)
        d["P"] = jnp.where(wet1, rv._limited_halfslope(P2, rcfg, axis),
                           0.0)
        H2 = rv._pad1(state["Zb"] + state["P"], rcfg, axis, width=2)
        d["Zb"] = jnp.where(
            wet1, rv._limited_halfslope(H2, rcfg, axis) - d["P"], 0.0)
        for nm, odd_ax in (("U", 0), ("V", 1)):
            def one(v2d):
                p2 = rv._pad1(v2d, rcfg, axis, odd=odd_ax == axis,
                              width=2)
                return rv._limited_halfslope(p2, rcfg, axis)
            d[nm] = jnp.where(wet1[None], jax.vmap(one)(state[nm]), 0.0)
        out.append(d)
    return out


def _advance(base, recon, slopes, dt, cfg: LayersConfig):
    """One Euler stage of the multilayer system (reference: advance
    src/river.c:758-799 with nlayers > 1)."""
    g, dry, dx = cfg.g, cfg.dry, cfg.dx
    nl = cfg.nlayers
    dz = jnp.asarray(cfg.dz)[:, None, None]
    rcfg = _r(cfg)
    shape = base["P"].shape
    dP = jnp.zeros(shape)
    dU = jnp.zeros((nl,) + shape)
    dV = jnp.zeros((nl,) + shape)
    Gmass = jnp.zeros((nl,) + shape)   # interface mass fluxes (cell sums)
    umax = cfg.cfl * dx / dt

    for axis in range(2):
        nrm, tan = ("U", "V") if axis == 0 else ("V", "U")
        sl = slopes[axis]

        def faces(arr1, ax):
            n = arr1.shape[ax]
            lo = [slice(None)] * arr1.ndim
            lo[ax] = slice(0, n - 1)
            hi = [slice(None)] * arr1.ndim
            hi[ax] = slice(1, n)
            return arr1[tuple(lo)], arr1[tuple(hi)]

        P1 = rv._pad1(recon["P"], rcfg, axis)
        Zb1 = rv._pad1(recon["Zb"], rcfg, axis)
        PL, PR = faces(P1, axis)
        ZbL0, ZbR0 = faces(Zb1, axis)
        dPL, dPR = faces(sl["P"], axis)
        dZL, dZR = faces(sl["Zb"], axis)
        etaL = jnp.where(PL <= dry, 0.0, PL + dPL)
        etaR = jnp.where(PR <= dry, 0.0, PR - dPR)
        zbL = ZbL0 + dZL
        zbR = ZbR0 - dZR
        zbF = jnp.maximum(zbL, zbR)
        hL = jnp.maximum(0.0, etaL + zbL - zbF)
        hR = jnp.maximum(0.0, etaR + zbR - zbF)
        wetL = etaL > dry
        wetR = etaR > dry
        safeL = jnp.where(wetL, etaL, 1.0)
        safeR = jnp.where(wetR, etaR, 1.0)

        def lay_pad(nm, odd_ax):
            return jax.vmap(lambda v: rv._pad1(v, rcfg, axis,
                                               odd=odd_ax == axis)
                            )(recon[nm])

        N1 = lay_pad(nrm, 0 if nrm == "U" else 1)
        T1 = lay_pad(tan, 0 if tan == "U" else 1)
        NL, NR = faces(N1, axis + 1)
        TL, TR = faces(T1, axis + 1)
        dNL, dNR = faces(sl[nrm], axis + 1)
        dTL, dTR = faces(sl[tan], axis + 1)
        clamp = lambda u: jnp.clip(u, -umax, umax)
        # per-layer velocities: u_l = (hu_l +- slope) / (eta* dz_l)
        uL = jnp.where(wetL[None],
                       clamp((NL + dNL) / (safeL[None] * dz)), 0.0)
        vL = jnp.where(wetL[None],
                       clamp((TL + dTL) / (safeL[None] * dz)), 0.0)
        uR = jnp.where(wetR[None],
                       clamp((NR - dNR) / (safeR[None] * dz)), 0.0)
        vR = jnp.where(wetR[None],
                       clamp((TR - dTR) / (safeR[None] * dz)), 0.0)

        # kinetic fluxes per layer, celerity from the TOTAL face depth
        # (riemann_kinetic, src/river.c:325-365)
        cL = jnp.sqrt(g * hL / 2.0)[None]
        Mp = jnp.maximum(uL + cL * SQRT3, 0.0)
        Mm = jnp.maximum(uL - cL * SQRT3, 0.0)
        cig = cL / (6.0 * g * SQRT3)
        fHl = dz * cig * 3.0 * (Mp * Mp - Mm * Mm)
        fUl = dz * cig * 2.0 * (Mp ** 3 - Mm ** 3)
        cR = jnp.sqrt(g * hR / 2.0)[None]
        Mp = jnp.minimum(uR + cR * SQRT3, 0.0)
        Mm = jnp.minimum(uR - cR * SQRT3, 0.0)
        cig = cR / (6.0 * g * SQRT3)
        fHl = fHl + dz * cig * 3.0 * (Mp * Mp - Mm * Mm)
        fUl = fUl + dz * cig * 2.0 * (Mp ** 3 - Mm ** 3)
        fVl = jnp.where(fHl > 0.0, vL, vR) * fHl
        fH = jnp.sum(fHl, axis=0)

        both_dry = (PL <= dry) & (PR <= dry)
        fH = jnp.where(both_dry, 0.0, fH)
        fHl = jnp.where(both_dry[None], 0.0, fHl)
        fUl = jnp.where(both_dry[None], 0.0, fUl)
        fVl = jnp.where(both_dry[None], 0.0, fVl)

        eta0L = jnp.where(PL <= dry, 0.0, PL)
        eta0R = jnp.where(PR <= dry, 0.0, PR)
        SbL = g / 2.0 * (hL * hL - etaL * etaL
                         - (etaL + eta0L) * (zbL - ZbL0))
        SbR = g / 2.0 * (hR * hR - etaR * etaR
                         - (etaR + eta0R) * (zbR - ZbR0))
        SbL = jnp.where(both_dry, 0.0, SbL)
        SbR = jnp.where(both_dry, 0.0, SbR)

        def diff(right_f, left_f, ax):
            n = right_f.shape[ax]
            r = [slice(None)] * right_f.ndim
            r[ax] = slice(1, n)
            l = [slice(None)] * right_f.ndim
            l[ax] = slice(0, n - 1)
            return -(dt / dx) * (right_f[tuple(r)] - left_f[tuple(l)])

        dP = dP + diff(fH, fH, axis)
        dNl = diff(fUl - dz * SbL[None], fUl - dz * SbR[None], axis + 1)
        dTl = diff(fVl, fVl, axis + 1)
        if axis == 0:
            dU = dU + dNl
            dV = dV + dTl
        else:
            dV = dV + dNl
            dU = dU + dTl
        # interface mass flux G_l = sum_{k<=l} dt (fH_k - dz_k fH);
        # cell accumulation = G(right face) - G(left face)
        # (river.c:502-508)
        Gface = jnp.cumsum(dt * (fHl - dz * fH[None]), axis=0)
        n = Gface.shape[axis + 1]
        r = [slice(None)] * Gface.ndim
        r[axis + 1] = slice(1, n)
        l_ = [slice(None)] * Gface.ndim
        l_[axis + 1] = slice(0, n - 1)
        Gmass = Gmass + Gface[tuple(r)] - Gface[tuple(l_)]

    out = dict(base)
    out["P"] = jnp.maximum(base["P"] + dP, 0.0)
    U = base["U"] + dU
    V = base["V"] + dV

    # vertical advection between layers (vertical_advection,
    # src/river.c:539-561; first-order upwind interface values — the
    # reference adds a minmod correction for nl >= 3 interior layers)
    P = out["P"]
    wet = P > dry
    dz1 = jnp.asarray(cfg.dz)
    for l in range(nl - 1):
        dzi = P * (dz1[l] + dz1[l + 1]) / 2.0
        G = jnp.where(wet, Gmass[l] / jnp.where(wet, dzi, 1.0), 0.0)
        vloU = U[l] / jnp.maximum(P * dz1[l], 1e-30)
        vhiU = U[l + 1] / jnp.maximum(P * dz1[l + 1], 1e-30)
        fU = jnp.where(wet, jnp.where(G < 0.0, G * vloU, G * vhiU), 0.0)
        U = U.at[l].add(fU)
        U = U.at[l + 1].add(-fU)
        vloV = V[l] / jnp.maximum(P * dz1[l], 1e-30)
        vhiV = V[l + 1] / jnp.maximum(P * dz1[l + 1], 1e-30)
        fV = jnp.where(wet, jnp.where(G < 0.0, G * vloV, G * vhiV), 0.0)
        V = V.at[l].add(fV)
        V = V.at[l + 1].add(-fV)

    # vertical diffusion (implicit tridiagonal per column; reference:
    # vertical_diffusion src/river.c:663-707 with the Navier bottom
    # condition and top stress dut)
    if cfg.nu > 0.0:
        U = _vertical_diffusion(U, P, cfg, dt, cfg.dut)
        V = _vertical_diffusion(V, P, cfg, dt, 0.0)

    out["U"] = U
    out["V"] = V
    return out


def _vertical_diffusion(Q, P, cfg: LayersConfig, dt, dut):
    """Batched Thomas solve of the implicit vertical-diffusion system on
    the layer velocities u_l = Q_l/(P dz_l) (vertical_diffusion,
    src/river.c:663-692): Navier bottom lambda_b = nu/k, stress dut on
    top."""
    nl = cfg.nlayers
    dz1 = jnp.asarray(cfg.dz)
    wet = P > cfg.dry
    Psafe = jnp.where(wet, P, 1.0)
    hz = [dz1[l] * Psafe for l in range(nl)]
    u = [Q[l] / (hz[l]) for l in range(nl)]
    mu = cfg.nu
    a = [dt * 2.0 * mu / (hz[l] * (hz[l] + hz[l + 1]))
         for l in range(nl - 1)]
    a.append(dt * mu / (hz[nl - 1] * hz[nl - 1]))
    am = dt * mu / (hz[0] * hz[0])
    if cfg.kbot > 0.0:
        lam = mu / cfg.kbot
    else:
        lam = jnp.inf                 # free-slip bottom
    # Thomas coefficients (b diag, c upper, aL lower, v rhs)
    b = [None] * nl
    c = [None] * nl
    aL = [None] * nl
    v = [None] * nl
    bot = (1.0 - (2.0 * lam - hz[0]) / (2.0 * lam + hz[0])) \
        if cfg.kbot > 0.0 else 0.0
    b[0] = 1.0 + a[0] + bot * am
    c[0] = -a[0]
    v[0] = u[0]
    for l in range(1, nl - 1):
        aL[l] = -a[l - 1]
        b[l] = 1.0 + a[l] + a[l - 1]
        c[l] = -a[l]
        v[l] = u[l]
    assert nl > 1, "single layer uses bottom_friction (river.py)"
    aL[nl - 1] = -a[nl - 2]
    b[nl - 1] = 1.0 + a[nl - 2]
    v[nl - 1] = u[nl - 1] + dut * hz[nl - 1] * a[nl - 1]
    # forward sweep
    cp = [None] * nl
    vp = [None] * nl
    cp[0] = c[0] / b[0]
    vp[0] = v[0] / b[0]
    for l in range(1, nl):
        m = b[l] - aL[l] * cp[l - 1]
        if l < nl - 1:
            cp[l] = c[l] / m
        vp[l] = (v[l] - aL[l] * vp[l - 1]) / m
    unew = [None] * nl
    unew[nl - 1] = vp[nl - 1]
    for l in range(nl - 2, -1, -1):
        unew[l] = vp[l] - cp[l] * unew[l + 1]
    out = jnp.stack([jnp.where(wet, unew[l] * hz[l], 0.0)
                     for l in range(nl)])
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def layers_step(state, dt, cfg: LayersConfig):
    """MUSCL-Hancock two-stage step (river_run's predictor/corrector)."""
    slopes = _slopes(state, cfg)
    if cfg.time_order == 2:
        half = _advance(state, state, slopes, dt / 2.0, cfg)
        return _advance(state, half, slopes, dt, cfg)
    return _advance(state, state, slopes, dt, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def timescale(state, cfg: LayersConfig):
    P = state["P"]
    wet = P > cfg.dry
    safe = jnp.where(wet, P, 1.0)
    c = jnp.sqrt(cfg.g * jnp.maximum(P, 0.0))
    dz1 = jnp.asarray(cfg.dz)[:, None, None]
    big = jnp.asarray(jnp.finfo(P.dtype).max, P.dtype)
    ts = big
    for nm in ("U", "V"):
        u = jnp.abs(state[nm]) / (safe[None] * dz1)
        ts = jnp.minimum(ts, jnp.min(
            jnp.where(wet[None], cfg.dx / (u + c[None] + 1e-30), big)))
    return ts

"""Bubble dynamics: particles with a Rayleigh-Plesset radius ODE.

TPU-native rebuild of the reference's bubbles module
(reference: modules/bubbles.c — polytropic gas state p_state_ec:87,
incompressible Rayleigh-Plesset RPeq:95-101, Keller-Miksis compressible
RPKMeq:103-111, fixed-radius NORPeq:113, coupled 8-ODE system func:118-155
integrated with GSL adaptive RK gfs_bubble_event:186-276, void-fraction
field GfsBubbleFraction:538-744).

Here the (R, Rdot) radius ODE of ALL bubbles is integrated together with
fixed-substep RK4 — vectorized over the bubble array instead of a per-bubble
adaptive GSL loop; translation (pos, vel) advances with the shared particle
leapfrog (physics/particles.py), which the reference couples into the same
ODE system.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from . import particles as parts


@dataclasses.dataclass(frozen=True)
class BubbleConfig:
    """Reference: GfsBubbleParams (modules/bubbles.c) — sigma, liquid
    viscosity, sound speed cl, model selection."""
    model: str = "rp"        # rp | keller_miksis | const
    gamma: float = 1.4       # polytropic exponent (ref p_state_ec: 3*1.4)
    sigma: float = 0.0       # surface tension
    visc: float = 0.0        # liquid dynamic viscosity
    cl: float = 1500.0       # liquid sound speed (Keller-Miksis)
    substeps: int = 16       # RK4 substeps per flow dt
    # bubble-bubble radiated-pressure coupling (GfsBubbleInteractions,
    # modules/bubbles.c:815-1130); dense O(n^2) — for clouds, not swarms
    interactions: bool = False


def gas_pressure(p0, R0, R, gamma):
    """Polytropic state p = p0 (R0/R)^(3 gamma), with the reference's
    small-radius clamp (modules/bubbles.c:87-93)."""
    Rc = jnp.where(R <= 1e-3 * R0, 1e-2 * R0, R)
    return p0 * jnp.power(R0 / Rc, 3.0 * gamma)


def radius_rhs(R, Rdot, p0, R0, p_liq, rho_liq, cfg: BubbleConfig):
    """d(Rdot)/dt per model (reference: RPeq:95, RPKMeq:103, NORPeq:113)."""
    pb = gas_pressure(p0, R0, R, cfg.gamma)
    pdiff = pb - 2.0 * cfg.sigma / R + 4.0 * cfg.visc * Rdot / R - p_liq
    if cfg.model == "const":
        return jnp.zeros_like(R)
    if cfg.model == "rp":
        return (pdiff / rho_liq - 1.5 * Rdot * Rdot) / R
    if cfg.model == "keller_miksis":
        f = pdiff / rho_liq
        f = f * (1.0 + Rdot / cfg.cl)
        f = f - 1.5 * Rdot * Rdot * (1.0 - Rdot / (3.0 * cfg.cl))
        return f / (R * (1.0 - Rdot / cfg.cl))
    raise ValueError(cfg.model)


def coupled_radius_rhs(R, Rdot, p0, R0, p_liq, rho_liq, pos, alive,
                       cfg: BubbleConfig):
    """Bubble-bubble interaction dynamics (GfsBubbleInteractions,
    modules/bubbles.c:815-1130): each bubble's wall motion radiates a
    pressure field p'(d) = rho (R^2 Rddot + 2 R Rdot^2)/d that drives its
    neighbours, coupling the accelerations into the linear system
        R_i Rddot_i + sum_j (R_j^2/d_ij) Rddot_j = b_i
        b_i = pdiff_i/rho - 1.5 Rdot_i^2 - sum_j 2 R_j Rdot_j^2 / d_ij
    solved densely per RK stage (vectorized; the reference iterates the
    same coupling bubble-by-bubble)."""
    pb = gas_pressure(p0, R0, R, cfg.gamma)
    pdiff = pb - 2.0 * cfg.sigma / R + 4.0 * cfg.visc * Rdot / R - p_liq
    n = R.shape[0]
    d = jnp.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    # regularize: no self-coupling; distance floored at the bubble radii
    eye = jnp.eye(n, dtype=bool)
    d = jnp.maximum(d, (R[:, None] + R[None, :]))
    inv_d = jnp.where(eye | ~(alive[:, None] & alive[None, :]),
                      0.0, 1.0 / d)
    A = jnp.diag(R) + (R[None, :] ** 2) * inv_d
    b = (pdiff / rho_liq - 1.5 * Rdot * Rdot
         - jnp.sum(2.0 * (R * Rdot * Rdot)[None, :] * inv_d, axis=1))
    # dead rows: identity equation Rddot = 0
    A = jnp.where(alive[:, None] & alive[None, :], A,
                  jnp.eye(n, dtype=A.dtype))
    b = jnp.where(alive, b, 0.0)
    return jnp.linalg.solve(A, b)


def integrate_radius_coupled(R, Rdot, p0, R0, p_liq, rho_liq, pos, alive,
                             dt, cfg: BubbleConfig):
    """RK4 on the coupled (R, Rdot) system of ALL bubbles (interactions
    on; modules/bubbles.c:815-1130)."""
    h = dt / cfg.substeps

    def rhs(y):
        R, Rdot = y
        return (Rdot, coupled_radius_rhs(R, Rdot, p0, R0, p_liq, rho_liq,
                                         pos, alive, cfg))

    def rk4_step(i, y):
        k1 = rhs(y)
        k2 = rhs((y[0] + 0.5 * h * k1[0], y[1] + 0.5 * h * k1[1]))
        k3 = rhs((y[0] + 0.5 * h * k2[0], y[1] + 0.5 * h * k2[1]))
        k4 = rhs((y[0] + h * k3[0], y[1] + h * k3[1]))
        return (y[0] + h / 6.0 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0]),
                y[1] + h / 6.0 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1]))

    R, Rdot = jax.lax.fori_loop(0, cfg.substeps, rk4_step, (R, Rdot))
    R = jnp.where(R <= 1e-3 * R0, 1e-2 * R0, R)
    return R, Rdot


def integrate_radius(R, Rdot, p0, R0, p_liq, rho_liq, dt,
                     cfg: BubbleConfig):
    """Fixed-substep RK4 for the (R, Rdot) system over one flow step,
    vectorized over all bubbles (replaces GSL gsl_odeiv_evolve,
    modules/bubbles.c:232-258)."""
    h = dt / cfg.substeps

    def rhs(y):
        R, Rdot = y
        return (Rdot, radius_rhs(R, Rdot, p0, R0, p_liq, rho_liq, cfg))

    def rk4_step(i, y):
        k1 = rhs(y)
        k2 = rhs((y[0] + 0.5 * h * k1[0], y[1] + 0.5 * h * k1[1]))
        k3 = rhs((y[0] + 0.5 * h * k2[0], y[1] + 0.5 * h * k2[1]))
        k4 = rhs((y[0] + h * k3[0], y[1] + h * k3[1]))
        return (y[0] + h / 6.0 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0]),
                y[1] + h / 6.0 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1]))

    R, Rdot = jax.lax.fori_loop(0, cfg.substeps, rk4_step, (R, Rdot))
    R = jnp.where(R <= 1e-3 * R0, 1e-2 * R0, R)  # ref clamp :262
    return R, Rdot


def make_bubbles(capacity: int, dim: int, pos, vel=None, R=None,
                 p0=None, rho_gas: float = 1e-3, dtype=jnp.float64):
    """Bubble state = particle state + (R, Rdot, R0, p0)."""
    npart = jnp.asarray(pos).shape[0]
    R = jnp.asarray(R, dtype=dtype) if R is not None else jnp.full((npart,), 0.01, dtype)
    vol = 4.0 / 3.0 * math.pi * R ** 3
    p = parts.make_particles(capacity, dim, pos=pos, vel=vel,
                             vol=vol, mass=rho_gas * vol, dtype=dtype)

    def fullv(src, fill):
        out = jnp.full((capacity,), fill, dtype=dtype)
        if src is not None:
            return out.at[: src.shape[0]].set(src)
        return out

    p["R"] = fullv(R, 1e-6)
    p["Rdot"] = jnp.zeros((capacity,), dtype)
    p["R0"] = fullv(R, 1e-6)
    p["p0"] = fullv(jnp.asarray(p0, dtype) if p0 is not None else None, 1.0)
    return p


def step_bubbles(b: dict, U: list, U_old: list, P: jnp.ndarray, grid: Grid,
                 u_bcs: list, p_bc, pcfg: parts.ParticleConfig,
                 bcfg: BubbleConfig, nu: float, rho_liq: float, dt, t=0.0):
    """One bubble step: radius ODE driven by the interpolated liquid
    pressure, then the shared particle translation update.
    Reference: gfs_bubble_event modules/bubbles.c:186-276."""
    p_at = parts.interpolate_at(P, grid, p_bc, b["pos"], t)
    if bcfg.interactions:
        R, Rdot = integrate_radius_coupled(
            b["R"], b["Rdot"], b["p0"], b["R0"], p_at, rho_liq,
            b["pos"], b["alive"], dt, bcfg)
    else:
        R, Rdot = integrate_radius(b["R"], b["Rdot"], b["p0"], b["R0"],
                                   p_at, rho_liq, dt, bcfg)
    b = dict(b)
    b["R"], b["Rdot"] = R, Rdot
    b["vol"] = 4.0 / 3.0 * math.pi * R ** 3
    newp, total = parts.step_particles(b, U, U_old, grid, u_bcs, pcfg,
                                       nu, dt, t)
    for k in ("R", "Rdot", "R0", "p0"):
        newp[k] = b[k]
    return newp, total


def void_fraction_dt(b: dict, b_prev: dict, grid: Grid,
                     pcfg: parts.ParticleConfig, dt):
    """d(void volume)/dt field (GfsBubbleFractionDt,
    modules/bubbles.c:758-790): kernel-spread dV/dt, a divergence source
    for the projection when bubbles are sub-grid cavitation nuclei."""
    dvdt = (b["vol"] - b_prev["vol"]) / dt
    return parts.deposit(dvdt, b, grid, pcfg)

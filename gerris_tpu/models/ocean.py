"""GfsOcean: linearised free-surface (barotropic) ocean solver, 2D.

TPU-native rebuild of the reference's 2D GfsOcean simulation class
(reference: src/ocean.c — ocean_run:261-358, gfs_free_surface_pressure:
203-246 with scale_divergence_helmoltz:150-166, the theta-scheme
semi-implicit free surface of Popinet & Rickard 2007).

Model: depth-averaged velocity u and surface pressure p = G eta over
bathymetry H(x, y):

    u_t + u.grad u = -grad p + f x u + nu lap u
    p_t + G div(H u) = 0

The free surface is advanced with a theta-scheme (theta = 0.5
Crank-Nicolson, neutrally stable for gravity waves): eliminating u^{n+1}
gives one Helmholtz solve per step,

    div(H grad p') - p'/(G theta^2 dt^2) =
        -[p^n - G dt div(H (theta u* + (1-theta) u^n))]/(G theta^2 dt^2)

which rides the existing face-coefficient multigrid (alpha = face depth
— exactly how the reference feeds fH into gfs_poisson_coefficients,
ocean.c:310).  Momentum advection is the shared BCG machinery; Coriolis
is the Crank-Nicolson split of src/source.c:1902-1925.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from ..core import bc as bcs
from ..ops.stencils import divergence, face_average
from ..solvers import advection as adv
from ..solvers import diffusion as diff
from ..solvers import poisson
from ..solvers import projection as proj
from . import ns as nsm


@dataclasses.dataclass(frozen=True)
class OceanConfig:
    """Static parameters (jit static arg).  ``depth``: callable(x, y) or
    constant bathymetry H > 0; ``G``: reduced gravity
    (physical_params.g, ocean.c:... r->g)."""
    grid: Grid
    u_bcs: tuple
    depth: object = 1.0
    G: float = 1.0
    theta: float = 0.5
    nu: float = 0.0
    coriolis: tuple = None            # (f, drag, beta)
    p_bc: bcs.FieldBC = None
    scheme_none: bool = False         # AdvectionParams { scheme = none }
    advection: adv.AdvectionParams = adv.AdvectionParams(gc=False)
    solver: poisson.MultilevelParams = poisson.MultilevelParams(
        tolerance=1e-9, nitermax=50)
    diffusion_params: poisson.MultilevelParams = None

    def __post_init__(self):
        if self.p_bc is None:
            object.__setattr__(self, "p_bc", nsm.grad_bc(self.u_bcs[0]))

    @property
    def dim(self):
        return self.grid.dim


@functools.lru_cache(maxsize=32)
def _depth_faces(cfg: OceanConfig):
    """Cell and per-axis face depth H (the reference's fH poisson
    coefficients, ocean.c:310,334)."""
    grid = cfg.grid
    with jax.ensure_compile_time_eval():
        if callable(cfg.depth):
            Hc = cfg.depth(*grid.centers)
            hf = []
            for ax in range(grid.dim):
                hf.append(cfg.depth(*grid.face_centers(ax)))
        else:
            Hc = jnp.full(grid.shape, cfg.depth)
            hf = [jnp.full(grid.face_shape(ax), cfg.depth)
                  for ax in range(grid.dim)]
    return Hc, tuple(hf)


def _div_Hu(U: list, cfg: OceanConfig, t, u_bcs=None):
    """div(H u) from face-interpolated normal velocities (reference:
    normal_velocities + gfs_normal_divergence_2D, ocean.c:251-259,301)."""
    grid = cfg.grid
    _, Hf = _depth_faces(cfg)
    uf = proj.face_interpolated_velocity(
        U, grid, list(u_bcs if u_bcs is not None else cfg.u_bcs), t=t)
    return divergence([Hf[c] * uf[c] for c in range(grid.dim)], grid)


def _has_tide(cfg: OceanConfig) -> bool:
    return any(b.kind == "tide"
               for fbc in cfg.u_bcs for ax in fbc.sides for b in ax)


def _resolve_tide_bcs(cfg: OceanConfig, state: dict, t):
    """Materialize tidal Flather radiation BCs (GfsBcTide,
    modules/tide.c:252-299) against the step's surface pressure: each
    BC(kind="tide", value=BcTide) on a velocity component becomes a
    Dirichlet whose boundary profile is

        u = u0 -/+ (P - g eta_tide(t)/href) sqrt(g H)/g

    evaluated from the boundary-adjacent interior P and the bathymetry.
    Static when no tide BC is present (the usual case)."""
    if not _has_tide(cfg):
        return cfg.u_bcs
    grid = cfg.grid
    assert grid.dim == 2, "BcTide is 2D-only (tide.c bc_tide_read)"
    Hc, _ = _depth_faces(cfg)
    P = state["P"]

    def centers1d(ax):
        import numpy as _np
        i = _np.arange(grid.shape[ax])
        return jnp.asarray(grid.origin[ax] + (i + 0.5) * grid.h)

    out = []
    for c, fbc in enumerate(cfg.u_bcs):
        sides = []
        for ax in range(grid.dim):
            pair = []
            for sd in range(2):
                b = fbc.sides[ax][sd]
                if b.kind != "tide":
                    pair.append(b)
                    continue
                assert ax == c, "tide BC applies to the normal velocity"
                bt = b.value
                # positive index: jnp.take clips negatives
                idx = 0 if sd == 0 else grid.shape[ax] - 1
                tr = 1 - ax
                coord = centers1d(tr)
                P_line = jnp.take(P, idx, axis=ax)
                H_line = jnp.take(Hc, idx, axis=ax)
                # boundary faces point from the ghost cell to the
                # interior (tide(), tide.c:286: f->cell is the boundary
                # cell): a LOW-side boundary has d = RIGHT/TOP = direct
                vals = bt.flather_value(coord, t, P_line, H_line,
                                        direct=(sd == 0))

                def mk(vals=vals, coord=coord, tr=tr):
                    def f(x, y, t_):
                        q = (x, y)[tr]
                        flat = jnp.interp(jnp.ravel(q), coord, vals)
                        return flat.reshape(jnp.shape(q))
                    return f
                pair.append(bcs.Dirichlet(mk()))
            sides.append(tuple(pair))
        out.append(bcs.FieldBC(tuple(sides)))
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("cfg",))
def ocean_step(state: dict, dt, t, cfg: OceanConfig) -> dict:
    """One semi-implicit step: explicit momentum (BCG advection +
    viscosity + (1-theta) old pressure gradient + CN Coriolis), then the
    free-surface Helmholtz solve and the theta correction
    (reference: ocean_run loop, src/ocean.c:302-341)."""
    grid = cfg.grid
    dim = grid.dim
    th = cfg.theta
    names = nsm.velocity_names(dim)
    U = [state[n] for n in names]
    p = state["P"]

    # tidal Flather radiation BCs read the step-start surface pressure
    u_bcs = _resolve_tide_bcs(cfg, state, t)
    proxy = _ns_proxy(cfg)
    if u_bcs is not cfg.u_bcs:
        proxy = dataclasses.replace(proxy, u_bcs=u_bcs)

    # explicit momentum: u* = u + dt (adv + nu lap) - (1-th) dt grad p
    gp = proj.face_gradients(p, grid, cfg.p_bc, t=t)
    g_cell = proj.cell_gradient_from_faces(gp, grid)
    if cfg.scheme_none:
        # AdvectionParams { scheme = none } (test/geo/geo.gfs): pure
        # wave dynamics, no momentum self-advection
        Ustar = list(U)
    else:
        uf = nsm.predicted_face_velocities(U, grid, proxy, dt, t)
        Ustar = nsm.velocity_advection_diffusion(
            U, uf, [jnp.zeros_like(g) for g in g_cell], None, grid,
            proxy, dt, t)
    Ustar = [Ustar[c] - (1.0 - th) * dt * g_cell[c] for c in range(dim)]

    if cfg.coriolis is not None:
        f, e, beta = cfg.coriolis
        U0, V0 = Ustar
        Ue = U0 + dt * (1.0 - beta) * (f * V0 - e * U0)
        Ve = V0 + dt * (1.0 - beta) * (-e * V0 - f * U0)
        bdt = beta * dt
        det = (1.0 + e * bdt) ** 2 + (f * bdt) ** 2
        Ustar = [((1.0 + e * bdt) * Ue + f * bdt * Ve) / det,
                 (-f * bdt * Ue + (1.0 + e * bdt) * Ve) / det]

    # Helmholtz free-surface solve (gfs_free_surface_pressure,
    # ocean.c:203-246: dia = c, rhs = 2 div/dt - c pn with theta=1/2)
    divs = (th * _div_Hu(Ustar, cfg, t, u_bcs)
            + (1.0 - th) * _div_Hu(U, cfg, t, u_bcs))
    dia = 1.0 / (cfg.G * th * th * dt * dt)
    rhs = -dia * (p - cfg.G * dt * divs)
    _, Hf = _depth_faces(cfg)
    p_new, stats = poisson.solve(p, rhs, grid, cfg.p_bc, cfg.solver,
                                 alpha=Hf, dia=dia, t=t)
    gp1 = proj.face_gradients(p_new, grid, cfg.p_bc, t=t)
    g1 = proj.cell_gradient_from_faces(gp1, grid)
    U_new = [Ustar[c] - th * dt * g1[c] for c in range(dim)]

    out = dict(state)
    for c, n in enumerate(names):
        out[n] = U_new[c]
    out["P"] = p_new
    return out


@functools.lru_cache(maxsize=8)
def _ns_proxy(cfg: OceanConfig):
    """An NSConfig carrying the shared advection/diffusion machinery."""
    return nsm.NSConfig(grid=cfg.grid, u_bcs=cfg.u_bcs, p_bc=cfg.p_bc,
                        nu=cfg.nu, advection=cfg.advection,
                        diffusion_params=cfg.diffusion_params)


@functools.partial(jax.jit, static_argnames=("cfg",))
def timescale(state: dict, cfg: OceanConfig):
    """Advective + gravity-wave CFL: min(h/(|u| + sqrt(G H)))."""
    grid = cfg.grid
    Hc, _ = _depth_faces(cfg)
    c = jnp.sqrt(cfg.G * Hc)
    ts = jnp.asarray(jnp.inf, state["P"].dtype)
    for n in nsm.velocity_names(grid.dim):
        ts = jnp.minimum(ts, jnp.min(
            grid.h / (jnp.abs(state[n]) + c + 1e-30)))
    return ts


class OceanSimulation:
    """Simulation-style driver for GfsOcean runs (ocean_run,
    src/ocean.c:261-358): CFL-limited semi-implicit stepping with the
    shared Event machinery (same API as RiverSimulation)."""

    def __init__(self, cfg: OceanConfig, time=None, events=(), cfl=0.5):
        from .simulation import Time
        self.cfg = cfg
        self.time = time or Time()
        self.events = list(events)
        self.cfl = cfl
        z = jnp.zeros(cfg.grid.shape)
        self.state = {n: z for n in nsm.velocity_names(cfg.grid.dim)}
        self.state["P"] = z
        self.dt = 0.0

    def init(self, **fields):
        for k, v in fields.items():
            self.state[k] = jnp.asarray(v) + jnp.zeros(self.cfg.grid.shape)
        return self

    def run(self, max_steps=None):
        import math as _m
        n = 0
        while (self.time.t < self.time.end
               and self.time.i < self.time.iend):
            dt = float(self.cfl * timescale(self.state, self.cfg))
            if _m.isfinite(self.time.dtmax):
                dt = min(dt, self.time.dtmax)
            if _m.isfinite(self.time.end):
                dt = min(dt, self.time.end - self.time.t)
            self.state = ocean_step(self.state,
                                    jnp.asarray(dt,
                                                self.state["P"].dtype),
                                    jnp.asarray(self.time.t,
                                                self.state["P"].dtype),
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

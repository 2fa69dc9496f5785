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


def _div_Hu(U: list, cfg: OceanConfig, t):
    """div(H u) from face-interpolated normal velocities (reference:
    normal_velocities + gfs_normal_divergence_2D, ocean.c:251-259,301)."""
    grid = cfg.grid
    _, Hf = _depth_faces(cfg)
    uf = proj.face_interpolated_velocity(U, grid, list(cfg.u_bcs), t=t)
    return divergence([Hf[c] * uf[c] for c in range(grid.dim)], grid)


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

    # explicit momentum: u* = u + dt (adv + nu lap) - (1-th) dt grad p
    gp = proj.face_gradients(p, grid, cfg.p_bc, t=t)
    g_cell = proj.cell_gradient_from_faces(gp, grid)
    uf = nsm.predicted_face_velocities(U, grid,
                                       _ns_proxy(cfg), dt, t)
    Ustar = nsm.velocity_advection_diffusion(
        U, uf, [jnp.zeros_like(g) for g in g_cell], None, grid,
        _ns_proxy(cfg), dt, t)
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
    divs = th * _div_Hu(Ustar, cfg, t) + (1.0 - th) * _div_Hu(U, cfg, t)
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

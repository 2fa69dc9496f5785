"""Skew-symmetric (energy-conserving) face-based NS solver.

TPU-native rebuild of the reference skew-symmetric module
(reference: modules/skewsymmetric.c:82-1094, GfsSkewSymmetric).  The
scheme is Verstappen-style symmetry-preserving finite differences on the
MAC staggering with a one-leg "beta" time integration:

* state is the face-normal velocity field ``uf`` plus its previous value
  ``uf_old`` (reference: velfaces/velold, skewsymmetric.c:97-106);
* each step advances the face values to the intermediate time
  ``u* = (1+beta) uf - beta uf_old`` (advance_face_values,
  skewsymmetric.c:231-239), evaluates the skew-symmetric advective flux
  and the explicit viscous flux from ``u*`` (advection_term:407-455,
  diffusion_term:488-544), and applies the one-leg update
  ``(0.5+beta) u^{n+1} = 2 beta u^n + (0.5-beta) u^{n-1} - dt/h F``
  (update_vel:546-562);
* the updated faces are MAC-projected with ``dt/2``
  (gfs_skew_symmetric_run:880-887) and tracers are advected with the
  time-centred face velocity ``(0.5+beta) u^{n+1} + (0.5-beta) u^n``
  (get_velfaces:213-221, advance_tracers_skew:768-795).

On the uniform grid the per-cell/per-direction duplicate face storage of
the reference collapses to one face array per component (the reference
keeps duplicates consistent with correct_face_velocity:581-600 and
discards the odd-direction fluxes in obtain_face_fluxes:602-626; both
are identities here).  Everything is dense jnp — the fluxes are pure
shifts+multiplies that XLA fuses into a handful of HBM passes.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

from ..core.grid import Grid
from ..core import bc as bcs
from ..solvers import poisson
from ..solvers import projection as proj
from .simulation import Simulation


@dataclasses.dataclass(frozen=True)
class SkewConfig:
    grid: Grid
    u_bcs: tuple                      # FieldBC per component
    p_bc: bcs.FieldBC = None
    beta: float = 0.05                # reference default, skewsymmetric.c:142
    nu: float = 0.0                   # constant kinematic viscosity
    projection: poisson.MultilevelParams = None

    def __post_init__(self):
        if self.p_bc is None:
            object.__setattr__(self, "p_bc", _pressure_bc(self.u_bcs, self.grid.dim))
        if self.projection is None:
            object.__setattr__(self, "projection",
                               poisson.MultilevelParams(tolerance=1e-6))


def _pressure_bc(u_bcs, dim):
    sides = []
    for ax in range(dim):
        per = u_bcs[ax].is_periodic(ax)
        b = bcs.Periodic() if per else bcs.Neumann()
        sides.append((b, b))
    return bcs.FieldBC(tuple(sides))


# ---------------------------------------------------------------------------
# ghost padding of face arrays


def _take(a, axis, sl):
    idx = [slice(None)] * a.ndim
    idx[axis] = sl
    return a[tuple(idx)]


def _pad1(f: jnp.ndarray, axis: int, lo: bcs.BC, hi: bcs.BC,
          homogeneous: bool = False) -> jnp.ndarray:
    """One ghost layer on both sides of ``axis`` (cell-type formulas:
    Dirichlet ghost = 2b - interior, Neumann mirror, periodic wrap —
    matching core/bc.py for constant BC values)."""
    if lo.kind == bcs.PERIODIC or hi.kind == bcs.PERIODIC:
        n = f.shape[axis]
        return jnp.concatenate([_take(f, axis, slice(n - 1, n)), f,
                                _take(f, axis, slice(0, 1))], axis=axis)
    first = _take(f, axis, slice(0, 1))
    last = _take(f, axis, slice(f.shape[axis] - 1, f.shape[axis]))
    def ghost(bc, interior_slab):
        if bc.kind == bcs.DIRICHLET:
            b = 0.0 if (homogeneous or callable(bc.value)) else bc.value
            return 2.0 * b - interior_slab
        return interior_slab            # Neumann(0) mirror
    return jnp.concatenate([ghost(lo, first), f, ghost(hi, last)], axis=axis)


def _pad_face_periodic_wrap(f: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Pad a face array along its own axis for a periodic direction.

    Faces 0 and n are the same physical face (f[0] == f[n]); the ghost
    faces are f[-1] == f[n-1] and f[n+1] == f[1]."""
    n = f.shape[axis]
    return jnp.concatenate([_take(f, axis, slice(n - 2, n - 1)), f,
                            _take(f, axis, slice(1, 2))], axis=axis)


def _pad_face_normal(f: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC,
                     axis: int) -> jnp.ndarray:
    """Pad a face array along its own (normal) axis.  Non-periodic
    boundary faces are never updated (they are reset by apply_face_bc),
    so an edge copy is sufficient there."""
    if fbc.is_periodic(axis):
        return _pad_face_periodic_wrap(f, axis)
    first = _take(f, axis, slice(0, 1))
    last = _take(f, axis, slice(f.shape[axis] - 1, f.shape[axis]))
    return jnp.concatenate([first, f, last], axis=axis)


# ---------------------------------------------------------------------------
# fluxes


def advective_fluxes(uf: list, grid: Grid, u_bcs) -> list:
    """Skew-symmetric advective flux per face (reference:
    advection_term skewsymmetric.c:407-455 + transverse_advection:354-406,
    even-direction branch; full face fractions)."""
    dim = grid.dim
    F = []
    for c in range(dim):
        u = uf[c]
        un = _pad_face_normal(u, grid, u_bcs[c], c)
        u_ip = _take(un, c, slice(2, None))
        u_im = _take(un, c, slice(0, un.shape[c] - 2))
        adv = ((u + u_ip) * u_ip - (u + u_im) * u_im) * 0.25
        for a in range(dim):
            if a == c:
                continue
            v = uf[a]
            # v summed over the two cells sharing each c-face
            vpad = _pad1(v, c, *u_bcs[a].sides[c])
            S = (_take(vpad, c, slice(0, vpad.shape[c] - 1))
                 + _take(vpad, c, slice(1, None)))
            # u at the two transverse neighbours (distance 2h)
            ut = _pad1(u, a, *u_bcs[c].sides[a])
            up2 = _take(ut, a, slice(2, None))
            um2 = _take(ut, a, slice(0, ut.shape[a] - 2))
            Sp = _take(S, a, slice(1, None))
            Sm = _take(S, a, slice(0, S.shape[a] - 1))
            adv = adv + (up2 * Sp - um2 * Sm) * 0.25
        F.append(adv)
    return F


def diffusive_fluxes(uf: list, grid: Grid, u_bcs, nu, alpha_face=None) -> list:
    """Explicit viscous flux per face: -nu*alpha*(sum of neighbour
    differences)/h (reference: diffusion_term skewsymmetric.c:488-544 +
    transverse_diffusion:469-486)."""
    dim = grid.dim
    out = []
    for c in range(dim):
        u = uf[c]
        lap = jnp.zeros_like(u)
        for a in range(dim):
            if a == c:
                up = _pad_face_normal(u, grid, u_bcs[c], a)
            else:
                up = _pad1(u, a, *u_bcs[c].sides[a])
            lap = lap + (_take(up, a, slice(2, None))
                         + _take(up, a, slice(0, up.shape[a] - 2)) - 2.0 * u)
        inv = 1.0 if alpha_face is None else alpha_face[c]
        out.append(-nu * inv * lap / grid.h)
    return out


# ---------------------------------------------------------------------------
# step


def cell_velocities(uf: list, grid: Grid) -> list:
    """Cell-centred velocity = mean of the cell's two c-faces
    (reference: get_cell_values skewsymmetric.c:223-229)."""
    out = []
    for c in range(grid.dim):
        f = uf[c]
        out.append(0.5 * (_take(f, c, slice(0, f.shape[c] - 1))
                          + _take(f, c, slice(1, None))))
    return out


def init_faces(u_cell: list, p, grid: Grid, cfg: SkewConfig, dt, t=0.0,
               alpha_face=None):
    """Initial face field: interpolate cell velocities to faces and
    MAC-project with dt/2 (reference: gfs_skew_symmetric_run i==0 branch,
    skewsymmetric.c:843-871)."""
    uf = proj.face_interpolated_velocity(u_cell, grid, cfg.u_bcs, t=t)
    uf, p, _, stats = proj.mac_projection(uf, p, grid, cfg.p_bc, 0.5 * dt,
                                          cfg.projection, alpha=alpha_face,
                                          t=t)
    return {"uf": tuple(uf), "uf_old": tuple(uf), "P": p}


def skew_step(state: dict, dt, t, cfg: SkewConfig, alpha_face=None,
              face_sources=None):
    """One skew-symmetric step.  Returns (state', advection face field).

    ``alpha_face``: optional per-face 1/rho arrays (variable density);
    ``face_sources``: optional per-face accelerations added before the
    projection (gfs_velocity_face_sources, skewsymmetric.c:671).
    Reference driver: gfs_skew_symmetric_run skewsymmetric.c:873-899 +
    gfs_skew_symmetric_momentum:627-678.
    """
    grid, beta = cfg.grid, cfg.beta
    uf = list(state["uf"])
    uf_old = list(state["uf_old"])
    # intermediate-time face values (advance_face_values)
    ustar = [(1.0 + beta) * uf[c] - beta * uf_old[c] for c in range(grid.dim)]
    ustar = [bcs.apply_face_bc(ustar[c], grid, cfg.u_bcs[c], c, t=t)
             for c in range(grid.dim)]
    F = advective_fluxes(ustar, grid, cfg.u_bcs)
    if cfg.nu != 0.0:
        Fd = diffusive_fluxes(ustar, grid, cfg.u_bcs, cfg.nu, alpha_face)
        F = [F[c] + Fd[c] for c in range(grid.dim)]
    # one-leg update (update_vel)
    un = [(2.0 * beta * uf[c] + (0.5 - beta) * uf_old[c]
           - F[c] * dt / grid.h) / (0.5 + beta)
          for c in range(grid.dim)]
    un = [bcs.apply_face_bc(un[c], grid, cfg.u_bcs[c], c, t=t)
          for c in range(grid.dim)]
    un, p, _, stats = proj.mac_projection(
        un, state["P"], grid, cfg.p_bc, 0.5 * dt, cfg.projection,
        alpha=alpha_face, face_sources=face_sources, t=t)
    # time-centred advection velocity for tracers (get_velfaces)
    uadv = [(0.5 + beta) * un[c] + (0.5 - beta) * uf[c]
            for c in range(grid.dim)]
    new_state = dict(state)
    new_state["uf"] = tuple(un)
    new_state["uf_old"] = tuple(uf)
    new_state["P"] = p
    return new_state, uadv, stats


class SkewSimulation(Simulation):
    """GfsSkewSymmetric: the Simulation driver (events, timestep snapping,
    outputs) with the skew-symmetric face stepper swapped in for the
    Godunov/BCG step.  State carries the face fields (``_uf``/``_uf_old``)
    alongside the cell velocities the Output machinery reads.

    Reference: gfs_skew_symmetric_run modules/skewsymmetric.c:797-930."""

    def __init__(self, cfg, beta: float = 0.05, time=None, events=None):
        super().__init__(cfg, time=time, events=events)
        self.skew = SkewConfig(
            grid=cfg.grid, u_bcs=cfg.u_bcs,
            p_bc=_pressure_bc(cfg.u_bcs, cfg.grid.dim),
            beta=beta, nu=cfg.nu, projection=cfg.projection)

    def _initial_projection(self):
        if "_uf" in self.state:
            # faces already initialised (cell->face interpolation is lossy,
            # so re-running it would smooth the field)
            return
        from . import ns as _ns
        grid = self.cfg.grid
        u_cell = [self.state[n] for n in _ns.velocity_names(grid.dim)]
        fs = init_faces(u_cell, self.state["P"], grid, self.skew, self.dt,
                        t=self.time.t)
        self.state["_uf"] = fs["uf"]
        self.state["_uf_old"] = fs["uf_old"]
        self.state["P"] = fs["P"]
        self._write_cells()

    def _write_cells(self):
        from . import ns as _ns
        u = cell_velocities(self.state["_uf"], self.cfg.grid)
        for c, n in enumerate(_ns.velocity_names(self.cfg.grid.dim)):
            self.state[n] = u[c]

    def _advance(self):
        from . import ns as _ns
        from ..physics import vof as vofm
        from ..solvers import advection as adv
        grid = self.cfg.grid
        fstate = {"uf": self.state["_uf"], "uf_old": self.state["_uf_old"],
                  "P": self.state["P"]}
        fstate, uadv, stats = skew_step(fstate, self.dt, self.time.t,
                                        self.skew)
        self.state["_uf"] = fstate["uf"]
        self.state["_uf_old"] = fstate["uf_old"]
        self.state["P"] = fstate["P"]
        self.diagnostics["projection"] = stats
        for name, fbc in self.cfg.vof_tracers:
            self.state[name] = vofm.advect(
                self.state[name], uadv, grid, fbc, self.dt,
                cstart=self.time.i % grid.dim)
        for tr in self.cfg.tracers:
            name, fbc = tr[0], tr[1]
            T = self.state[name]
            uc_pad = adv.mac_cell_mean(uadv, grid)
            par = adv.AdvectionParams(gradient="van_leer")
            fv = adv.advected_face_values(T, grid, fbc, self.dt, par, uc_pad)
            vf = [adv.upwind_face_value(fv[a][0], fv[a][1], uadv[a], a)
                  for a in range(grid.dim)]
            self.state[name] = T + adv.flux_divergence(vf, uadv, grid,
                                                       self.dt)
        self._write_cells()

    def kinetic_energy(self):
        """Sum over cells of |u|^2 * h^dim (OutputScalarSum Velocity2)."""
        u = cell_velocities(self.state["_uf"], self.cfg.grid)
        h = self.cfg.grid.h ** self.cfg.grid.dim
        return float(sum(jnp.sum(c * c) for c in u) * h)

    def face_kinetic_energy(self):
        """Sum over unique faces of u_f^2 * h^dim — the discrete invariant
        of the skew-symmetric flux form (each periodic face counted once)."""
        grid = self.cfg.grid
        h = grid.h ** grid.dim
        tot = 0.0
        for c in range(grid.dim):
            f = self.state["_uf"][c]
            tot += jnp.sum(_take(f, c, slice(0, f.shape[c] - 1)) ** 2)
        return float(tot * h)

"""Additional simulation classes: GfsPoisson and GfsAdvection.

TPU-native rebuild of the reference's simulation subclasses
(reference: src/simulation.c — GfsPoisson poisson_run:2213-2310 with the
compatibility correction correct_div:2156-2186; GfsAdvection
advection_run:2061-2121 which skips the projections and advects tracers
with the prescribed velocity field).
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

from ..core.grid import Grid
from ..core import bc as bcs
from ..solvers import poisson
from ..physics import solid as solidm


class PoissonSimulation:
    """GfsPoisson: solve div(alpha grad P) = Div once (or iend times).

    ``solid_phi``: optional fluid level set (fluid = {phi > 0}) for
    embedded boundaries (test/circle).
    """

    def __init__(self, grid: Grid, p_bc: bcs.FieldBC = None,
                 params: poisson.MultilevelParams = None,
                 solid_phi=None, surface_bc=None):
        self.grid = grid
        self.p_bc = p_bc or bcs.default_scalar_bc(grid.dim)
        self.params = params or poisson.MultilevelParams()
        self.solid_phi = solid_phi
        # ("dirichlet"|"neumann", value fn) on the embedded surface
        # (SurfaceBc P ..., src/boundary.c surface_bc_read)
        self.surface_bc = surface_bc
        self.state = {}
        self.stats = None

    def init(self, Div):
        if callable(Div):
            Div = Div(*self.grid.centers)
        self.state["Div"] = jnp.asarray(Div) + jnp.zeros(self.grid.shape)
        self.state["P"] = jnp.zeros(self.grid.shape)
        return self

    def run(self):
        """Reference: poisson_run src/simulation.c:2213-2310."""
        grid = self.grid
        rhs = self.state["Div"]
        dirichlet = any(b.kind == bcs.DIRICHLET
                        for ax in self.p_bc.sides for b in ax)
        if self.solid_phi is not None:
            if self.surface_bc is not None and \
                    self.surface_bc[0] == "dirichlet":
                u, stats, a, s = solidm.poisson_dirichlet_solve(
                    rhs, grid, self.solid_phi, self.surface_bc[1],
                    self.p_bc, self.params, u0=self.state["P"])
            else:
                u, stats, a, s = solidm.poisson_solid_solve(
                    rhs, grid, self.solid_phi, self.p_bc, self.params,
                    u0=self.state["P"])
            self.state["P"] = u
            self.state["A"] = a
            self.stats = stats
        else:
            if not dirichlet:
                rhs = rhs - jnp.mean(rhs)   # compatibility (correct_div)
            u, stats = poisson.solve(self.state["P"], rhs, grid, self.p_bc,
                                     self.params)
            self.state["P"] = u
            self.stats = stats
        return self


class AdvectionSimulation:
    """GfsAdvection: tracer advection with a prescribed velocity field,
    no pressure projection (reference: src/simulation.c:2061-2121).

    ``u_face``: MAC velocity list, or a callable ``t -> list`` (the
    VariableStreamFunction seam: a time-dependent stream function
    re-evaluated each step, src/variable.c GfsVariableStreamFunction).
    ``gradients``: per-tracer slope limiter overriding the van-Leer
    default (VariableTracer { gradient = ... })."""

    def __init__(self, grid: Grid, u_face, tracers, cfl: float = 0.5,
                 gradients=None, time=None, breaks=()):
        self.grid = grid
        self.u_face = u_face          # prescribed MAC velocities
        self.tracers = tracers        # (name, FieldBC, is_vof) triples
        self.cfl = cfl
        self.gradients = dict(gradients or {})
        self.time = time
        # times where the prescribed velocity is discontinuous (the
        # stream function's { step = ... } schedule): a step must land
        # exactly there, else e.g. shear.gfs's t=2.5 flow reversal is
        # integrated with the wrong sign for half a step
        self.breaks = sorted(breaks)
        self.state = {}
        self.t = 0.0
        self.i = 0

    def init(self, **fields):
        for name, fbc, is_vof in self.tracers:
            v = fields.get(name, 0.0)
            if callable(v):
                v = v(*self.grid.centers)
            self.state[name] = jnp.asarray(v) + jnp.zeros(self.grid.shape)
        return self

    def _faces(self, t):
        return self.u_face(t) if callable(self.u_face) else self.u_face

    def run(self, t_end: float = None):
        if t_end is None:
            t_end = self.time.end
        for b in self.breaks:
            if self.t < b < t_end:
                self._run_segment(b)
        return self._run_segment(t_end)

    def _run_segment(self, t_end: float):
        from ..physics import vof as vofm
        from ..solvers import advection as adv

        grid = self.grid
        uf = self._faces(self.t)
        umax = max(float(jnp.max(jnp.abs(u))) for u in uf)
        cfl = self.cfl
        if any(is_vof for _, _, is_vof in self.tracers):
            # the geometric VOF sweeps are stable to CFL 0.5; stay at
            # 0.45 like the NS driver (gfs_vof_advect, src/vof.c)
            cfl = min(cfl, 0.45)
        dt = cfl * grid.h / max(umax, 1e-300)
        nsteps = max(1, int(math.ceil((t_end - self.t) / dt)))
        dt = (t_end - self.t) / nsteps
        def advance(uf, dt):
            for name, fbc, is_vof in self.tracers:
                T = self.state[name]
                if is_vof:
                    T = vofm.advect(T, uf, grid, fbc, dt,
                                    cstart=self.i % grid.dim)
                else:
                    uc_pad = adv.mac_cell_mean(uf, grid)
                    par = adv.AdvectionParams(
                        gradient=self.gradients.get(name, "van_leer"))
                    fvals = adv.advected_face_values(T, grid, fbc, dt, par,
                                                     uc_pad)
                    vf = [adv.upwind_face_value(fvals[a][0], fvals[a][1],
                                                uf[a], a)
                          for a in range(grid.dim)]
                    T = T + adv.flux_divergence(vf, uf, grid, dt)
                self.state[name] = T
            self.t += dt
            self.i += 1

        for k in range(nsteps):
            uf = self._faces(self.t)
            # a time-dependent velocity can grow within the segment past
            # the start-of-segment CFL sizing: re-check per step and
            # subdivide (keeps the 0.45 VOF bound honest)
            nsub = 1
            if callable(self.u_face):
                umax_k = max(float(jnp.max(jnp.abs(u))) for u in uf)
                bound = cfl * grid.h / max(umax_k, 1e-300)
                if dt > bound:
                    nsub = int(math.ceil(dt / bound))
            if nsub == 1:
                advance(uf, dt)
            else:
                t_sub_end = self.t + dt
                for j in range(nsub):
                    advance(self._faces(self.t), dt / nsub)
                self.t = t_sub_end
        # pin the segment endpoint: accumulated dt sums land a few ulp
        # short, and a break time (velocity discontinuity) reached a few
        # ulp short would integrate the wrong branch for one full step
        self.t = t_end
        return self

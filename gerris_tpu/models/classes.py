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
                 solid_phi=None):
        self.grid = grid
        self.p_bc = p_bc or bcs.default_scalar_bc(grid.dim)
        self.params = params or poisson.MultilevelParams()
        self.solid_phi = solid_phi
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
    no pressure projection (reference: src/simulation.c:2061-2121)."""

    def __init__(self, grid: Grid, u_face: list, tracers, cfl: float = 0.5):
        self.grid = grid
        self.u_face = u_face          # prescribed MAC velocities
        self.tracers = tracers        # (name, FieldBC, is_vof) triples
        self.cfl = cfl
        self.state = {}
        self.t = 0.0
        self.i = 0

    def init(self, **fields):
        for name, fbc, is_vof in self.tracers:
            v = fields[name]
            if callable(v):
                v = v(*self.grid.centers)
            self.state[name] = jnp.asarray(v)
        return self

    def run(self, t_end: float):
        from ..physics import vof as vofm
        from ..solvers import advection as adv

        grid = self.grid
        umax = max(float(jnp.max(jnp.abs(u))) for u in self.u_face)
        dt = self.cfl * grid.h / max(umax, 1e-300)
        nsteps = max(1, int(math.ceil((t_end - self.t) / dt)))
        dt = (t_end - self.t) / nsteps
        for k in range(nsteps):
            for name, fbc, is_vof in self.tracers:
                T = self.state[name]
                if is_vof:
                    T = vofm.advect(T, self.u_face, grid, fbc, dt,
                                    cstart=self.i % grid.dim)
                else:
                    uc_pad = adv.mac_cell_mean(self.u_face, grid)
                    par = adv.AdvectionParams(gradient="van_leer")
                    fvals = adv.advected_face_values(T, grid, fbc, dt, par,
                                                     uc_pad)
                    vf = [adv.upwind_face_value(fvals[a][0], fvals[a][1],
                                                self.u_face[a], a)
                          for a in range(grid.dim)]
                    T = T + adv.flux_divergence(vf, self.u_face, grid, dt)
                self.state[name] = T
            self.t += dt
            self.i += 1
        return self

"""Derived variables.

TPU-native rebuild of the reference's derived GfsVariable classes
(reference: src/variable.c / init.c:166-189 — Vorticity (gfs_vorticity
src/fluid.c), Velocity norm, GfsVariableStreamFunction (2D stream function
via a Poisson solve), GfsVariableLaplacian).  These are plain functions of
the state (the reference recomputes them as variable events).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.grid import Grid
from ..core import bc as bcs
from .stencils import center_gradient, laplacian


def vorticity(U: list, grid: Grid, u_bcs: list, t=0.0):
    """2D scalar vorticity / 3D vector (GfsVariableVorticity)."""
    from ..physics.particles import vorticity_field

    return vorticity_field(U, grid, u_bcs, t)


def velocity_norm(U: list) -> jnp.ndarray:
    """|u| (the 'Velocity' derived variable, src/simulation.c)."""
    return jnp.sqrt(sum(u * u for u in U))


def velocity2(U: list) -> jnp.ndarray:
    """|u|^2 ('Velocity2', used by test/oscillation's energy output)."""
    return sum(u * u for u in U)


def laplacian_of(f: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC, t=0.0):
    """GfsVariableLaplacian."""
    return laplacian(bcs.apply_bc(f, grid, fbc, 1, t=t), grid)


def stream_function(U: list, grid: Grid, u_bcs: list,
                    tol: float = 1e-8, t=0.0) -> jnp.ndarray:
    """2D stream function psi in the convention u = -dpsi/dy, v = +dpsi/dx,
    so lap(psi) = vorticity; psi = 0 on solid walls
    (GfsVariableStreamFunction, src/variable.c; 2D only)."""
    from ..solvers import poisson

    assert grid.dim == 2
    w = vorticity(U, grid, u_bcs, t)
    periodic = all(b.kind == bcs.PERIODIC
                   for ax in u_bcs[0].sides for b in ax)
    if periodic:
        fbc = bcs.periodic_bc(2)
        w = w - jnp.mean(w)
    else:
        fbc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    psi, _ = poisson.solve(jnp.zeros(grid.shape, w.dtype), w, grid, fbc,
                           poisson.MultilevelParams(tolerance=tol,
                                                    nitermax=60))
    return psi
